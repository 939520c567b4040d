"""windowed_ba exactly as update_step invokes it (traced t0/t1, 64-frame
buffer state, combined active+inactive concat table) — isolates whether
the 43-vs-21 ms in-context BA gap is in windowed_ba itself or in
cross-op scheduling of the update megastep."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.tracking import video as video_lib

K = 8
H, W, buffer, window = 320, 640, 64, 32
ht, wd = H // 8, W // 8
E1 = 91
state = video_lib.init_video(buffer, ht, wd)
state = state._replace(
    poses=state.poses.at[:, 0].set(jnp.arange(buffer) * 0.02),
    disps=jnp.ones((buffer, ht, wd)) * 0.7)
intr8 = jnp.asarray([W / 16, W / 16, W / 16 - 0.5, H / 16 - 0.5])
rng = np.random.default_rng(0)
n_kf = 26
ii_a = jnp.asarray(rng.integers(0, n_kf - 1, E1), jnp.int32)
jj_a = jnp.asarray((np.asarray(ii_a) + 1) % n_kf, jnp.int32)
m_a = jnp.asarray((np.arange(E1) < 75).astype(np.float32))
ii_i = jnp.zeros(E1, jnp.int32); jj_i = jnp.zeros(E1, jnp.int32)
m_i = jnp.zeros(E1, jnp.float32)
tgt_a = jnp.zeros((E1, ht, wd, 2)); w_a = jnp.ones((E1, ht, wd, 2)) * 0.5
tgt_i = jnp.zeros((E1, ht, wd, 2)); w_i = jnp.zeros((E1, ht, wd, 2))

def mk(iters):
    def f(st, bump):
        ba_ii = jnp.concatenate([ii_a, ii_i]); ba_jj = jnp.concatenate([jj_a, jj_i])
        ba_m = jnp.concatenate([m_a, m_i])
        ba_t = jnp.concatenate([tgt_a + bump, tgt_i])
        ba_w = jnp.concatenate([w_a, w_i])
        return video_lib.windowed_ba(st, intr8, ba_t, ba_w, ba_ii, ba_jj, ba_m,
                                     t0=jnp.asarray(1), t1=jnp.asarray(n_kf),
                                     window=window, iters=iters)
    @jax.jit
    def chain(st):
        def body(i, st):
            return f(st, 1e-6 * i)
        return jax.lax.fori_loop(0, K, body, st).poses[1, 0]
    return chain

print(f"device={jax.devices()[0]}", flush=True)
for iters in (0, 2):
    c = mk(iters)
    float(np.asarray(c(state)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(np.asarray(c(state))); ts.append(time.perf_counter() - t0)
    print(f"windowed_ba as-in-update iters={iters}: {np.median(ts)/K*1e3:7.2f} ms", flush=True)
