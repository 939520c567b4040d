"""Does mode='promise_in_bounds' help the plane scatter/gather? Indices
are pre-clipped so OOB handling is dead weight. Direct protocol."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np

K = 40
HW, R, C4 = 160801, 92364, 128
key = jax.random.PRNGKey(0)
base = jax.random.randint(key, (2148,), 0, HW - 64)
idx = (base[:, None] + jnp.arange(43)[None, :] % 64).reshape(-1)
vals = jax.random.normal(jax.random.fold_in(key, 1), (R, C4))
tbl = jax.random.normal(jax.random.fold_in(key, 2), (HW, C4))

def direct(name, fn):
    @jax.jit
    def f(idx, vals, tbl):
        def body(i, acc):
            out = fn(idx, vals + (1e-12 * i), tbl)
            return acc + out[0, 0] + out[HW // 2 % out.shape[0], 5]
        return jax.lax.fori_loop(0, K, body, 0.0)
    float(np.asarray(f(idx, vals, tbl)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(np.asarray(f(idx, vals, tbl))); ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {np.median(ts)/K*1e3:7.3f} ms/iter", flush=True)

print(f"device={jax.devices()[0]}", flush=True)
direct("scatter-add default (clip)",
       lambda i, v, t: jnp.zeros((HW, C4)).at[i].add(v))
direct("scatter-add promise_in_bounds",
       lambda i, v, t: jnp.zeros((HW, C4)).at[i].add(v, mode="promise_in_bounds"))
direct("scatter-add drop",
       lambda i, v, t: jnp.zeros((HW, C4)).at[i].add(v, mode="drop"))
direct("gather default (clip)",
       lambda i, v, t: (t + 1e-12 * v[0, 0])[i])
direct("gather promise_in_bounds",
       lambda i, v, t: (t + 1e-12 * v[0, 0]).at[i].get(mode="promise_in_bounds"))
