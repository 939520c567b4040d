"""Frontend-update component profile at the bench shapes.

Times the pieces of one `graph.update` call (corr lookup, GRU update op,
damping agg, reprojection, the windowed dense BA, and its internals) to
locate the remaining milliseconds of the ~200 ms frontend update.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(name, f, args_list, sub=0.0):
    out = f(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list:
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / len(args_list) * 1e3
    print(f"{name:52s} {ms:8.2f} ms" + (f"  (-disp {ms - sub:.2f})" if sub else ""))
    return ms


def main():
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.ops import ba, correlation, projective
    from mneslam_tpu.tracking import video as video_lib
    from mneslam_tpu.tracking.graph import FactorGraph

    H, W, buffer, window, factors = 320, 640, 64, 32, 75
    ht, wd = H // 8, W // 8
    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    if jax.default_backend() != "cpu":
        params = droid_net.cast_params(params, jnp.bfloat16)

    state = video_lib.init_video(buffer, ht, wd)
    rng = np.random.default_rng(1)
    state = state._replace(
        fmaps=jnp.asarray(rng.standard_normal((buffer, 128, ht, wd), np.float32)) * 0.1,
        inps=jnp.asarray(rng.standard_normal((buffer, 128, ht, wd), np.float32)) * 0.1,
        disps=jnp.ones((buffer, ht, wd)) * 0.5,
    )
    intr8 = jnp.asarray([W / 16, W / 16, W / 16 - 0.5, H / 16 - 0.5])
    graph = FactorGraph(buffer, ht, wd, capacity=factors + 16, params=params,
                        intrinsics=intr8, window=window, max_factors=factors)
    n_kf = min(window - 2, 20)
    ii = np.concatenate([np.arange(0, n_kf - 1), np.arange(1, n_kf)])[:factors]
    jj = np.concatenate([np.arange(1, n_kf), np.arange(0, n_kf - 1)])[:factors]
    graph.add_factors(state, ii, jj)
    print(f"device={jax.devices()[0]}  edges={len(ii)} cap={graph.capacity} "
          f"window={window} buffer={buffer} hw={ht}x{wd}")

    R = 8
    keys = [jax.random.PRNGKey(i) for i in range(R)]

    # 1) full update (the bench's frontend_update_ms)
    def full(st):
        st2 = graph.update(st, t0=1, t1=n_kf, iters=2)
        return st2.poses

    t_full = timeit("graph.update (2 GN iters)", full, [(state,)] * R)

    iiT, jjT, maskT = (jnp.asarray(x) for x in graph._padded_indices())

    # 2) reproject
    @jax.jit
    def repro(st):
        c, _ = video_lib.reproject(st, intr8, iiT, jjT)
        return c

    coords1 = repro(state)
    timeit("reproject", repro, [(state,)] * R)

    # 3) corr lookup
    @jax.jit
    def corr_fn(st, c):
        return correlation.alt_corr(st.fmaps, iiT, jjT, c)

    corr = corr_fn(state, coords1)
    timeit("alt_corr (Pallas 4-level)", corr_fn, [(state, coords1)] * R)

    # 4) GRU update op
    netT = jnp.asarray(graph.net)
    coords0 = projective.coords_grid(ht, wd)
    motion = jnp.concatenate([coords1 - coords0, coords1 * 0], axis=-1)
    motion = jnp.clip(motion, -64.0, 64.0).transpose(0, 3, 1, 2)

    @jax.jit
    def gru(net, corr, motion, st):
        return droid_net.update_apply(params["update"], net, st.inps[iiT],
                                      corr, motion)

    out = gru(netT, corr, motion, state)
    timeit("update_apply (corr/flow enc + ConvGRU + heads)", gru,
           [(netT, corr, motion, state)] * R)
    _, delta, weight = out

    # 5) agg
    @jax.jit
    def agg(net):
        return droid_net.agg_apply(params["update"]["agg"], net, iiT, maskT,
                                   buffer)

    timeit("agg_apply (damping + upmask)", agg, [(out[0],)] * R)

    # 6) windowed BA alone, 2 iters
    target = coords1 + delta.astype(jnp.float32)
    weightf = weight.astype(jnp.float32)

    @jax.jit
    def wba(st):
        return video_lib.windowed_ba(
            st, intr8, target, weightf, iiT, jjT, maskT,
            t0=jnp.asarray(1), t1=jnp.asarray(n_kf), window=window,
            iters=2).poses

    timeit("windowed_ba (2 iters)", wba, [(state,)] * R)

    # 7) BA internals: projective_transform with jacobians (1x)
    sl_poses = state.poses[:window]
    sl_disps = state.disps[:window]

    @jax.jit
    def pt(p, d):
        c, v, (Ji, Jj, Jz) = projective.projective_transform(
            p, d, intr8, jnp.clip(iiT, 0, window - 1),
            jnp.clip(jjT, 0, window - 1), jacobian=True)
        return Ji.sum() + Jj.sum() + Jz.sum() + c.sum()

    timeit("projective_transform + jacobians (1x)", pt,
           [(sl_poses, sl_disps)] * R)

    # 8) cholesky solve alone at window size
    S = jnp.eye(window * 6) * 2.0 + 0.01 * jax.random.normal(
        keys[0], (window * 6, window * 6))
    S = S @ S.T
    rhs = jax.random.normal(keys[1], (window * 6,))

    @jax.jit
    def solve(S, rhs):
        return ba._solve_psd(S, rhs)

    timeit("cholesky solve [192,192] (1x)", solve, [(S, rhs)] * R)


if __name__ == "__main__":
    main()
