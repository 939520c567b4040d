"""Fetch-synced frontend-update breakdown (reliable protocol — see
prof_mapping7): chained repetitions, one host fetch at the end.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def chain_time(name, step, state0, fetch, n=8):
    state = step(state0)       # warm
    fetch(state)
    state = state0
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state)
    fetch(state)
    per = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:56s} {per:8.2f} ms (incl ~{30 // n} ms RTT share)", flush=True)
    return per


def main():
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.ops import correlation, projective
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
    print(f"device={jax.devices()[0]}  edges={len(ii)} cap={graph.capacity}",
          flush=True)

    # 1) full graph.update, chained
    chain_time("graph.update (2 GN iters)",
               lambda st: graph.update(st, t0=1, t1=n_kf, iters=2),
               state, lambda st: np.asarray(st.poses[1]))

    iiT, jjT, maskT = (jnp.asarray(x) for x in graph._padded_indices())
    netT = jnp.asarray(graph.net)
    coords0 = projective.coords_grid(ht, wd)

    # 2) reproject + corr, chained through a coords perturbation
    @jax.jit
    def corr_step(st):
        c1, _ = video_lib.reproject(st, intr8, iiT, jjT)
        corr = correlation.alt_corr(st.fmaps, iiT, jjT, c1)
        return st._replace(disps=st.disps + 1e-9 * corr.sum())

    chain_time("reproject + alt_corr", corr_step, state,
               lambda st: np.asarray(st.disps[0, 0, 0]))

    # 3) + GRU update op and agg
    @jax.jit
    def gru_step(st):
        c1, _ = video_lib.reproject(st, intr8, iiT, jjT)
        corr = correlation.alt_corr(st.fmaps, iiT, jjT, c1)
        motion = jnp.concatenate([c1 - coords0, c1 * 0], axis=-1)
        motion = jnp.clip(motion, -64.0, 64.0).transpose(0, 3, 1, 2)
        net, delta, w = droid_net.update_apply(params["update"], netT,
                                               st.inps[iiT], corr, motion)
        eta, upmask = droid_net.agg_apply(params["update"]["agg"], net, iiT,
                                          maskT, buffer)
        bump = (delta.sum() + w.sum() + eta.sum()).astype(st.disps.dtype)
        return st._replace(disps=st.disps + 1e-9 * bump)

    chain_time("reproject + corr + GRU + agg", gru_step, state,
               lambda st: np.asarray(st.disps[0, 0, 0]))

    # 4) windowed BA only (targets fixed), chained through state
    target = jnp.asarray(np.asarray(coords0)[None] +
                         rng.standard_normal((graph.capacity, ht, wd, 2)) * 0.5)
    weight = jnp.ones((graph.capacity, ht, wd, 2)) * 0.5

    @jax.jit
    def ba_step(st):
        return video_lib.windowed_ba(
            st, intr8, target, weight, iiT, jjT, maskT,
            t0=jnp.asarray(1), t1=jnp.asarray(n_kf), window=window, iters=2)

    chain_time("windowed_ba (2 iters)", ba_step, state,
               lambda st: np.asarray(st.poses[1]))


if __name__ == "__main__":
    main()
