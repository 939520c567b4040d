"""In-context decomposition of the tracker update megastep.

graph.update was ~176 ms while separately-timed corr (64) + GRU (21) +
windowed BA (23) leave ~70 ms unexplained. Probes here subtract variants
of the SAME compiled update_step (chained, scalar-fetched):

  A  full update (iters=2)
  B  full update, BA iters=0            -> BA-in-context = A - B
  C  oracle update_fn (ignores corr/net), iters=2
                                        -> corr+GRU-in-context = A - C
  D  oracle update_fn + iters=0         -> residue: reproject, motion,
                                           damping scatter, edge concats,
                                           state plumbing
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
    print(f"{name:56s} {per:8.2f} ms", flush=True)
    return per


def main():
    from mneslam_tpu.models import droid_net
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

    def oracle_update(params, state, ii, jj, net, corr, motion, coords1):
        delta = jnp.zeros(coords1.shape, jnp.float32)
        weight = jnp.full(coords1.shape, 0.5, jnp.float32)
        return net, delta, weight

    def make_graph(update_fn=None):
        g = FactorGraph(buffer, ht, wd, capacity=factors + 16, params=params,
                        intrinsics=intr8, window=window, max_factors=factors,
                        update_fn=update_fn)
        n_kf = 26
        ii = np.concatenate([np.arange(0, n_kf - 1), np.arange(1, n_kf),
                             np.arange(0, n_kf - 2), np.arange(2, n_kf)])[:factors]
        jj = np.concatenate([np.arange(1, n_kf), np.arange(0, n_kf - 1),
                             np.arange(2, n_kf), np.arange(0, n_kf - 2)])[:factors]
        g.add_factors(state, ii, jj)
        return g, n_kf

    print(f"device={jax.devices()[0]}  edges=75 cap=91", flush=True)

    graph, n_kf = make_graph()
    a = chain_time("A full update (iters=2)",
                   lambda st: graph.update(st, t0=1, t1=n_kf, iters=2,
                                           use_inactive=True),
                   state, lambda st: np.asarray(st.poses[1]))
    b = chain_time("B full update (BA iters=0)",
                   lambda st: graph.update(st, t0=1, t1=n_kf, iters=0,
                                           use_inactive=True),
                   state, lambda st: np.asarray(st.poses[1]))

    graph_o, _ = make_graph(update_fn=oracle_update)
    c = chain_time("C oracle net (iters=2)",
                   lambda st: graph_o.update(st, t0=1, t1=n_kf, iters=2,
                                             use_inactive=True),
                   state, lambda st: np.asarray(st.poses[1]))
    d = chain_time("D oracle net (BA iters=0)",
                   lambda st: graph_o.update(st, t0=1, t1=n_kf, iters=0,
                                             use_inactive=True),
                   state, lambda st: np.asarray(st.poses[1]))

    print(f"\nBA in context      (A-B): {a - b:7.2f} ms")
    print(f"corr+GRU in context (A-C): {a - c:7.2f} ms")
    print(f"residue                (D): {d:7.2f} ms")


if __name__ == "__main__":
    main()
