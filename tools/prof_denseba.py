"""Decompose the bench `global_ba_step_ms` composite (round 5).

bench.py's scannet block times one `backend.dense_ba(steps=1)` call:
edge proposal + graph.add_factors + one chunked update + clear_edges.
prof_globalba.py measured the update half at ~599 ms; the composite
records ~778. This splits the remaining ~180 ms across the eager host
phases so the right one gets optimized.

Protocol note: each phase is wall-timed with a trailing scalar fetch
that depends on that phase's device outputs (the remote backend's
block_until_ready is dispatch-only — CLAUDE.md), so every phase bill
includes one ~30 ms fetch RTT; the `fetch_rtt_ms` row calibrates it.
Phases are averaged over R independent graphs on the same state (the
proposal/edge set is identical across reps; poses are NOT carried so
shapes stay fixed).

Usage: python tools/prof_denseba.py [buffer] [R]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    argv = sys.argv[1:]
    bs = int(argv[0]) if len(argv) > 0 else 512
    R = int(argv[1]) if len(argv) > 1 else 3
    hts, wds = 30, 40

    from mneslam_tpu.config import make_config
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.tracking import video as video_lib
    from mneslam_tpu.tracking.backend import Backend

    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    if jax.default_backend() != "cpu":
        params = droid_net.cast_params(params, jnp.bfloat16)
    feat_dtype = jax.tree.leaves(params)[0].dtype

    rng = np.random.default_rng(7)
    st = video_lib.init_video(bs, hts, wds, feat_dtype=feat_dtype)
    trans = np.cumsum(0.03 * rng.standard_normal((bs, 3)).astype(np.float32),
                      axis=0)
    poses7 = np.zeros((bs, 7), np.float32)
    poses7[:, :3] = trans
    poses7[:, 6] = 1.0
    st = st._replace(
        poses=jnp.asarray(poses7),
        fmaps=(jnp.asarray(rng.standard_normal(
            (bs, 128, hts, wds), np.float32)) * 0.1).astype(feat_dtype),
        inps=(jnp.asarray(rng.standard_normal(
            (bs, 128, hts, wds), np.float32)) * 0.1).astype(feat_dtype),
        disps=jnp.ones((bs, hts, wds)) * 0.7,
        disps_sens=jnp.ones((bs, hts, wds)) * 0.7,
        timestamps=jnp.arange(bs, dtype=jnp.float32),
    )
    intr = jnp.asarray([40.0, 40.0, 20.0, 15.0])
    cfg = make_config({"tracking": {"buffer": bs}})
    backend = Backend(params, intr, cfg, bs, hts, wds)

    fetch_scalar = jax.jit(lambda x: x.astype(jnp.float32).reshape(-1)[0])

    def sync(*arrs):
        for a in arrs:
            float(fetch_scalar(a))

    print(f"device={jax.devices()[0]}  buffer={bs}  R={R}", flush=True)

    # fetch RTT calibration: scalar fetch of an already-materialized array
    sync(st.poses)
    t0 = time.perf_counter()
    for _ in range(10):
        sync(st.poses)
    rtt_ms = (time.perf_counter() - t0) * 1e3 / 10

    # warm everything once end-to-end (compiles + fills the dist cache)
    for _ in range(2):
        backend._propose_edges(st, 0, bs, 0, backend.radius, backend.nms,
                               backend.thresh, max_factors=16 * bs, loop=False)
    st_w, _, _ = backend.dense_ba(st, bs, steps=1)
    sync(st_w.poses)

    out = {"buffer": bs, "R": R, "fetch_rtt_ms": round(rtt_ms, 1)}
    phases = {"propose": [], "add_factors": [], "update": [], "clear": [],
              "total": []}
    n = bs
    max_factors = (backend.radius + 2) * 2 * n
    for _ in range(R):
        t_all = time.perf_counter()

        t0 = time.perf_counter()
        es = backend._propose_edges(st, 0, bs, 0, backend.radius, backend.nms,
                                    backend.thresh, max_factors, loop=False)
        phases["propose"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        graph = backend._make_graph(max_factors, window=n)
        graph.add_factors(st, es[:, 0], es[:, 1], remove=True)
        sync(graph.net, graph.target)
        phases["add_factors"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        st_u = graph.update(st, t0=1, t1=n, iters=2, lm=1e-5, ep=1e-2)
        sync(st_u.poses)
        phases["update"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        graph.clear_edges()
        sync(graph.net)
        phases["clear"].append(time.perf_counter() - t0)

        phases["total"].append(time.perf_counter() - t_all)

    for k, v in phases.items():
        ms = sorted(v)[len(v) // 2] * 1e3
        print(f"{k:12s} {ms:8.1f} ms (median of {R})", flush=True)
        out[k + "_ms"] = round(ms, 1)

    # the bench composite for comparison (single warm+timed pair)
    t0 = time.perf_counter()
    st_t, _, _ = backend.dense_ba(st, bs, steps=1)
    np.asarray(st_t.poses[0])
    out["bench_composite_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    print(f"bench-style composite {out['bench_composite_ms']} ms", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
