"""Sweep `tracking.backend.corr_chunk` at ScanNet scale (round 5).

The global-BA update (reference update_lowmem, factor_graph.py:280-346)
runs the corr+GRU half in chunks of `corr_chunk` edges inside one
compiled megastep (`graph.update_chunked_step`). Round-4/5 shipped 256;
VERDICT r4 next #6 names "larger corr chunks at t=512 (VMEM allows it
at 30x40)" as the remaining lever on the 599 ms update. This sweeps the
chunk size on the real chip and prints ms per `graph.update` call
(2 GN iters, E=1028 edges, buffer 512, 30x40 — the bench
`scannet_scale` shape).

Chunk-size semantics: GraphAgg is chunk-LOCAL by design (both here and
in the reference's lowmem pass), so different chunk sizes give slightly
different damping groupings — equality tests pin each size against the
host-loop structure, not across sizes.

Protocol: chained dispatches, one trailing fetch (CLAUDE.md); R reps.

Usage: python tools/prof_corrchunk.py [buffer] [R] [chunks...]
       (defaults: 512 5 128 256 512 1024)
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
    R = int(argv[1]) if len(argv) > 1 else 5
    chunks = [int(a) for a in argv[2:]] or [128, 256, 512, 1024]
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

    print(f"device={jax.devices()[0]}  buffer={bs}  R={R}", flush=True)
    out = {"buffer": bs, "R": R, "update_ms": {}}

    fetch_scalar = jax.jit(lambda x: x.astype(jnp.float32).reshape(-1)[0])

    for chunk in chunks:
        cfg = make_config({"tracking": {"buffer": bs,
                                        "backend": {"corr_chunk": chunk}}})
        backend = Backend(params, intr, cfg, bs, hts, wds)
        es = backend._propose_edges(st, 0, bs, 0, backend.radius,
                                    backend.nms, backend.thresh,
                                    max_factors=16 * bs, loop=False)
        n = bs
        max_factors = (backend.radius + 2) * 2 * n
        graph = backend._make_graph(max_factors, window=n)
        graph.add_factors(st, es[:, 0], es[:, 1], remove=True)
        n_chunks = (graph.n_active + chunk - 1) // chunk
        try:
            st_w = graph.update(st, t0=1, t1=n, iters=2)  # warm/compile
            float(fetch_scalar(st_w.poses))
            t0 = time.perf_counter()
            st_t = st
            for _ in range(R):
                st_t = graph.update(st_t, t0=1, t1=n, iters=2)
            float(fetch_scalar(st_t.poses))
            ms = (time.perf_counter() - t0) * 1e3 / R
        except Exception as e:  # remote compile OOM/500 at big chunks
            print(f"chunk={chunk:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            out["update_ms"][str(chunk)] = None
            continue
        print(f"chunk={chunk:5d}  edges={graph.n_active}  "
              f"n_chunks={n_chunks}  update {ms:8.1f} ms", flush=True)
        out["update_ms"][str(chunk)] = round(ms, 1)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
