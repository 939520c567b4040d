"""Decompose the ScanNet-scale global-BA step (bench `scannet_scale`).

bench r3 measured `dense_ba(steps=1)` at buffer 512 / E=1028 edges /
30x40 at ~912 ms. This tool attributes it: host edge proposal,
`add_factors` (corr-state build), the chunked corr+GRU passes
(corr_chunk=256), and the sparse-Schur `ba_step` (2 GN iters over the
full history).

Protocol: chained dispatches with ONE trailing host fetch (the remote
backend's block_until_ready returns at dispatch; a fetch syncs the whole
queue — CLAUDE.md). Components are timed over R repetitions.

Usage: python tools/prof_globalba.py [buffer] [R]   (default 512 5)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    hts, wds = 30, 40

    from mneslam_tpu.config import make_config
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.tracking import video as video_lib
    from mneslam_tpu.tracking.backend import Backend
    from mneslam_tpu.tracking import graph as graph_lib

    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    if jax.default_backend() != "cpu":
        params = droid_net.cast_params(params, jnp.bfloat16)
    feat_dtype = jax.tree.leaves(params)[0].dtype

    cfg = make_config({"tracking": {"buffer": bs}})
    rng = np.random.default_rng(7)
    st = video_lib.init_video(bs, hts, wds, feat_dtype=feat_dtype)
    trans = np.cumsum(0.03 * rng.standard_normal((bs, 3)).astype(np.float32), axis=0)
    poses7 = np.zeros((bs, 7), np.float32)
    poses7[:, :3] = trans
    poses7[:, 6] = 1.0
    st = st._replace(
        poses=jnp.asarray(poses7),
        fmaps=(jnp.asarray(rng.standard_normal((bs, 128, hts, wds), np.float32)) * 0.1).astype(feat_dtype),
        inps=(jnp.asarray(rng.standard_normal((bs, 128, hts, wds), np.float32)) * 0.1).astype(feat_dtype),
        disps=jnp.ones((bs, hts, wds)) * 0.7,
        disps_sens=jnp.ones((bs, hts, wds)) * 0.7,
        timestamps=jnp.arange(bs, dtype=jnp.float32),
    )
    intr = jnp.asarray([40.0, 40.0, 20.0, 15.0])
    backend = Backend(params, intr, cfg, bs, hts, wds)
    print(f"device={jax.devices()[0]}  buffer={bs}  R={R}", flush=True)
    out = {"buffer": bs}

    # 1. proposal (host + chunked device frame_distance)
    es = backend._propose_edges(st, 0, bs, 0, backend.radius, backend.nms,
                                backend.thresh, max_factors=16 * bs, loop=False)
    t0 = time.perf_counter()
    es = backend._propose_edges(st, 0, bs, 0, backend.radius, backend.nms,
                                backend.thresh, max_factors=16 * bs, loop=False)
    out["proposal_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    out["edges"] = int(len(es))

    # build the graph once (as dense_ba does)
    n = bs
    max_factors = (backend.radius + 2) * 2 * n
    graph = backend._make_graph(max_factors, window=n)

    # scalar fetch helper compiled OUTSIDE every timed region (an eager
    # slice/astype chain would bill its own remote compile into the timing)
    fetch_scalar = jax.jit(lambda x: x.astype(jnp.float32).reshape(-1)[0])

    # 2. add_factors (corr-state build: fmap row gathers + reproject)
    graph.add_factors(st, es[:, 0], es[:, 1], remove=True)  # warm
    float(fetch_scalar(graph.net))  # warm the fetch program too
    graph.clear_edges()
    np.asarray(st.poses[0])
    t0 = time.perf_counter()
    graph.add_factors(st, es[:, 0], es[:, 1], remove=True)
    float(fetch_scalar(graph.net))
    out["add_factors_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    # 3. full update (chunked GRU + sparse BA), R reps chained
    st_w = graph.update(st, t0=1, t1=n, iters=2)  # warm all shapes
    np.asarray(st_w.poses[0])
    t0 = time.perf_counter()
    st_t = st
    for _ in range(R):
        st_t = graph.update(st_t, t0=1, t1=n, iters=2)
    np.asarray(st_t.poses[0])
    out["update_ms"] = round((time.perf_counter() - t0) * 1e3 / R, 1)

    # 4. one gru_chunk_step (chunk = corr_chunk edges), R reps chained
    S = graph.corr_chunk or graph.capacity
    ii, jj, mask = graph._padded_indices()
    args = (ii[:S], jj[:S], mask[:S], graph.net[:S], graph.target[:S])
    st_c, net_c, tgt_c, w_c, up_c = graph_lib.gru_chunk_step(
        st, params, intr, *args)
    float(fetch_scalar(net_c))  # warm (incl. the fetch program)
    t0 = time.perf_counter()
    st_c2 = st
    for _ in range(R):
        st_c2, net_c, tgt_c, w_c, up_c = graph_lib.gru_chunk_step(
            st_c2, params, intr, *args)
    float(fetch_scalar(net_c))
    per_chunk = (time.perf_counter() - t0) * 1e3 / R
    n_chunks = max((graph.n_active + S - 1) // S, 1)
    out["gru_chunk_ms"] = round(per_chunk, 1)
    out["n_chunks"] = n_chunks
    out["gru_total_ms"] = round(per_chunk * n_chunks, 1)

    # 5. ba_step alone (sparse-Schur full-history solve, 2 GN iters)
    from mneslam_tpu.ops import ba_sparse

    ii_i = jnp.zeros(graph.cap_inac, jnp.int32)
    jj_i = jnp.zeros(graph.cap_inac, jnp.int32)
    m_i = jnp.zeros(graph.cap_inac, jnp.float32)
    comb_ii = np.concatenate([np.asarray(ii), np.asarray(ii_i)])
    comb_jj = np.concatenate([np.asarray(jj), np.asarray(jj_i)])
    comb_m = np.concatenate([np.asarray(mask), np.asarray(m_i)]) > 0
    raw = ba_sparse.build_pairs(comb_ii, comb_jj, comb_m)
    cap = 1 << max(int(np.ceil(np.log2(max(raw.n_pairs, 1)))), 6)
    pairs = ba_sparse.build_pairs(comb_ii, comb_jj, comb_m, capacity=cap)
    out["schur_pairs"] = int(raw.n_pairs)

    ba_args = (jnp.concatenate([ii, ii_i]), jnp.concatenate([jj, jj_i]),
               jnp.concatenate([mask, m_i]),
               jnp.concatenate([graph.target, graph.target_inac]),
               jnp.concatenate([graph.weight, graph.weight_inac]),
               jnp.asarray(1), jnp.asarray(n))
    st_b = graph_lib.ba_step(st, intr, *ba_args, window=graph.window,
                             iters=2, pairs=pairs)
    np.asarray(st_b.poses[0])
    t0 = time.perf_counter()
    st_b2 = st
    for _ in range(R):
        st_b2 = graph_lib.ba_step(st_b2, intr, *ba_args, window=graph.window,
                                  iters=2, pairs=pairs)
    np.asarray(st_b2.poses[0])
    out["ba_step_ms"] = round((time.perf_counter() - t0) * 1e3 / R, 1)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
