"""Benchmark harness: tracking FPS + mapping rate at Replica shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Baseline (BASELINE.md north star): >30 FPS tracking on TPU v5e. The
benchmark uses the reference's Replica working shapes — tracking at
320x640 (1/8-res 40x80, frontend window 25, 75 factors), mapping with
2048 global + 100 current rays, 43 depth-guided samples, c_dim 32
coarse+fine tri-planes over an 8 m bound — on synthetic data (weights and
datasets are external inputs; shapes, not content, determine throughput).
"""

import argparse
import json
import time

import numpy as np


def _add_tools_path():
    """Make tools/ importable (rowshard_step — the per-device measurement
    builders shared with the prof_* protocol scripts)."""
    import os
    import sys

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    if p not in sys.path:
        sys.path.insert(0, p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (CI)")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mneslam_tpu.config import make_config
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.models.scene_rep import SceneRep
    from mneslam_tpu.tracking import video as video_lib
    from mneslam_tpu.tracking.graph import FactorGraph
    from mneslam_tpu.tracking.motion_filter import (
        encode_and_flow, encode_frame, encode_context, flow_magnitude)

    if args.quick:
        H, W, buffer, window, factors, n_rays, iters = 128, 160, 32, 16, 24, 512, 10
        bound, coarse, fine = 2.2, 0.24, 0.12
    else:
        H, W, buffer, window, factors, n_rays, iters = 320, 640, 64, 32, 75, 2048, 50
        bound, coarse, fine = 4.0, 0.04, 0.02

    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": n_rays, "min_pixels_cur": 100, "iters": iters},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
        "tracking": {"buffer": buffer},
    })

    dev = jax.devices()[0]
    ht8, wd8 = H // 8, W // 8

    # ---- tracking components (bf16 nets, the production default) ----
    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    if jax.default_backend() != "cpu":
        params = droid_net.cast_params(params, jnp.bfloat16)
    img = jnp.asarray(np.random.default_rng(0).random((3, H, W), np.float32))

    fmap = encode_frame(params, img)  # warm
    net, inp = encode_context(params, img)
    _, d = encode_and_flow(params, fmap, net, inp, img)
    d.block_until_ready()

    # median over per-rep timings: the remote-TPU dispatch path has
    # occasional multi-ms tunnel hiccups that a single mean absorbs.
    # Every tracking number additionally reports min/max across N_ROUNDS
    # independent rounds (VERDICT r4 next #3: BENCH_r04's 161 FPS vs the
    # session's 176 was a one-shot artifact with no variance bar — a
    # driver artifact must not be able to sit 10% below the README
    # silently).
    N_ROUNDS = 3

    def rounds(measure_once):
        vals = [measure_once() for _ in range(N_ROUNDS)]
        return float(np.median(vals)), float(min(vals)), float(max(vals))

    def _b1_round():
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _, d = encode_and_flow(params, fmap, net, inp, img)
            np.asarray(d)  # fetch-sync (see frontend note below)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    per_frame_b1, per_frame_b1_min, per_frame_b1_max = rounds(_b1_round)

    # production path (tracking.motion_filter.batch, default 8): the whole
    # admit-and-append loop runs on device as a lax.scan with ONE readback
    # per batch (a readback costs ~30 ms on the remote link regardless of
    # size — batching amortizes it; semantics identical to per-frame)
    from mneslam_tpu.tracking.motion_filter import track_batch_step

    MB = 8
    ht8b, wd8b = H // 8, W // 8
    feat_dtype = jax.tree.leaves(params)[0].dtype
    vstate = video_lib.init_video(buffer, ht8b, wd8b, feat_dtype=feat_dtype)
    imgs_b = jnp.stack([img] * MB)
    deps_b = jnp.ones((MB, H, W))
    ts_b = jnp.arange(MB, dtype=jnp.float32)
    gts_b = jnp.stack([jnp.eye(4)] * MB)
    zctx = jnp.zeros((128, ht8b, wd8b))
    out = track_batch_step(params, vstate, jnp.asarray(1, jnp.int32), fmap,
                           zctx, zctx, imgs_b, deps_b, ts_b, gts_b,
                           jnp.asarray(1e9))
    jax.block_until_ready(out[1])

    def _batch_round():
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = track_batch_step(params, vstate, jnp.asarray(1, jnp.int32),
                                   fmap, zctx, zctx, imgs_b, deps_b, ts_b,
                                   gts_b, jnp.asarray(1e9))
            np.asarray(out[5])  # the one per-batch readback (admit flags)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / MB

    per_frame, per_frame_min, per_frame_max = rounds(_batch_round)
    track_fps = 1.0 / per_frame

    # frontend update step (the per-keyframe cost): window of edges
    state = video_lib.init_video(buffer, ht8, wd8, feat_dtype=feat_dtype)
    rng = np.random.default_rng(1)
    state = state._replace(
        fmaps=(jnp.asarray(rng.standard_normal((buffer, 128, ht8, wd8), np.float32)) * 0.1).astype(feat_dtype),
        inps=(jnp.asarray(rng.standard_normal((buffer, 128, ht8, wd8), np.float32)) * 0.1).astype(feat_dtype),
        disps=jnp.ones((buffer, ht8, wd8)) * 0.5,
    )
    intr8 = jnp.asarray([W / 16, W / 16, W / 16 - 0.5, H / 16 - 0.5])
    graph = FactorGraph(buffer, ht8, wd8, capacity=factors + 16, params=params,
                        intrinsics=intr8, window=window, max_factors=factors)
    n_kf = min(window - 2, 20)
    ii = np.concatenate([np.arange(0, n_kf - 1), np.arange(1, n_kf)])[:factors]
    jj = np.concatenate([np.arange(1, n_kf), np.arange(0, n_kf - 1)])[:factors]
    graph.add_factors(state, ii, jj)
    state = graph.update(state, t0=1, t1=n_kf, iters=2)  # warm/compile
    np.asarray(state.poses[0])
    # NOTE: timed regions must end in a host FETCH of result bytes — on the
    # remote backend block_until_ready returns before execution finishes,
    # so fetch-free loops only measure dispatch. Updates are CHAINED with
    # one fetch at the end so the ~30 ms tunnel RTT amortizes instead of
    # being billed per call (CLAUDE.md timing protocol).
    n_up = max(args.reps, 8)

    def _update_round():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n_up):
            state = graph.update(state, t0=1, t1=n_kf, iters=2)
        np.asarray(state.poses[0])
        return (time.perf_counter() - t0) / n_up

    per_update, per_update_min, per_update_max = rounds(_update_round)

    # ---- mapping ----
    ds = SyntheticBoxDataset(cfg, num_frames=4, half=bound * 0.9)
    scene = SceneRep(cfg)
    mapper = Mapper(cfg, scene, num_kf=8, rays_per_kf=ds.num_rays_to_save)
    mstate = mapper.init_state(jax.random.PRNGKey(2))
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])
    mstate = mapper.add_keyframe(mstate, jnp.asarray(0), frame, pose, jax.random.PRNGKey(3))
    mstate, met = mapper.optimize(mstate, frame, pose, jax.random.PRNGKey(4), iters=iters)
    float(met["loss"])
    # Per-keyframe optimize calls are CHAINED (state feeds forward) with ONE
    # trailing fetch — the deployment protocol since round 4: run_slam's
    # metric readback is pipelined one keyframe behind the optimize dispatch
    # (slam._post_map_bookkeeping), so consecutive keyframes' super-steps
    # chain on device without a per-keyframe ~30 ms RTT sync. (VERDICT r3
    # weak #2: the old per-call float() sync billed that RTT per keyframe,
    # which deployment no longer pays.)
    t0 = time.perf_counter()
    reps = max(args.reps // 2, 2)
    for r in range(reps):
        mstate, met = mapper.optimize(mstate, frame, pose, jax.random.PRNGKey(5 + r), iters=iters)
    float(met["loss"])  # one trailing fetch-sync for the whole chain
    per_kf = (time.perf_counter() - t0) / reps
    map_iters_per_s = iters / per_kf
    map_hz = 1.0 / per_kf

    # ---- mapping, fast profile (deployment default when rate matters) ----
    # 8 depth-guided samples / 25 iters / bf16 render (the room0_fast.yaml
    # defaults): measured equal-quality to the reference sampling profile
    # on held-out views (BASELINE.md fast-mapping table + round-3 bf16 A/B:
    # 49.1 vs 48.5 dB PSNR, depth L1 0.29 vs 0.27 cm).
    fast_hz = None
    if not args.quick:
        cfg_f = make_config({
            "mapping": {"bound": [[-bound, bound]] * 3,
                        "marching_cubes_bound": [[-bound, bound]] * 3,
                        "sample": n_rays, "min_pixels_cur": 100, "iters": 25},
            "planes_res": {"coarse": coarse, "fine": fine,
                           "bound_dividable": coarse},
            "cam": cfg["cam"],
            "training": {"n_range_d": 11, "n_samples_d": 8, "range_d": 0.1,
                         "render_dtype": "bfloat16"},
            "tracking": {"buffer": buffer},
        })
        scene_f = SceneRep(cfg_f)
        mapper_f = Mapper(cfg_f, scene_f, num_kf=8,
                          rays_per_kf=ds.num_rays_to_save)
        mstate_f = mapper_f.init_state(jax.random.PRNGKey(2))
        mstate_f = mapper_f.add_keyframe(mstate_f, jnp.asarray(0), frame, pose,
                                         jax.random.PRNGKey(3))
        mstate_f, met_f = mapper_f.optimize(mstate_f, frame, pose,
                                            jax.random.PRNGKey(4), iters=25)
        float(met_f["loss"])
        t0 = time.perf_counter()
        for r in range(reps):
            mstate_f, met_f = mapper_f.optimize(
                mstate_f, frame, pose, jax.random.PRNGKey(5 + r), iters=25)
        float(met_f["loss"])  # chained + one trailing fetch (see above)
        per_kf_fast = (time.perf_counter() - t0) / reps
        fast_hz = 1.0 / per_kf_fast

    # ---- mapping, bf16 render path (training.render_dtype: bfloat16) ----
    # The measured single-chip speed knob at reference sampling (BASELINE.md
    # round-3: 17.1 -> 13.85 ms/iter; depth quality unaffected, PSNR floor
    # ~47 dB — below real-scene signal).
    bf16_hz = None
    if not args.quick:
        cfg_b = make_config({
            "mapping": dict(cfg["mapping"]),
            "planes_res": dict(cfg["planes_res"]),
            "cam": cfg["cam"],
            "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1,
                         "render_dtype": "bfloat16"},
            "tracking": {"buffer": buffer},
        })
        scene_b = SceneRep(cfg_b)
        mapper_b = Mapper(cfg_b, scene_b, num_kf=8,
                          rays_per_kf=ds.num_rays_to_save)
        mstate_b = mapper_b.init_state(jax.random.PRNGKey(2))
        mstate_b = mapper_b.add_keyframe(mstate_b, jnp.asarray(0), frame, pose,
                                         jax.random.PRNGKey(3))
        mstate_b, met_b = mapper_b.optimize(mstate_b, frame, pose,
                                            jax.random.PRNGKey(4), iters=iters)
        float(met_b["loss"])
        t0 = time.perf_counter()
        for r in range(reps):
            mstate_b, met_b = mapper_b.optimize(
                mstate_b, frame, pose, jax.random.PRNGKey(5 + r), iters=iters)
        float(met_b["loss"])  # chained + one trailing fetch (see above)
        bf16_hz = 1.0 / ((time.perf_counter() - t0) / reps)

    # ---- ScanNet-scale stress: buffer 512 global/loop BA (VERDICT r3 #3) ----
    # Reference workload: configs/ScanNet/scannet.yaml buffer 512, 240x320
    # (1/8-res 30x40), radius 1. Exercises the host edge proposal at t=512,
    # the chunked corr+GRU passes (update_lowmem bound), and the
    # sparse-Schur full-history solve.
    scannet = {}
    if not args.quick:
        from mneslam_tpu.config import make_config as _mkcfg
        from mneslam_tpu.tracking.backend import Backend

        bs, hts, wds = 512, 30, 40
        cfg_s = _mkcfg({"tracking": {"buffer": bs}})
        rng_s = np.random.default_rng(7)
        st_s = video_lib.init_video(bs, hts, wds, feat_dtype=feat_dtype)
        # smooth synthetic trajectory so frame distances are realistic
        steps_fwd = 0.03 * rng_s.standard_normal((bs, 3)).astype(np.float32)
        trans = np.cumsum(steps_fwd, axis=0)
        poses7 = np.zeros((bs, 7), np.float32)
        poses7[:, :3] = trans
        poses7[:, 6] = 1.0
        st_s = st_s._replace(
            poses=jnp.asarray(poses7),
            fmaps=(jnp.asarray(rng_s.standard_normal(
                (bs, 128, hts, wds), np.float32)) * 0.1).astype(feat_dtype),
            inps=(jnp.asarray(rng_s.standard_normal(
                (bs, 128, hts, wds), np.float32)) * 0.1).astype(feat_dtype),
            disps=jnp.ones((bs, hts, wds)) * 0.7,
            disps_sens=jnp.ones((bs, hts, wds)) * 0.7,
            timestamps=jnp.arange(bs, dtype=jnp.float32),
        )
        intr_s = jnp.asarray([40.0, 40.0, 20.0, 15.0])
        backend = Backend(params, intr_s, cfg_s, bs, hts, wds)

        # NOTE: warm/timed pairs run on the SAME input state — a chained
        # second call would re-propose on updated poses, change the edge
        # count, and recompile the padded-shape programs (a 15 s "timing").
        # TWO warm calls: the first fills the incremental frame-distance
        # cache (tracking/dist_cache.py) cold, the second compiles its
        # dirty-flags reduction; the timed call is then the steady state
        # (clean cache — the BA-converged best case).
        for _ in range(2):
            _ = backend._propose_edges(st_s, 0, bs, 0, backend.radius,
                                       backend.nms, backend.thresh,
                                       max_factors=16 * bs, loop=False)
        t0 = time.perf_counter()
        es = backend._propose_edges(st_s, 0, bs, 0, backend.radius,
                                    backend.nms, backend.thresh,
                                    max_factors=16 * bs, loop=False)
        scannet["proposal_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        scannet["edges_proposed"] = int(len(es))

        # deployment-representative case: a global BA moved the newest 32
        # keyframes beyond tolerance -> the cache recomputes only their
        # rows/cols. Two perturbations of identical size: the first pays
        # the padded-shape compile of the partial recompute, the second is
        # the timed steady state.
        poses_d = np.array(st_s.poses)
        for round_i in (1, 2):
            poses_d[bs - 32:, :3] += 1e-3 * round_i
            st_d = st_s._replace(poses=jnp.asarray(poses_d))
            if round_i == 1:
                backend._propose_edges(st_d, 0, bs, 0, backend.radius,
                                       backend.nms, backend.thresh,
                                       max_factors=16 * bs, loop=False)
            else:
                t0 = time.perf_counter()
                backend._propose_edges(st_d, 0, bs, 0, backend.radius,
                                       backend.nms, backend.thresh,
                                       max_factors=16 * bs, loop=False)
                scannet["proposal_ms_32dirty"] = round(
                    (time.perf_counter() - t0) * 1e3, 1)
                scannet["proposal_recomputed_pairs"] = int(
                    backend.dist_cache.recomputed_pairs)

        st_w, _, n_edges = backend.dense_ba(st_s, bs, steps=1)  # warm/compile
        np.asarray(st_w.poses[0])
        t0 = time.perf_counter()
        st_t, _, _ = backend.dense_ba(st_s, bs, steps=1)
        np.asarray(st_t.poses[0])
        scannet["global_ba_step_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        scannet["global_ba_edges"] = int(n_edges)

        # the chunked-update half alone (reference update_lowmem's cost,
        # factor_graph.py:280-346): R chained graph.update calls, one
        # trailing scalar fetch — the VERDICT r4 #6 <600 ms target
        _fetch = jax.jit(lambda x: x.astype(jnp.float32).reshape(-1)[0])
        graph_u = backend._make_graph((backend.radius + 2) * 2 * bs, window=bs)
        graph_u.add_factors(st_s, es[:, 0], es[:, 1], remove=True)
        st_u = graph_u.update(st_s, t0=1, t1=bs, iters=2)  # warm
        float(_fetch(st_u.poses))
        R_u = 3
        t0 = time.perf_counter()
        st_u = st_s
        for _ in range(R_u):
            st_u = graph_u.update(st_u, t0=1, t1=bs, iters=2)
        float(_fetch(st_u.poses))
        scannet["update_ms"] = round((time.perf_counter() - t0) * 1e3 / R_u, 1)

        st_w, _, n_loop = backend.loop_ba(st_s, bs, 0, bs, steps=1)
        np.asarray(st_w.poses[0])
        t0 = time.perf_counter()
        st_t, _, _ = backend.loop_ba(st_s, bs, 0, bs, steps=1)
        np.asarray(st_t.poses[0])
        scannet["loop_ba_step_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        scannet["loop_ba_edges"] = int(n_loop)

    # ---- mesh-fleet super-step (BASELINE eval-config #5 scale) ----
    # The flagship multi-agent mode's per-round cost at Replica working
    # shapes. On an N-chip fleet the agent axis is sharded 1 agent/device,
    # so the 1-agent super-step IS the per-device program (the same
    # single-chip-measures-the-slice argument as the row-sharded mapper);
    # the 2-agent run on this one chip is the serialized bound when two
    # agents share a device.
    fleet = {}
    if not args.quick:
        from mneslam_tpu.parallel.fleet import make_fleet_super_step, tree_stack

        sstep = make_fleet_super_step(mapper)
        for n_ag in (1, 2):
            st = tree_stack([mstate] * n_ag)
            fids = jnp.zeros((n_ag,), jnp.int32)
            frames_s = tree_stack([frame] * n_ag)
            poses_s = jnp.stack([pose] * n_ag)
            k1 = jax.random.split(jax.random.PRNGKey(11), n_ag)
            k2 = jax.random.split(jax.random.PRNGKey(12), n_ag)
            valid = jnp.ones((n_ag,), bool)
            st, met_fl = sstep(st, fids, frames_s, poses_s, k1, k2, valid,
                               iters=iters)
            float(met_fl["loss"][0])  # warm/compile
            t0 = time.perf_counter()
            for r in range(reps):
                st, met_fl = sstep(st, fids, frames_s, poses_s, k1, k2,
                                   valid, iters=iters)
            float(met_fl["loss"][0])  # chained + one trailing fetch
            fleet[f"super_step_ms_{n_ag}agent"] = round(
                (time.perf_counter() - t0) / reps * 1e3, 1)
        fleet["per_agent_kf_hz_sharded"] = round(
            1e3 / fleet["super_step_ms_1agent"], 2)

        # composed agent x rows mode (the actual v5e-8 2-agent deployment,
        # parallel/fleet.make_fleet_super_step_row_sharded): per-device
        # program = 4-shard row-sharded step + add_keyframe packing +
        # valid-mask select, executed exactly on this one chip
        # (tools/rowshard_step.build_composed_superstep). Compute-only;
        # ICI stays analytic (tools/projection.py).
        _add_tools_path()
        from rowshard_step import measure_composed_ms_kf

        ms_c = measure_composed_ms_kf(4, iters=iters)
        fleet["composed_ms_kf_4shard"] = round(ms_c, 1)
        fleet["composed_per_agent_kf_hz_compute"] = round(1e3 / ms_c, 2)

    # ---- row-sharded mapper per-device step (the >5 Hz north-star) ----
    # Single-chip execution of the v5e-8 per-device program (local ray
    # shard + local plane rows; collectives replaced by their local
    # equivalents — tools/rowshard_step.py). Per-device COMPUTE is
    # measured; ICI remains analytic (tools/projection.py).
    rowshard = {}
    if not args.quick:
        _add_tools_path()
        from rowshard_step import measure_ms_iter, packed_bytes_all_planes

        ms8 = measure_ms_iter(8, k=40, n_wall=5)
        rowshard["per_device_ms_iter_8shard"] = round(ms8, 2)
        rowshard["kf_hz_ceiling_v5e8"] = round(1e3 / (iters * ms8), 2)

        # the deployment configuration (room0_v5e8.yaml): bf16 render +
        # shard_gather_every 8 (k-stale loop-invariant tables, round 5 —
        # quality-neutral, divides the packed-table all-gather by 8).
        # Compute is MEASURED; the serialized bound adds the ANALYTIC ICI
        # term (payload from the actual plane shapes; 100 GB/s effective
        # per-device collective bandwidth, the conservative assumption —
        # tools/projection.py): ici = (1/k + 1) * (N-1)/N * packed / BW.
        ms8g = measure_ms_iter(8, bf16=True, gather_every=8, k=40, n_wall=5)
        payload = packed_bytes_all_planes(8, bf16=True)
        ici_ms = (1.0 / 8 + 1.0) * (7.0 / 8) * payload / 100e9 * 1e3
        rowshard["per_device_ms_iter_8shard_bf16_g8"] = round(ms8g, 2)
        rowshard["kf_hz_ceiling_v5e8_bf16_g8"] = round(1e3 / (iters * ms8g), 2)
        rowshard["kf_hz_serialized_v5e8_bf16_g8_at100GBs"] = round(
            1e3 / (iters * (ms8g + ici_ms)), 2)
        rowshard["ici_ms_iter_bf16_g8_analytic_at100GBs"] = round(ici_ms, 2)

    # ---- end-to-end SLAM throughput (the reference's real-time claim) ----
    # Composite pipeline rate at the reference's keyframe admission (~1 in 5
    # frames at the 4 px flow threshold, configs/Replica/replica.yaml:62-63):
    # every frame pays the motion filter; each admitted keyframe pays the
    # frontend's 4+2 GRU/BA iterations (3 update calls of 2 iters) plus the
    # full mapping optimization.
    admission = 5
    frontend_per_kf = per_update * 3
    slam_fps = admission / (admission * per_frame + frontend_per_kf + per_kf)
    slam_fps_fast = (admission / (admission * per_frame + frontend_per_kf
                                  + per_kf_fast) if fast_hz else None)

    result = {
        "metric": "replica_shapes_tracking_fps",
        "value": round(track_fps, 2),
        "unit": "fps",
        "vs_baseline": round(track_fps / 30.0, 3),
        "extra": {
            "device": str(dev),
            "quick": args.quick,
            "slam_fps": round(slam_fps, 2),
            "slam_admission_rate": f"1/{admission}",
            "track_fps_minmax": [round(1.0 / per_frame_max, 2),
                                 round(1.0 / per_frame_min, 2)],
            "frontend_update_ms": round(per_update * 1e3, 1),
            "frontend_update_ms_minmax": [round(per_update_min * 1e3, 1),
                                          round(per_update_max * 1e3, 1)],
            "map_iters_per_s": round(map_iters_per_s, 1),
            "map_keyframe_hz": round(map_hz, 2),
            "map_iters_per_kf": iters,
            **({"map_keyframe_hz_fast": round(fast_hz, 2),
                "slam_fps_fast": round(slam_fps_fast, 2)} if fast_hz else {}),
            **({"map_keyframe_hz_bf16": round(bf16_hz, 2)} if bf16_hz else {}),
            "track_frame_ms": round(per_frame * 1e3, 1),
            "track_frame_ms_batch1": round(per_frame_b1 * 1e3, 1),
            "track_frame_ms_batch1_minmax": [round(per_frame_b1_min * 1e3, 1),
                                             round(per_frame_b1_max * 1e3, 1)],
            "track_batch": MB,
            "scannet_scale": scannet,
            "fleet": fleet,
            "rowshard": rowshard,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
