"""Full-SLAM integration test (BASELINE config #2 in miniature).

Runs MNESLAM.run_slam end-to-end on the synthetic box room with an ORACLE
update op supplying ground-truth reprojection targets (the learned weights
aren't available offline): motion filter admission, frontend init/update,
keyframe management, windowed BA with the RGB-D prior, lagged mapping,
trajectory filling, and Sim3 APE evaluation all execute for real.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.ops import lie, projective
from mneslam_tpu.slam import MNESLAM

FLIP = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def gt_tracker_poses(dataset):
    """Dataset OpenGL c2w -> tracker-frame w2c 7-vecs (the inverse of
    video.get_poses_c2w's alignment)."""
    G0 = dataset[0]["c2w"]
    table = []
    for i in range(len(dataset)):
        Gi = dataset[i]["c2w"]
        C = FLIP @ np.linalg.inv(G0) @ Gi @ FLIP   # tracker c2w
        table.append(np.asarray(lie.from_matrix(jnp.asarray(np.linalg.inv(C)))))
    return jnp.asarray(np.stack(table))


def make_oracle(gt_table, intrinsics):
    def update_fn(params, state, ii, jj, net, corr, motion, coords1):
        idx = jnp.clip(state.timestamps.astype(jnp.int32), 0, gt_table.shape[0] - 1)
        gt_poses = gt_table[idx]
        tgt, valid = projective.projective_transform(
            gt_poses, state.disps_sens, intrinsics, ii, jj)
        return net, tgt - coords1, jnp.broadcast_to(valid, tgt.shape)

    def agg_fn(params, net, ii, mask, B):
        ht, wd = net.shape[2], net.shape[3]
        return 1e-4 * jnp.ones((net.shape[0], ht, wd)), \
            jnp.zeros((net.shape[0], 576, ht, wd))

    return update_fn, agg_fn


@pytest.mark.slow
def test_full_slam_oracle(tmp_path):
    H, W = 64, 96
    cfg = make_config({
        "mode": "slam",
        "data": {"output": str(tmp_path), "exp_name": "slam"},
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3, "marching_cubes_bound": [[-2.1, 2.1]] * 3,
            "sample": 256, "min_pixels_cur": 48, "first_iters": 60, "iters": 10,
            "keyframe_every": 4, "global_ba_every": 1000,
        },
        "planes_res": {"coarse": 0.44, "fine": 0.22, "bound_dividable": 0.22},
        "cam": {"H": H, "W": W, "fx": 60.0, "fy": 60.0, "cx": 47.5, "cy": 31.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 8.0},
        "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.25, "trunc": 0.15},
        "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48, "truncation": 0.15},
        "meshing": {"resolution": 0.15},
        "tracking": {
            "buffer": 40, "warmup": 5, "upsample": False,
            "motion_filter": {"thresh": -1.0},          # admit every frame
            "frontend": {"enable_loop": False, "keyframe_thresh": -1.0,
                         "window": 10, "radius": 1, "max_factors": 30,
                         "nms": 0, "thresh": 25.0},
            "backend": {"thresh": 25.0, "radius": 1, "nms": 2, "loop_window": 10,
                        "loop_thresh": 25.0, "loop_radius": 1, "loop_nms": 2},
        },
        "loop_detection": {"enabled": False},
    })
    ds = SyntheticBoxDataset(cfg, num_frames=24)
    gt_table = gt_tracker_poses(ds)
    intr8 = jnp.asarray([60.0 / 8, 60.0 / 8, 47.5 / 8, 31.5 / 8])
    update_fn, agg_fn = make_oracle(gt_table, intr8)

    slam = MNESLAM(cfg, ds, rank=0, update_fn=update_fn, agg_fn=agg_fn)
    results = slam.run_slam()

    assert slam.tracker.counter >= 20
    assert slam.map_counter >= 10
    assert "ate" in results, f"no ATE computed: {results}"
    # oracle targets + RGB-D prior: trajectory should be recovered to cm scale
    assert results["ate"]["rmse"] < 0.05, results["ate"]
    for f in ("est_poses.npy", "key_est_poses.npy", "key_timestamps.npy",
              "metrics_traj.txt"):
        assert os.path.exists(os.path.join(slam.out_dir, f)), f
    assert results.get("mesh_verts", 0) > 100

    # mapping quality en route
    assert slam.metrics_log[-1]["psnr"] > 14.0


@pytest.mark.slow
def test_full_slam_with_culling_and_loop_ba(tmp_path):
    """Variant exercising keyframe redundancy culling and the loop-BA path
    (the paths disabled in the base test)."""
    H, W = 64, 96
    cfg = make_config({
        "mode": "slam",
        "data": {"output": str(tmp_path), "exp_name": "slam2"},
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3, "marching_cubes_bound": [[-2.1, 2.1]] * 3,
            "sample": 192, "min_pixels_cur": 48, "first_iters": 40, "iters": 6,
            "keyframe_every": 4, "global_ba_every": 1000,
        },
        "planes_res": {"coarse": 0.44, "fine": 0.22, "bound_dividable": 0.22},
        "cam": {"H": H, "W": W, "fx": 60.0, "fy": 60.0, "cx": 47.5, "cy": 31.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 8.0},
        "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.25, "trunc": 0.15},
        "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48, "truncation": 0.15},
        "meshing": {"resolution": 0.2},
        "tracking": {
            "buffer": 40, "warmup": 5, "upsample": False,
            # batch 1 keeps the per-frame Tracker.run path covered (the
            # other SLAM tests run the default batched motion filter)
            "motion_filter": {"thresh": -1.0, "batch": 1},
            "frontend": {"enable_loop": True, "keyframe_thresh": 1.2,
                         "window": 8, "radius": 1, "max_factors": 30,
                         "nms": 0, "thresh": 25.0},
            "backend": {"thresh": 25.0, "radius": 1, "nms": 1, "loop_window": 8,
                        "loop_thresh": 25.0, "loop_radius": 1, "loop_nms": 1},
        },
        "loop_detection": {"enabled": False},
    })
    base = SyntheticBoxDataset(cfg, num_frames=24)

    class RepeatFrames:
        """Repeat selected source frames: a duplicated frame has zero flow
        to its predecessor, so the frontend deterministically culls it
        (the redundancy check d(t1-3, t1-2) sees the duplicate pair when
        the NEXT keyframe arrives)."""

        def __init__(self, ds, index_map):
            self.ds, self.index_map = ds, list(index_map)
            self.num_rays_to_save = ds.num_rays_to_save
            self.H, self.W = ds.H, ds.W
            self.rays_d_cam = ds.rays_d_cam
            self.poses = [ds.poses[i] for i in self.index_map]
            self.frame_ids = np.arange(len(self.index_map))

        def __len__(self):
            return len(self.index_map)

        def __getitem__(self, i):
            item = dict(self.ds[self.index_map[i]])
            item["frame_id"] = i
            return item

    index_map = list(range(10)) + [10, 10, 11, 11] + list(range(12, 24))
    ds = RepeatFrames(base, index_map)
    gt_table = gt_tracker_poses(ds)
    intr8 = jnp.asarray([60.0 / 8, 60.0 / 8, 47.5 / 8, 31.5 / 8])
    update_fn, agg_fn = make_oracle(gt_table, intr8)

    slam = MNESLAM(cfg, ds, rank=0, update_fn=update_fn, agg_fn=agg_fn)
    results = slam.run_slam()

    # loop BA ran at least once
    assert slam.tracker.frontend.last_loop_t > 0, "loop BA never triggered"
    assert "ate" in results
    assert results["ate"]["rmse"] < 0.08, results["ate"]

    # --- culled-keyframe/mapper invariant (VERDICT r3 weak #5) ---------
    # The frontend culls the newest-but-one keyframe slot (t1-2) while the
    # mapper lags >= 1 keyframe behind tracking (slam.pending_keyframe's
    # map_counter < counter - 1 guard), so a culled keyframe can never
    # have been mapped: every keyframe in the mapper DB must still exist
    # in the tracker's (shifted) keyframe table, in order.
    assert slam.tracker.frontend.removed_count > 0, \
        "culling never triggered — the invariant was not exercised"
    surviving = [int(t) for t in np.asarray(
        slam.tracker.state.timestamps[:slam.tracker.counter])]
    db = slam.map_state.db
    mapped_ids = [int(i) for i in np.asarray(db.frame_ids[:int(db.count)])]
    assert len(mapped_ids) == len(set(mapped_ids)), mapped_ids
    # order-faithful prefix: mapped keyframe k is surviving keyframe k
    assert mapped_ids == surviving[:len(mapped_ids)], (
        mapped_ids, surviving, slam.tracker.frontend.removed_count)


@pytest.mark.slow
def test_two_agent_slam_with_loop_closure(tmp_path):
    """Interleaved two-agent SLAM with a real mid-run cross-agent loop
    closure (multi_agents.py:44-49 concurrency as a round-robin).

    Agent 1's whole world frame is biased by a rigid transform (its dataset
    poses, hence its oracle tracking and its map, are consistently offset);
    agent 0 runs in the true frame on a later trajectory segment. When
    agent 1 maps the overlap region, its descriptors match agent 0's
    already-published keyframes, render-based alignment against agent 0's
    map recovers the inter-agent transform, and the SLERP deformation pulls
    agent 1's keyframe trajectory toward truth — the closure-disabled
    control IS agent 1's undeformed (biased) keyframe poses."""
    from mneslam_tpu.agents.runner import MultiAgentRunner

    H, W = 64, 96

    def agent_cfg(name):
        return make_config({
            "mode": "slam",
            "data": {"output": str(tmp_path), "exp_name": name},
            "mapping": {
                "bound": [[-2.4, 2.4]] * 3, "marching_cubes_bound": [[-2.1, 2.1]] * 3,
                "sample": 192, "min_pixels_cur": 48, "first_iters": 60, "iters": 8,
                "keyframe_every": 4, "global_ba_every": 1000, "loop_iters": 60,
                "distill_iters": 10, "lr_rot": 0.005, "lr_trans": 0.01,
            },
            "planes_res": {"coarse": 0.48, "fine": 0.24, "bound_dividable": 0.24},
            "cam": {"H": H, "W": W, "fx": 60.0, "fy": 60.0, "cx": 47.5, "cy": 31.5,
                    "H_out": H, "W_out": W, "near": 0.0, "far": 8.0},
            "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.25, "trunc": 0.15},
            "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48, "truncation": 0.15},
            "meshing": {"resolution": 0.25},
            "tracking": {
                "buffer": 32, "warmup": 4, "upsample": False,
                "motion_filter": {"thresh": -1.0, "batch": 4},
                "frontend": {"enable_loop": False, "keyframe_thresh": -1.0,
                             "window": 8, "radius": 1, "max_factors": 24,
                             "nms": 0, "thresh": 25.0},
                "backend": {"thresh": 25.0, "radius": 1, "nms": 1, "loop_window": 8,
                            "loop_thresh": 25.0, "loop_radius": 1, "loop_nms": 1},
            },
            "loop_detection": {"enabled": True, "sim_threshold": 0.9,
                               "min_time_diff": 50, "loop_launch_th": 2,
                               "min_matches_for_fusion": 1},
            "loop_bound": {"bound_0": [[-2.4, 2.4]] * 3, "bound_1": [[-2.4, 2.4]] * 3},
            # near-full correction everywhere so the improvement assert is
            # clean (decay profile itself is unit-tested in test_multiagent)
            "loop_closure": {"pose_decay_sigma": 50.0, "pose_decay_min_weight": 0.8},
        })

    full = SyntheticBoxDataset(agent_cfg("x"), num_frames=20)
    BIAS = np.eye(4, dtype=np.float32)
    BIAS[0, 3] = 0.15
    BIAS[1, 3] = -0.10

    class Slice:
        def __init__(self, ds, lo, hi, bias=None):
            self.ds, self.lo, self.n = ds, lo, hi - lo
            self.bias = bias
            self.num_rays_to_save = ds.num_rays_to_save
        def __len__(self):
            return self.n
        def __getitem__(self, i):
            item = dict(self.ds[self.lo + i])
            item["frame_id"] = i
            if self.bias is not None:
                item["c2w"] = self.bias @ np.asarray(item["c2w"])
            return item

    intr8 = jnp.asarray([60.0 / 8, 60.0 / 8, 47.5 / 8, 31.5 / 8])
    # agent 0 covers the LATER segment so that by the time agent 1 (which
    # starts at frame 0) reaches the overlap, agent 0 has already published
    # those viewpoints — the closure must fire on agent 1 (higher rank =
    # deformation target) mid-run
    slices = [Slice(full, 7, 20), Slice(full, 0, 13, bias=BIAS)]
    agents = []
    for rank, sl in enumerate(slices):
        gt_table = gt_tracker_poses(sl)
        update_fn, agg_fn = make_oracle(gt_table, intr8)
        agents.append(MNESLAM(agent_cfg("ma_slam"), sl, rank=rank, world_size=2,
                              update_fn=update_fn, agg_fn=agg_fn))

    runner = MultiAgentRunner(agents)
    results = runner.run_slam()

    # both agents tracked, mapped, published; descriptors exchanged
    for a in agents:
        assert a.tracker.counter >= 10
        assert a.map_counter >= 2
        assert runner.comms.get_keyframes(a.rank) is not None
    db = runner.comms.descriptors()
    assert {e["agent_id"] for e in db} == {0, 1}
    assert len(results) == 2

    # a cross-agent loop closure fired mid-run on the target agent
    a1 = agents[1]
    assert 0 in a1.collab.fused_agents, "agent 1 never matched agent 0"
    aligned = a1.collab.aligned_poses_c2w
    assert aligned is not None, "cross-agent loop closure never deformed agent 1"

    # ... and the deformation pulled agent 1's keyframes toward truth:
    # control = the biased (undeformed) poses agent 1 mapped with
    n = len(aligned)
    true_pos = np.stack([np.asarray(full[int(ts)]["c2w"])[:3, 3]
                         for ts in a1.mapped_timestamps[:n]])
    biased_pos = np.stack([BIAS[:3, :3] @ p + BIAS[:3, 3] for p in true_pos])
    aligned_pos = np.asarray(aligned)[:, :3, 3]
    err_control = np.linalg.norm(biased_pos - true_pos, axis=1).mean()
    err_aligned = np.linalg.norm(aligned_pos - true_pos, axis=1).mean()
    assert err_aligned < 0.6 * err_control, (
        f"closure did not improve keyframe poses: "
        f"{err_control:.4f} -> {err_aligned:.4f} m")


@pytest.mark.slow
def test_tracker_batch_equals_sequential(tmp_path):
    """Tracker.run_batch == per-frame Tracker.run through the full frontend
    (init, windowed BA, keyframe culling): same counters, timestamps, poses."""
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.tracking.motion_filter import encode_and_flow, encode_frame
    from mneslam_tpu.tracking.tracker import Tracker

    H, W = 64, 96
    cfg = make_config({
        "cam": {"H": H, "W": W, "fx": 60.0, "fy": 60.0, "cx": 47.5, "cy": 31.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 8.0},
        "mapping": {"bound": [[-2.2, 2.2]] * 3,
                    "marching_cubes_bound": [[-2.1, 2.1]] * 3},
        "tracking": {
            "buffer": 40, "warmup": 5, "upsample": False,
            "motion_filter": {"thresh": -1.0},
            "frontend": {"enable_loop": False, "keyframe_thresh": 1.2,
                         "window": 8, "radius": 1, "max_factors": 30,
                         "nms": 0, "thresh": 25.0},
            "backend": {"thresh": 25.0, "radius": 1, "nms": 1, "loop_window": 8,
                        "loop_thresh": 25.0, "loop_radius": 1, "loop_nms": 1},
        },
    })
    ds = SyntheticBoxDataset(cfg, num_frames=18)
    gt_table = gt_tracker_poses(ds)
    intr_full = np.asarray([60.0, 60.0, 47.5, 31.5])
    update_fn, agg_fn = make_oracle(gt_table, jnp.asarray(intr_full / 8.0))
    params = droid_net.init_droid_net(jax.random.PRNGKey(11))

    frames = []
    for i in range(len(ds)):
        it = ds[i]
        frames.append((float(i),
                       jnp.asarray(it["rgb"]).transpose(2, 0, 1),
                       jnp.asarray(it["depth"]),
                       jnp.asarray(it["c2w"])))

    # mixed-admission threshold from a pre-pass over the first few frames
    fm = encode_frame(params, frames[0][1])
    z = jnp.zeros((128, H // 8, W // 8))
    dels = [float(encode_and_flow(params, fm, z, z, f[1])[1]) for f in frames[1:4]]
    thresh = float(np.median(dels))

    def run(batch):
        cfg["tracking"]["motion_filter"]["thresh"] = thresh
        tr = Tracker(cfg, params, intr_full, update_fn=update_fn, agg_fn=agg_fn)
        if batch == 1:
            for ts, im, dep, gt in frames:
                tr.run(ts, im, depth=dep, gt_pose=gt)
        else:
            for s in range(0, len(frames), batch):
                ch = frames[s:s + batch]
                tr.run_batch([f[0] for f in ch], [f[1] for f in ch],
                             [f[2] for f in ch], [f[3] for f in ch])
        return tr

    tr_a, tr_b = run(1), run(5)
    assert tr_a.counter == tr_b.counter
    assert tr_a.frontend.removed_count == tr_b.frontend.removed_count
    np.testing.assert_allclose(np.asarray(tr_a.state.timestamps[:tr_a.counter]),
                               np.asarray(tr_b.state.timestamps[:tr_a.counter]))
    np.testing.assert_allclose(np.asarray(tr_a.state.poses[:tr_a.counter]),
                               np.asarray(tr_b.state.poses[:tr_a.counter]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(tr_a.state.disps[:tr_a.counter]),
                               np.asarray(tr_b.state.disps[:tr_a.counter]),
                               atol=1e-3)
