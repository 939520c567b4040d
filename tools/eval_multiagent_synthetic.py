"""Two-agent end-to-end SLAM evaluation on the synthetic box room (TPU).

The north-star multi-agent scenario (BASELINE.md eval config #5 analogue)
at working scale: two agents on overlapping trajectory segments, agent 1's
world frame rigidly biased; interleaved SLAM (`MultiAgentRunner.run_slam`)
with descriptor exchange, mid-run render-based inter-agent loop closure,
SLERP trajectory deformation, bound-overlap fusion + distillation at
final_run, and per-agent terminate (mesh + trajectory fill + Sim3 APE).
Oracle reprojection targets stand in for droid.pth (an external input);
everything else is the production path.

Reports per-agent APE, the closure's keyframe-pose improvement vs the
biased control, and wall-clock.

    python tools/eval_multiagent_synthetic.py [--frames 60] [--hw 240,320]
        [--fast]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mneslam_tpu.agents.runner import MultiAgentRunner
from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.slam import MNESLAM

sys.path.insert(0, "tools")
from eval_slam_synthetic import gt_tracker_poses, make_oracle  # noqa: E402


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--hw", default="240,320")
    ap.add_argument("--fast", action="store_true",
                    help="fast mapping profile (8 depth samples, 25 iters, "
                    "bf16 — the room0_fast.yaml defaults)")
    ap.add_argument("--out", default="/tmp/eval_ma")
    ap.add_argument("--bias_rot_deg", type=float, default=0.0,
                    help="additionally rotate agent 1's world frame by this "
                    "yaw (deg) — widens the closure evidence beyond the "
                    "pure-translation scenario (VERDICT r3 missing #2)")
    ap.add_argument("--closure_mode", choices=["gated", "reference"],
                    default="gated",
                    help="loop_closure.mode: 'gated' (acceptance gate + "
                    "best-closure-wins, the measured default) or "
                    "'reference' (apply every closure as the reference "
                    "does, mp_slam/mapper.py:417-489 — for A/B parity)")
    ap.add_argument("--map_aligned", action="store_true",
                    help="loop_closure.map_aligned: feed the deformed "
                    "trajectory back into the agent's OWN map (the "
                    "reference's aligned_poses_c2w consumption, "
                    "mp_slam/mapper.py:193-198); the report then adds "
                    "map_kf_err_m, the private map's keyframe-pose error")
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split(","))
    fx = W / 2.0

    def agent_cfg():
        return make_config({
            "mode": "slam",
            "data": {"output": args.out, "exp_name": "ma"},
            "mapping": {
                "bound": [[-2.4, 2.4]] * 3,
                "marching_cubes_bound": [[-2.1, 2.1]] * 3,
                "sample": 2048, "min_pixels_cur": 100, "first_iters": 200,
                "iters": 25 if args.fast else 50,
                "keyframe_every": 5, "global_ba_every": 1000,
                "loop_iters": 100, "distill_iters": 100,
                "lr_rot": 0.005, "lr_trans": 0.01,
            },
            "planes_res": {"coarse": 0.08, "fine": 0.04,
                           "bound_dividable": 0.08},
            "cam": {"H": H, "W": W, "fx": fx, "fy": fx, "cx": W / 2 - 0.5,
                    "cy": H / 2 - 0.5, "H_out": H, "W_out": W,
                    "near": 0.0, "far": 8.0},
            "training": {"n_range_d": 11,
                         "n_samples_d": 8 if args.fast else 32,
                         "range_d": 0.1, "trunc": 0.1,
                         "render_dtype":
                             "bfloat16" if args.fast else "float32"},
            "model": {"c_dim": 32, "input_ch": 64, "input_ch_pos": 48,
                      "truncation": 0.1},
            "meshing": {"resolution": 0.04},
            "tracking": {
                "buffer": args.frames + 2, "warmup": 8, "upsample": False,
                "motion_filter": {"thresh": -1.0},
                "frontend": {"enable_loop": False, "keyframe_thresh": -1.0,
                             "window": 25, "radius": 1, "max_factors": 75,
                             "nms": 0, "thresh": 25.0},
                "backend": {"thresh": 25.0, "radius": 1, "nms": 2,
                            "loop_window": 25, "loop_thresh": 25.0,
                            "loop_radius": 1, "loop_nms": 2},
            },
            "loop_detection": {"enabled": True, "sim_threshold": 0.9,
                               "min_time_diff": 50, "loop_launch_th": 2,
                               "min_matches_for_fusion": 1},
            "loop_bound": {"bound_0": [[-2.4, 2.4]] * 3,
                           "bound_1": [[-2.4, 2.4]] * 3},
            "loop_closure": {"pose_decay_sigma": 50.0,
                             "pose_decay_min_weight": 0.8,
                             "mode": args.closure_mode,
                             "map_aligned": args.map_aligned},
        })

    full = SyntheticBoxDataset(agent_cfg(), num_frames=args.frames)
    BIAS = np.eye(4, dtype=np.float32)
    BIAS[0, 3] = 0.15
    BIAS[1, 3] = -0.10
    if args.bias_rot_deg:
        th = np.deg2rad(args.bias_rot_deg)
        BIAS[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]

    # agent 0 covers the LATER segment (publishes the overlap first);
    # agent 1 starts at 0 in a biased world frame and must close the loop
    third = args.frames // 3
    slices = [Slice(full, third, args.frames),
              Slice(full, 0, 2 * third, bias=BIAS)]
    intr8 = jnp.asarray([fx / 8, fx / 8, (W / 2 - 0.5) / 8, (H / 2 - 0.5) / 8])
    agents = []
    for rank, sl in enumerate(slices):
        gt_table = gt_tracker_poses(sl)
        update_fn, agg_fn = make_oracle(gt_table, intr8)
        agents.append(MNESLAM(agent_cfg(), sl, rank=rank, world_size=2,
                              update_fn=update_fn, agg_fn=agg_fn))

    runner = MultiAgentRunner(agents)
    t0 = time.perf_counter()
    results = runner.run_slam()
    wall = time.perf_counter() - t0

    a1 = agents[1]
    report = {
        "frames": args.frames, "resolution": f"{H}x{W}",
        "fast": args.fast, "closure_mode": args.closure_mode,
        "bias_rot_deg": args.bias_rot_deg,
        "wall_s": round(wall, 1),
        "apes_m": [r.get("ate", {}).get("rmse") for r in results],
        "keyframes": [a.tracker.counter for a in agents],
        "mapped": [a.map_counter for a in agents],
        "closure_fired": 0 in a1.collab.fused_agents,
        "fused_agents": [sorted(a.collab.fused_agents) for a in agents],
    }
    aligned = a1.collab.aligned_poses_c2w
    if aligned is not None:
        n = len(aligned)
        # agent 1's slice starts at frame 0 of the full sequence, so its
        # local timestamps index `full` directly
        true_pos = np.stack([np.asarray(full[int(ts)]["c2w"])[:3, 3]
                             for ts in a1.mapped_timestamps[:n]])
        biased_pos = np.stack([BIAS[:3, :3] @ p + BIAS[:3, 3]
                               for p in true_pos])
        aligned_pos = np.asarray(aligned)[:, :3, 3]
        report["kf_err_biased_control_m"] = round(float(
            np.linalg.norm(biased_pos - true_pos, axis=1).mean()), 4)
        report["kf_err_after_closure_m"] = round(float(
            np.linalg.norm(aligned_pos - true_pos, axis=1).mean()), 4)
        # the PRIVATE map's keyframe poses: with map_aligned they carry
        # the closure correction (=> ~kf_err_after_closure); without, the
        # map stays in the biased tracker world (=> ~kf_err_biased_control)
        map_pos = np.asarray(a1.map_state.kf_poses[:n])[:, :3, 3]
        report["map_aligned"] = args.map_aligned
        report["map_kf_err_m"] = round(float(
            np.linalg.norm(map_pos - true_pos, axis=1).mean()), 4)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
