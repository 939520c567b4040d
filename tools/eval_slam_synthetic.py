"""End-to-end full-SLAM evaluation on the synthetic box room (real TPU).

Oracle update op (ground-truth reprojection targets — the learned droid.pth
is an external input), real everything else: motion filter, frontend
updates, windowed BA with the RGB-D prior, lagged mapping, trajectory fill,
Sim3 APE. Reports quality + per-stage timing.

    python tools/eval_slam_synthetic.py [--frames 40] [--hw 320,640]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.ops import lie, projective
from mneslam_tpu.slam import MNESLAM

FLIP = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def gt_tracker_poses(dataset):
    G0 = dataset[0]["c2w"]
    table = []
    for i in range(len(dataset)):
        Gi = dataset[i]["c2w"]
        C = FLIP @ np.linalg.inv(G0) @ Gi @ FLIP
        table.append(np.asarray(lie.from_matrix(jnp.asarray(np.linalg.inv(C)))))
    return jnp.asarray(np.stack(table))


def make_oracle(gt_table, intrinsics):
    def update_fn(params, state, ii, jj, net, corr, motion, coords1):
        idx = jnp.clip(state.timestamps.astype(jnp.int32), 0, gt_table.shape[0] - 1)
        tgt, valid = projective.projective_transform(
            gt_table[idx], state.disps_sens, intrinsics, ii, jj)
        return net, tgt - coords1, jnp.broadcast_to(valid, tgt.shape)

    def agg_fn(params, net, ii, mask, B):
        ht, wd = net.shape[2], net.shape[3]
        return 1e-4 * jnp.ones((net.shape[0], ht, wd)), \
            jnp.zeros((net.shape[0], 576, ht, wd))

    return update_fn, agg_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--hw", default="320,640")
    ap.add_argument("--out", default="/tmp/eval_slam")
    ap.add_argument("--random-weights", action="store_true",
                    help="run the REAL DroidNet update op (randomly "
                    "initialized — droid.pth is an external input) instead "
                    "of the oracle: no quality claim, but the full learned-"
                    "tracker compute path (fnet/cnet, corr kernel, ConvGRU, "
                    "GraphAgg damping/upmask, BA on predicted targets) runs "
                    "end-to-end at realistic shapes and iteration counts; "
                    "the run asserts every pose/disparity stays finite")
    ap.add_argument("--thresh", type=float, default=-1.0,
                    help="motion-filter admission threshold in px (-1 = "
                    "admit every frame; 4.0 = the reference's Replica/"
                    "ScanNet setting, configs/Replica/replica.yaml:62-63)")
    ap.add_argument("--buffer", type=int, default=0,
                    help="keyframe buffer size (0 = frames+2; set 512 for "
                    "the ScanNet-scale stress shape)")
    ap.add_argument("--global-ba-every", type=int, default=1000,
                    help="run full-history dense BA every N admitted "
                    "keyframes (reference: continuous global-BA thread)")
    ap.add_argument("--enable-loop", action="store_true",
                    help="enable the frontend's windowed loop BA "
                    "(backend.loop_ba) as in ScanNet configs")
    ap.add_argument("--fast", action="store_true",
                    help="use the fast mapping profile (8 depth samples, "
                    "25 iters — equal quality, BASELINE.md)")
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split(","))
    fx = W / 2.0

    cfg = make_config({
        "mode": "slam",
        "data": {"output": args.out, "exp_name": "eval"},
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3, "marching_cubes_bound": [[-2.05, 2.05]] * 3,
            "sample": 2048, "min_pixels_cur": 100, "first_iters": 200,
            "iters": 25 if args.fast else 50,
            "keyframe_every": 5, "global_ba_every": args.global_ba_every,
        },
        "planes_res": {"coarse": 0.08, "fine": 0.04, "bound_dividable": 0.08},
        "cam": {"H": H, "W": W, "fx": fx, "fy": fx, "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 8.0},
        "training": {"n_range_d": 11, "n_samples_d": 8 if args.fast else 32,
                     "range_d": 0.1, "trunc": 0.1},
        "model": {"c_dim": 32, "input_ch": 64, "input_ch_pos": 48, "truncation": 0.1},
        "meshing": {"resolution": 0.04},
        "tracking": {
            "buffer": args.buffer or args.frames + 2, "warmup": 8,
            "upsample": False,
            "motion_filter": {"thresh": args.thresh},
            "frontend": {"enable_loop": args.enable_loop,
                         "keyframe_thresh": -1.0,
                         "window": 25, "radius": 1, "max_factors": 75,
                         "nms": 0, "thresh": 25.0},
            "backend": {"thresh": 25.0, "radius": 1, "nms": 2, "loop_window": 25,
                        "loop_thresh": 25.0, "loop_radius": 1, "loop_nms": 2},
        },
        "loop_detection": {"enabled": False},
    })
    ds = SyntheticBoxDataset(cfg, num_frames=args.frames)
    gt_table = gt_tracker_poses(ds)
    intr8 = jnp.asarray([fx / 8, fx / 8, (W / 2 - 0.5) / 8, (H / 2 - 0.5) / 8])
    if args.random_weights:
        update_fn = agg_fn = None
    else:
        update_fn, agg_fn = make_oracle(gt_table, intr8)

    slam = MNESLAM(cfg, ds, rank=0, update_fn=update_fn, agg_fn=agg_fn)
    t0 = time.perf_counter()
    results = slam.run_slam()
    wall = time.perf_counter() - t0

    if args.random_weights:
        n = slam.tracker.counter
        poses = np.asarray(slam.tracker.state.poses[:n])
        disps = np.asarray(slam.tracker.state.disps[:n])
        assert np.isfinite(poses).all(), "non-finite poses with real GRU"
        assert np.isfinite(disps).all(), "non-finite disparities with real GRU"
        print(f"real-GRU path finite over {n} keyframes "
              f"(|t| max {np.abs(poses[:, :3]).max():.2f} m)")

    report = {
        "frames": args.frames,
        "resolution": f"{H}x{W}",
        "keyframes": slam.tracker.counter,
        "mapped": slam.map_counter,
        "ate_rmse_m": results.get("ate", {}).get("rmse"),
        "mesh_verts": results.get("mesh_verts"),
        "final_train_psnr_db": slam.metrics_log[-1]["psnr"] if slam.metrics_log else None,
        "wall_s": round(wall, 1),
        "end_to_end_fps": round(args.frames / wall, 2),
        "stage_timers": slam.timers.summary(),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
