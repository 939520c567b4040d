"""Trajectory evaluation CLI (reference tools/eval_ate.py parity).

    python tools/eval_ate.py --est output/exp/agent_0/est_poses.npy \
        --gt gt_poses.npy [--sim3] [--plot traj.png]

Poses are [N, 4, 4] c2w stacks; prints rmse/mean/median (meters).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
from mneslam_tpu.eval import ate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--est", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--sim3", action="store_true", help="Umeyama Sim3 alignment (evo APE)")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    est = np.load(args.est)
    gt = np.load(args.gt)
    m = ate.evaluate_ate(gt, est, alignment="sim3" if args.sim3 else "se3")
    for k, v in m.items():
        print(f"{k}: {v}")

    if args.plot:
        from mneslam_tpu.utils.vis import save_trajectory_plot

        n = min(len(gt), len(est))
        save_trajectory_plot(args.plot, gt[:n, :3, 3], est[:n, :3, 3])
        print(f"plot -> {args.plot}")


if __name__ == "__main__":
    main()
