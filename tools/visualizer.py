"""Offline run visualizer (replaces the reference's bit-rotted visualizer.py).

    python tools/visualizer.py --run output/exp/agent_0 [--gt gt_poses.npy]

Produces, inside <run>/vis/: the estimated-vs-GT trajectory plot, loss/psnr
curves from metrics.jsonl, and prints mesh statistics.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
from mneslam_tpu.ops import mc  # noqa: E402
from mneslam_tpu.utils.vis import save_trajectory_plot  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--gt", default=None)
    args = ap.parse_args()

    out = os.path.join(args.run, "vis")
    os.makedirs(out, exist_ok=True)

    est_path = os.path.join(args.run, "est_poses.npy")
    if os.path.exists(est_path):
        est = np.load(est_path)
        gt = np.load(args.gt) if args.gt else est
        save_trajectory_plot(os.path.join(out, "trajectory.png"),
                             gt[:, :3, 3], est[:, :3, 3])
        print(f"trajectory plot -> {out}/trajectory.png ({len(est)} poses)")

    metrics_path = os.path.join(args.run, "metrics.jsonl")
    if os.path.exists(metrics_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps, loss, psnr = [], [], []
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec:
                    steps.append(rec["step"])
                    loss.append(rec["loss"])
                    psnr.append(rec.get("psnr", float("nan")))
        if steps:
            fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4))
            a1.plot(steps, loss)
            a1.set_title("mapping loss")
            a1.set_yscale("log")
            a2.plot(steps, psnr)
            a2.set_title("train PSNR (dB)")
            fig.savefig(os.path.join(out, "curves.png"), dpi=110, bbox_inches="tight")
            print(f"metric curves -> {out}/curves.png ({len(steps)} keyframes)")

    mesh_dir = os.path.join(args.run, "mesh")
    if os.path.isdir(mesh_dir):
        for name in sorted(os.listdir(mesh_dir)):
            if name.endswith(".ply"):
                v, f, c = mc.load_ply(os.path.join(mesh_dir, name))
                print(f"mesh {name}: {len(v)} verts, {len(f)} faces, "
                      f"colors={'yes' if c is not None else 'no'}")


if __name__ == "__main__":
    main()
