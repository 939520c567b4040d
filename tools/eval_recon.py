"""Reconstruction evaluation CLI (reference tools/coslam_eval/eval_recon.py parity).

    python tools/eval_recon.py --rec mesh.ply --gt gt_mesh.ply \
        [--cull poses.npy --intr fx,fy,cx,cy --hw H,W] [--n 200000]

Prints accuracy (cm), completion (cm), completion ratio (%).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
from mneslam_tpu.eval import recon  # noqa: E402
from mneslam_tpu.ops import mc  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rec", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--n", type=int, default=200000)
    ap.add_argument("--dist_th", type=float, default=0.05)
    ap.add_argument("--cull", default=None, help="keyframe c2w .npy for frustum culling")
    ap.add_argument("--intr", default=None, help="fx,fy,cx,cy")
    ap.add_argument("--hw", default=None, help="H,W")
    ap.add_argument("--align", action="store_true",
                    help="rigid ICP registration onto GT before metrics "
                         "(reference eval_recon.py:131-134)")
    ap.add_argument("--icp_threshold", type=float, default=0.1)
    args = ap.parse_args()

    rec_v, rec_f, _ = mc.load_ply(args.rec)
    gt_v, gt_f, _ = mc.load_ply(args.gt)

    if args.cull:
        from mneslam_tpu.mapping.cull import cull_mesh

        poses = np.load(args.cull)
        intr = np.asarray([float(x) for x in args.intr.split(",")])
        H, W = (int(x) for x in args.hw.split(","))
        rec_v, rec_f, _ = cull_mesh(rec_v, rec_f, poses, intr, H, W)
        print(f"culled mesh: {len(rec_v)} verts, {len(rec_f)} faces")

    m = recon.eval_mesh(rec_v, rec_f, gt_v, gt_f, n_samples=args.n,
                        dist_th=args.dist_th, align=args.align,
                        icp_threshold=args.icp_threshold)
    for k, v in m.items():
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    main()
