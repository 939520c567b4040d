"""Virtual evaluation viewpoints (reference
tools/coslam_eval/create_virtual_cameras_replica.py parity): sample unseen
camera poses near the keyframe trajectory for depth-L1 evaluation.

    python tools/create_virtual_cameras.py --poses key_est_poses.npy \
        --out virtual_cams.npy [--n 100] [--trans 0.1] [--rot 0.1]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
import jax.numpy as jnp  # noqa: E402

from mneslam_tpu.ops import lie  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--trans", type=float, default=0.1)
    ap.add_argument("--rot", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    poses = np.load(args.poses)  # [K, 4, 4]
    rng = np.random.default_rng(args.seed)
    base_idx = rng.integers(0, len(poses), args.n)

    out = []
    for i in base_idx:
        xi = np.concatenate([
            args.trans * rng.standard_normal(3),
            args.rot * rng.standard_normal(3),
        ])
        T = np.asarray(lie.matrix(lie.exp(jnp.asarray(xi))))
        out.append(T @ poses[i])
    np.save(args.out, np.stack(out).astype(np.float32))
    print(f"{args.n} virtual cameras -> {args.out}")


if __name__ == "__main__":
    main()
