"""Per-device cost of 8-way ray-sharded mapping, measured on ONE real chip.

The multi-chip mapping claim (BASELINE north star: >5 Hz at reference
sampling on v5e-8) rests on the ray-sharded mapper: each device runs the
SAME program at rays/8, then psums the (replicated) plane gradients over
ICI. The per-device compute half of that claim is measurable on one chip:
run the full mapping optimize step at sample=2048/8=256 global +
100/8~13 current rays with UNCHANGED plane/bound/sample-depth config, and
compare per-iteration wall time against the unsharded 2048+100 baseline.

The remaining term is the gradient allreduce of the CANONICAL plane
cotangents (3x [32,401,401] + 3x [32,201,201] fp32 = 77 MB; the packed
[HW,4C] intermediates stay device-local). At v5e's published 1.6 Tbps
(200 GB/s) ICI per chip and ring allreduce cost 2*(p-1)/p * bytes, that
bounds ~0.7 ms/iter, overlappable with the backward.
Projection = max(per-device step, allreduce bound).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.mapping.mapper import Mapper
from mneslam_tpu.models.scene_rep import SceneRep


def measure(n_rays, n_cur, iters=50, reps=5):
    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": n_rays, "min_pixels_cur": n_cur, "iters": iters},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=bound * 0.9)
    mapper = Mapper(cfg, scene, num_kf=8, rays_per_kf=ds.num_rays_to_save)
    st = mapper.init_state(jax.random.PRNGKey(2))
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])
    st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose, jax.random.PRNGKey(3))

    st2, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4), iters=iters)
    float(met["loss"])  # warm + fetch-sync
    walls = []
    for r in range(reps):
        t0 = time.perf_counter()
        st2, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(5 + r),
                                   iters=iters)
        float(met["loss"])
        walls.append(time.perf_counter() - t0)
    per_iter = float(np.median(walls)) / iters * 1e3
    print(f"rays {n_rays:5d}+{n_cur:3d}: {per_iter:7.2f} ms/iter "
          f"({1000.0 / (per_iter * iters):.2f} Hz at {iters} iters/kf)",
          flush=True)
    return per_iter


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    full = measure(2048, 100)
    per_dev = measure(256, 13)
    allreduce_ms = 0.7  # ring bound at 200 GB/s ICI, 77 MB canonical grads
    proj = max(per_dev, allreduce_ms)
    print(f"v5e-8 projection: max(per-device {per_dev:.2f}, "
          f"allreduce bound {allreduce_ms}) = {proj:.2f} ms/iter "
          f"-> {1000.0 / (proj * 50):.2f} Hz at 50 iters/kf "
          f"(single-chip full: {full:.2f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
