"""Quality A/B of `mapping.shard_gather_every` (k-stale loop-invariant
tables) on the real chip — round 5, VERDICT r4 next #1.

The row-sharded mapper's k-stale mode hoists ONE pack+all-gather out of
every k-iteration inner loop (mapper._make_row_body): the forward
renders those k iterations against the same loop-invariant packed
table while gradients still reduce and Adam still applies every
iteration — only the forward's table VIEW goes up-to-(k-1) stale.

A 1-device TPU mesh runs the sharded program with identity collectives,
so one chip exercises the EXACT staleness semantics at working scale
(same argument as tools/prof_prefetch_quality.py, which validated
1-stale at 44.6 vs 45.8 dB). Box-room synthetic at the reference
mapping workload (2048+100 rays, 50 iters/kf, c_dim 32, 0.02 m fine
planes, 340x600 camera — /root/reference/configs/Replica/replica.yaml:
13-28), held-out novel views. CPU-mesh equivalence of the sharding
itself: tests/test_parallel.py (gather_every block-start bitwise
equality vs the sync seam).

Usage: python tools/prof_gather_every_quality.py [--kf 15] [--bf16]
"""
import argparse, json, sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.data.rays import rays_from_pose
from mneslam_tpu.mapping.mapper import Mapper
from mneslam_tpu.models.scene_rep import SceneRep
from mneslam_tpu.parallel import mesh as pmesh

ap = argparse.ArgumentParser()
ap.add_argument("--kf", type=int, default=15)
ap.add_argument("--bf16", action="store_true")
ap.add_argument("--iters", type=int, default=50)
args = ap.parse_args()

HALF = 2.0
results = {}
for gather_every in (1, 2, 4, 8):
    cfg = make_config({
        "mapping": {"bound": [[-2.2, 2.2]] * 3,
                    "marching_cubes_bound": [[-2.05, 2.05]] * 3,
                    "sample": 2048, "min_pixels_cur": 100,
                    "first_iters": 200, "iters": args.iters,
                    "shard_gather_every": gather_every},
        "planes_res": {"coarse": 0.04, "fine": 0.02, "bound_dividable": 0.04},
        "cam": {"H": 340, "W": 600, "fx": 300.0, "fy": 300.0, "cx": 299.5,
                "cy": 169.5, "near": 0.0, "far": 8.0, "depth_trunc": 100.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1,
                     "trunc": 0.1,
                     "render_dtype": "bfloat16" if args.bf16 else "float32"},
        "model": {"c_dim": 32, "input_ch": 64, "input_ch_pos": 48,
                  "truncation": 0.1},
    })
    ds = SyntheticBoxDataset(cfg, num_frames=120, half=HALF)
    scene = SceneRep(cfg)
    mesh = pmesh.make_mesh(1, devices=jax.devices()[:1])
    mapper = Mapper(cfg, scene, num_kf=args.kf + 2,
                    rays_per_kf=ds.num_rays_to_save,
                    mesh=mesh, shard_plane_rows=True)
    state = mapper.init_state(jax.random.PRNGKey(0))
    f0 = {k: jnp.asarray(v) for k, v in ds[0].items()}
    state, _ = mapper.first_frame_mapping(state, f0, jnp.asarray(ds[0]["c2w"]),
                                          jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    n_kf = 0
    for fid in range(2, 2 + 2 * args.kf, 2):
        it = ds[fid]
        fr = {k: jnp.asarray(v) for k, v in it.items()}
        k = jax.random.fold_in(jax.random.PRNGKey(2), fid)
        state = mapper.add_keyframe(state, jnp.asarray(fid), fr,
                                    jnp.asarray(it["c2w"]), k)
        state, m = mapper.optimize(state, fr, jnp.asarray(it["c2w"]),
                                   jax.random.fold_in(k, 1), iters=args.iters)
        n_kf += 1
    float(m["loss"])  # fetch-sync the chain
    t_map = time.perf_counter() - t0

    psnrs, l1s = [], []
    for fid in (11, 21):
        it = ds[fid]
        ro, rd = rays_from_pose(jnp.asarray(it["direction"]).reshape(-1, 3),
                                jnp.asarray(it["c2w"]))
        depth, rgb = scene.render_image_rays(
            state.params, ro, rd, jnp.asarray(it["depth"]).reshape(-1),
            chunk=8192)
        mse = float(np.mean(np.square(np.asarray(rgb) - it["rgb"].reshape(-1, 3))))
        psnrs.append(-10 * np.log10(mse))
        l1s.append(float(np.mean(np.abs(np.asarray(depth) - it["depth"].reshape(-1)))) * 100)
    results[gather_every] = {
        "psnr_db": round(float(np.mean(psnrs)), 2),
        "depth_l1_cm": round(float(np.mean(l1s)), 2),
        "final_loss": round(float(m["loss"]), 5),
        "map_s_per_kf_1dev": round(t_map / n_kf, 2),
    }
    print(f"gather_every={gather_every}: {results[gather_every]}", flush=True)

print(json.dumps({"kf": args.kf, "iters": args.iters, "bf16": args.bf16,
                  "results": results}))
