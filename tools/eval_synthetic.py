"""Mapping-only quality/throughput evaluation at Replica-like scale (TPU).

Synthetic box room, Replica-like camera (340x600, fx=300), reference
mapping workload (2048+100 rays, 50 iters/kf, c_dim 32, 0.02m fine planes),
60 keyframes. Reports PSNR / depth-L1 on held-out views, mesh accuracy vs
the analytic box, and throughput.

Flags: --fast (8 depth samples, 25 iters — the equal-quality fast
profile), --bf16 (training.render_dtype: bfloat16).
"""
import argparse, json, sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.data.rays import rays_from_pose
from mneslam_tpu.mapping.mapper import Mapper
from mneslam_tpu.mapping.mesher import extract_mesh
from mneslam_tpu.models.scene_rep import SceneRep
from mneslam_tpu.eval import recon

ap = argparse.ArgumentParser()
ap.add_argument("--fast", action="store_true")
ap.add_argument("--bf16", action="store_true")
args = ap.parse_args()
ITERS = 25 if args.fast else 50

HALF = 2.0
cfg = make_config({
    "mapping": {"bound": [[-2.2, 2.2]] * 3, "marching_cubes_bound": [[-2.05, 2.05]] * 3,
                "sample": 2048, "min_pixels_cur": 100, "first_iters": 500,
                "iters": ITERS},
    "planes_res": {"coarse": 0.04, "fine": 0.02, "bound_dividable": 0.04},
    "cam": {"H": 340, "W": 600, "fx": 300.0, "fy": 300.0, "cx": 299.5, "cy": 169.5,
            "near": 0.0, "far": 8.0, "depth_trunc": 100.0},
    "training": {"n_range_d": 11, "n_samples_d": 8 if args.fast else 32,
                 "range_d": 0.1, "trunc": 0.1,
                 "render_dtype": "bfloat16" if args.bf16 else "float32"},
    "model": {"c_dim": 32, "input_ch": 64, "input_ch_pos": 48, "truncation": 0.1},
    "meshing": {"resolution": 0.02},
})
ds = SyntheticBoxDataset(cfg, num_frames=120, half=HALF)
scene = SceneRep(cfg)
mapper = Mapper(cfg, scene, num_kf=61, rays_per_kf=ds.num_rays_to_save)
state = mapper.init_state(jax.random.PRNGKey(0))

f0 = {k: jnp.asarray(v) for k, v in ds[0].items()}
t_first = time.perf_counter()
state, m = mapper.first_frame_mapping(state, f0, jnp.asarray(ds[0]["c2w"]), jax.random.PRNGKey(1))
jax.block_until_ready(state.params)
t_first = time.perf_counter() - t_first

t_map = time.perf_counter()
n_kf = 0
for fid in range(2, 120, 2):
    it = ds[fid]
    fr = {k: jnp.asarray(v) for k, v in it.items()}
    k = jax.random.fold_in(jax.random.PRNGKey(2), fid)
    state = mapper.add_keyframe(state, jnp.asarray(fid), fr, jnp.asarray(it["c2w"]), k)
    state, m = mapper.optimize(state, fr, jnp.asarray(it["c2w"]), jax.random.fold_in(k, 1), iters=ITERS)
    n_kf += 1
jax.block_until_ready(state.params)
t_map = time.perf_counter() - t_map

# held-out odd frames
psnrs, l1s = [], []
for fid in (31, 61, 91):
    it = ds[fid]
    ro, rd = rays_from_pose(jnp.asarray(it["direction"]).reshape(-1, 3), jnp.asarray(it["c2w"]))
    depth, rgb = scene.render_image_rays(state.params, ro, rd,
                                         jnp.asarray(it["depth"]).reshape(-1), chunk=8192)
    mse = float(np.mean(np.square(np.asarray(rgb) - it["rgb"].reshape(-1, 3))))
    psnrs.append(-10 * np.log10(mse))
    l1s.append(float(np.mean(np.abs(np.asarray(depth) - it["depth"].reshape(-1)))) * 100)

t_mesh = time.perf_counter()
verts, faces, colors = extract_mesh(scene, state.params, cfg, save_path=None)
t_mesh = time.perf_counter() - t_mesh

# mesh accuracy vs analytic box: distance of each vertex to the box surface
a = np.abs(verts)
d_face = HALF - np.max(a, axis=1)           # distance to nearest wall plane
acc_cm = float(np.mean(np.abs(d_face))) * 100

print(json.dumps({
    "keyframes": n_kf + 1, "fast": args.fast, "bf16": args.bf16,
    "first_frame_s": round(t_first, 1),
    "map_s_per_kf": round(t_map / n_kf, 2),
    "map_kf_hz": round(n_kf / t_map, 3),
    "map_iters_per_s": round(ITERS * n_kf / t_map, 1),
    "novel_view_psnr_db": round(float(np.mean(psnrs)), 2),
    "novel_view_depth_l1_cm": round(float(np.mean(l1s)), 2),
    "mesh_verts": len(verts),
    "mesh_wall_accuracy_cm": round(acc_cm, 2),
    "mesh_extract_s": round(t_mesh, 1),
}))
