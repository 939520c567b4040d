"""Attribute the row-sharded step's backward cost (round 4, real chip).

prof_zero2 (hwc pack) measured fwd 1.12 but full step 8.75 ms/iter —
~4.5 ms more than the sum of the known parts (scatter 2.78 + block fold
1.02 + adam). This tool bisects the seam's backward by swapping its body:

  A  bwd = zeros block directly (no pad, no slice, no fold)
  B  bwd = pad + block slice only (no fold)
  C  bwd = pad + slice + block fold          [shipped in prof_zero2]
  D  padded-table variant: the seam packs the PADDED hwc grid, the
     sampler's scatter emits [Rp, 4C] directly (no pad copy), bwd =
     slice + block fold. Pad rows carry zero weight in sampling (wy = 0
     at the y = H-1 clamp), so forward and gradient are exact.

Protocol: CLAUDE.md direct timing (K-iter fori_loop -> scalar, median of
5 fetch-synced walls / K).

Usage: python tools/prof_zero4.py [n_shards] [--bf16]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

K = 40
N_WALL = 5


def timed(name, fn, *args):
    float(np.asarray(fn(*args)).ravel()[0])
    walls = []
    for _ in range(N_WALL):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        walls.append(time.perf_counter() - t0)
    per = float(np.median(walls)) / K * 1e3
    print(f"{name:52s} {per:8.2f} ms/iter", flush=True)
    return per


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf16 = "--bf16" in sys.argv
    n_shards = int(argv[0]) if argv else 8
    n_global, n_cur = 2048 // n_shards, 104 // n_shards

    from mneslam_tpu.config import make_config
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping import keyframe as kf_lib
    from mneslam_tpu.mapping.mapper import Mapper, make_optimizer
    from mneslam_tpu.models.scene_rep import SceneRep
    from mneslam_tpu.ops import interp

    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": n_global, "min_pixels_cur": n_cur, "iters": 50},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1,
                     "render_dtype": "bfloat16" if bf16 else "float32"},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=bound * 0.9)
    mapper = Mapper(cfg, scene, num_kf=8, rays_per_kf=ds.num_rays_to_save)
    st = mapper.init_state(jax.random.PRNGKey(2))
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    c2w = jnp.asarray(ds[0]["c2w"])
    st = mapper.add_keyframe(st, jnp.asarray(0), frame, c2w, jax.random.PRNGKey(3))
    opt = make_optimizer(cfg)
    dir_flat = frame["direction"].reshape(-1, 3)
    rgb_flat = frame["rgb"].reshape(-1, 3)
    d_flat = frame["depth"].reshape(-1)
    cdt = scene.compute_dtype

    print(f"device={jax.devices()[0]}  K={K}  shards={n_shards}  "
          f"rays={n_global}+{n_cur}  dtype={jnp.dtype(cdt).name}", flush=True)
    results = {"n_shards": n_shards, "bf16": bf16}

    def pad_h(h):
        return (h + n_shards - 1) // n_shards * n_shards

    p_local = {"planes": {}, "decoder": st.params["decoder"]}
    rest_raw = {}
    for name in ("xy", "xz", "yz"):
        p_local["planes"][name] = []
        rest_raw[name] = []
        for pl in st.params["planes"][name]:
            C, Hh, Ww = pl.shape
            flat = jnp.transpose(pl, (1, 2, 0)).reshape(Hh * Ww, C)
            Rp = pad_h(Hh) * Ww
            if Rp > Hh * Ww:
                flat = jnp.pad(flat, ((0, Rp - Hh * Ww), (0, 0)))
            B = Rp // n_shards
            p_local["planes"][name].append(flat[:B])
            rest_raw[name].append(flat[B:].astype(cdt))
    p_local = jax.tree.map(jnp.asarray, p_local)
    rest_raw = jax.tree.map(jnp.asarray, rest_raw)
    true_shapes = {name: [tuple(pl.shape) for pl in st.params["planes"][name]]
                   for name in ("xy", "xz", "yz")}

    def make_seam(true_shape, rest, variant):
        C, Hh, Ww = true_shape
        R, Rp = Hh * Ww, pad_h(Hh) * Ww
        Hp = Rp // Ww
        B = Rp // n_shards

        @jax.custom_vjp
        def f(x):
            xg = jnp.concatenate([x.astype(cdt), rest], axis=0)
            if variant == "D":
                return interp.pack_corners_hwc(xg.reshape(Hp, Ww, C))
            return interp.pack_corners_hwc(xg[:R].reshape(Hh, Ww, C))

        def fwd(x):
            return f(x), None

        def bwd(_, d):
            if variant == "A":
                return (jnp.zeros((B, C), jnp.float32) + d[0, 0],)
            if variant == "D":
                blk = d[:B]
                return (interp.fold_corners_rows(blk, Hh, Ww, y0=0,
                                                 halo_row=None)
                        .astype(jnp.float32),)
            if Rp > R:
                d = jnp.pad(d, ((0, Rp - R), (0, 0)))
            blk = d[:B]
            if variant == "B":
                return (blk[:, :C].astype(jnp.float32),)
            return (interp.fold_corners_rows(blk, Hh, Ww, y0=0,
                                             halo_row=None)
                    .astype(jnp.float32),)

        f.defvjp(fwd, bwd)
        return f

    def run_variant(tag):
        seams = {name: [make_seam(true_shapes[name][lvl],
                                  rest_raw[name][lvl], tag)
                        for lvl in range(2)] for name in ("xy", "xz", "yz")}

        def loss_local(p, db, kf_poses, key):
            planes_packed = {
                name: [interp.PackedPlane(seams[name][lvl](loc),
                                          true_shapes[name][lvl])
                       for lvl, loc in enumerate(p["planes"][name])]
                for name in ("xy", "xz", "yz")}
            params = {"planes": planes_packed, "decoder": p["decoder"]}
            k_db, k_cur, k_render = jax.random.split(key, 3)
            g_rays, slot_ids = kf_lib.sample_global_rays(db, k_db, n_global)
            g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3],
                                               kf_poses[slot_ids])
            idx = jax.random.randint(k_cur, (n_cur,), 0, H * W)
            c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], c2w)
            rays_o = jnp.concatenate([g_o, c_o], axis=0)
            rays_d = jnp.concatenate([g_d, c_d], axis=0)
            t_rgb = jnp.concatenate([g_rays[:, 3:6], rgb_flat[idx]], axis=0)
            t_d = jnp.concatenate([g_rays[:, 6], d_flat[idx]], axis=0)[:, None]
            ret = scene.forward(params, rays_o, rays_d, t_rgb, t_d,
                                key=k_render)
            return scene.get_loss_from_ret(ret)

        @jax.jit
        def full(p, s, db, kf_poses, key):
            def body(i, c):
                p, s = c
                kk = jax.random.fold_in(key, i)
                _, g = jax.value_and_grad(loss_local)(p, db, kf_poses, kk)
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s
            p, s = jax.lax.fori_loop(0, K, body, (p, s))
            return p["planes"]["xy"][1][0, 0]

        return timed(f"full step, seam-bwd variant {tag}", full, p_local,
                     opt.init(p_local), st.db, st.kf_poses,
                     jax.random.PRNGKey(0))

    for tag in ("A", "B", "C", "D"):
        results[f"variant_{tag}"] = run_variant(tag)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
