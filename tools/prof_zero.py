"""Per-device cost of the ROW-SHARDED (ZeRO-style) mapping step (round 3).

prof_mapping18 showed the plain ray-sharded per-device step costs 9.40
ms/iter at rays/8 because the backward's table-sized terms (packed-
cotangent zeros/materialization + `_unpack_corners_adjoint` fold + Adam)
don't shrink with the ray count. `Mapper(shard_plane_rows=True)` shards
those terms over table rows: packed tables all-gather forward, packed
cotangents reduce-scatter backward, fold+Adam run on rows/8
(parallel/mesh.gather_table_rows).

This tool measures the PER-DEVICE program of that step on one chip:
  * pack runs on the local [C, H/8, W] shard,
  * the all_gather is mimicked by concatenating the local pack with a
    passed-in [7/8 HW, 4C] rest-table (same full-table HBM write),
  * the scatter targets the full table (real, per-device),
  * the reduce_scatter is mimicked by its LOCAL-compute lower bound (the
    slice the transpose of the concat produces; ICI is estimated
    separately), and the fold + Adam run on the local shard only.
Also decomposes the old per-device plane-grad path (zeros+scatter vs
fold) to show what row sharding can and cannot shrink.

Protocol: CLAUDE.md direct timing only (K-iter jitted fori_loop chain ->
scalar, median of 5 fetch-synced walls / K).

Usage: python tools/prof_zero.py [n_shards] [--bf16]   (default 8)
`--bf16`: training.render_dtype bfloat16 — planes cast BEFORE pack as the
mapper does, so the gathered tables, scatter, and sharded fold all run
(and would collectively move) half the bytes.
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
    print(f"{name:44s} {per:8.2f} ms/iter", flush=True)
    return per


def main():
    argv = [a for a in sys.argv[1:] if a != "--bf16"]
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

    shapes = [pl.shape for name in ("xy", "xz", "yz")
              for pl in st.params["planes"][name]]
    tbl_bytes = sum(s[1] * s[2] * 4 * s[0] * 4 for s in shapes)
    print(f"device={jax.devices()[0]}  K={K}  shards={n_shards}  "
          f"rays={n_global}+{n_cur}  packed tables={tbl_bytes/1e6:.0f} MB",
          flush=True)
    results = {"n_shards": n_shards, "packed_mb": tbl_bytes / 1e6}

    # ---- local-shard params (rows/n_shards of each plane) + rest tables --
    cdt = scene.compute_dtype

    def split_local(params):
        local, rest = {"planes": {}, "decoder": params["decoder"]}, {}
        for name in ("xy", "xz", "yz"):
            local["planes"][name] = []
            rest[name] = []
            for pl in params["planes"][name]:
                C, Hp, Wp = pl.shape
                hloc = Hp // n_shards
                local["planes"][name].append(pl[:, :hloc])
                rest[name].append(
                    interp.pack_corners(pl.astype(cdt))[hloc * Wp:])
        return local, rest

    p_local, rest_tables = split_local(st.params)
    p_local = jax.tree.map(jnp.asarray, p_local)
    rest_tables = jax.tree.map(jnp.asarray, rest_tables)
    full_shapes = {name: [pl.shape for pl in st.params["planes"][name]]
                   for name in ("xy", "xz", "yz")}

    def loss_local(pl_params, rest, db, kf_poses, key):
        """The per-device program: local pack + concat (all_gather HBM
        write stand-in) + PackedPlane forward; its transpose is the full
        scatter + local slice + local fold."""
        planes_packed = {}
        for name in ("xy", "xz", "yz"):
            planes_packed[name] = []
            for lvl, loc in enumerate(pl_params["planes"][name]):
                full_shape = full_shapes[name][lvl]
                pk = jnp.concatenate(
                    [interp.pack_corners(loc.astype(cdt)), rest[name][lvl]],
                    axis=0)
                planes_packed[name].append(interp.PackedPlane(pk, full_shape))
        params = {"planes": planes_packed, "decoder": pl_params["decoder"]}

        k_db, k_cur, k_render = jax.random.split(key, 3)
        g_rays, slot_ids = kf_lib.sample_global_rays(db, k_db, n_global)
        g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3], kf_poses[slot_ids])
        idx = jax.random.randint(k_cur, (n_cur,), 0, H * W)
        c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], c2w)
        rays_o = jnp.concatenate([g_o, c_o], axis=0)
        rays_d = jnp.concatenate([g_d, c_d], axis=0)
        t_rgb = jnp.concatenate([g_rays[:, 3:6], rgb_flat[idx]], axis=0)
        t_d = jnp.concatenate([g_rays[:, 6], d_flat[idx]], axis=0)[:, None]
        ret = scene.forward(params, rays_o, rays_d, t_rgb, t_d, key=k_render)
        return scene.get_loss_from_ret(ret)

    @jax.jit
    def full(p, s, rest, db, kf_poses, key):
        def body(i, c):
            p, s = c
            kk = jax.random.fold_in(key, i)
            _, g = jax.value_and_grad(loss_local)(p, rest, db, kf_poses, kk)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s
        p, s = jax.lax.fori_loop(0, K, body, (p, s))
        return p["planes"]["xy"][1][0, 0, 0]

    results["zero_full"] = timed(
        "row-sharded per-device step (fwd+bwd+adam)", full, p_local,
        opt.init(p_local), rest_tables, st.db, st.kf_poses,
        jax.random.PRNGKey(0))

    @jax.jit
    def fwd(p, rest, db, kf_poses, key):
        def body(i, acc):
            return acc + loss_local(p, rest, db, kf_poses,
                                    jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["zero_fwd"] = timed("row-sharded fwd only", fwd, p_local,
                                rest_tables, st.db, st.kf_poses,
                                jax.random.PRNGKey(0))

    # ---- decomposition of the OLD per-device plane-grad path ------------
    # (zeros + scatter at rays/n vs the full-table fold): what row
    # sharding can shrink (fold, adam) vs cannot (zeros+scatter).
    N_pts = (n_global + n_cur) * 43
    rng = np.random.default_rng(0)
    cot = jnp.asarray(rng.standard_normal((N_pts, 128), np.float32))

    def make_scatter_only(shapes):
        idxs = [jnp.asarray(rng.integers(0, s[1] * s[2], N_pts)) for s in shapes]

        @jax.jit
        def f(cot):
            def body(i, acc):
                c = cot * (1.0 + 1e-6 * i)
                for s, idx in zip(shapes, idxs):
                    d = jnp.zeros((s[1] * s[2], 4 * s[0]), jnp.float32)
                    d = d.at[idx].add(c)
                    acc = acc + d[0, 0]
                return acc
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f

    results["scatter_only"] = timed(
        f"zeros+scatter only, 6 planes @ {N_pts} rows",
        make_scatter_only(shapes), cot)

    def make_fold(shapes, frac):
        tabs = [jnp.asarray(rng.standard_normal(
            ((s[1] // frac) * s[2], 4 * s[0]), np.float32)) for s in shapes]

        @jax.jit
        def f(tabs):
            def body(i, acc):
                for s, t in zip(shapes, tabs):
                    d = interp._unpack_corners_adjoint(
                        t * (1.0 + 1e-6 * i), s[0], s[1] // frac, s[2])
                    acc = acc + d[0, 0, 0]
                return acc
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f

    results["fold_full"] = timed("fold (unpack adjoint), full tables",
                                 make_fold(shapes, 1),
                                 [jnp.asarray(rng.standard_normal(
                                     (s[1] * s[2], 4 * s[0]), np.float32))
                                  for s in shapes])
    results["fold_shard"] = timed(
        f"fold, rows/{n_shards}", make_fold(shapes, n_shards),
        [jnp.asarray(rng.standard_normal(
            ((s[1] // n_shards) * s[2], 4 * s[0]), np.float32))
         for s in shapes])

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
