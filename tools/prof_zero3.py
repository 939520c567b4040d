"""Round-4 follow-up probes for the row-sharded mapping step (real chip).

prof_zero2 showed the raw-AG + FULL local pack forward costs 6.86 ms/iter
vs round 3's 1.40 — the full-size pack's lane-dim concat of computed
pieces is the measured CLAUDE.md trap (~5 ms at full tables). This tool
decides the remaining design choices by direct measurement:

  F1  fwd, r3-style: pack the LOCAL row block (lane concat at rows/8),
      concat with pre-packed rest (all-gather write stand-in, packed
      payload) -> render        [expect ~1.4 — reproduces prof_zero]
  F2  fwd, raw-AG + full flat pack (prof_zero2 shipped)   [~6.9, control]
  F3  fwd, raw-AG + full hwc pack (reshape + 2D concats, no masks)
  S1  scatter 6 x [N,128] separate (shipped)              [~2.9, control]
  S2  scatter ONE [6N,128] into a combined [sum Rp, 128] table
      (fixed per-scatter overhead x6 -> x1; index remap is ~6N int ops)
  S3  scatter 2 x [3N,128] (orientation-merged by level)
  Z1  full step, r3-style pack + packed-RS stand-in + block fold
      (the round-4 production candidate)

Protocol: CLAUDE.md direct timing (K-iter fori_loop -> scalar, median of
5 fetch-synced walls / K).

Usage: python tools/prof_zero3.py [n_shards] [--bf16]
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
    print(f"{name:56s} {per:8.2f} ms/iter", flush=True)
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

    shapes = [tuple(pl.shape) for name in ("xy", "xz", "yz")
              for pl in st.params["planes"][name]]
    print(f"device={jax.devices()[0]}  K={K}  shards={n_shards}  "
          f"rays={n_global}+{n_cur}  dtype={jnp.dtype(cdt).name}", flush=True)
    results = {"n_shards": n_shards, "bf16": bf16}

    def pad_h(h):
        return (h + n_shards - 1) // n_shards * n_shards

    # ---------------- shared ray/render plumbing ----------------------
    def rays_and_targets(db, kf_poses, key):
        k_db, k_cur, k_render = jax.random.split(key, 3)
        g_rays, slot_ids = kf_lib.sample_global_rays(db, k_db, n_global)
        g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3], kf_poses[slot_ids])
        idx = jax.random.randint(k_cur, (n_cur,), 0, H * W)
        c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], c2w)
        rays_o = jnp.concatenate([g_o, c_o], axis=0)
        rays_d = jnp.concatenate([g_d, c_d], axis=0)
        t_rgb = jnp.concatenate([g_rays[:, 3:6], rgb_flat[idx]], axis=0)
        t_d = jnp.concatenate([g_rays[:, 6], d_flat[idx]], axis=0)[:, None]
        return rays_o, rays_d, t_rgb, t_d, k_render

    def render_loss(planes_packed, decoder, db, kf_poses, key):
        params = {"planes": planes_packed, "decoder": decoder}
        ro, rd, t_rgb, t_d, k_render = rays_and_targets(db, kf_poses, key)
        ret = scene.forward(params, ro, rd, t_rgb, t_d, key=k_render)
        return scene.get_loss_from_ret(ret)

    # ---------------- F1/Z1: r3-style sharded pack --------------------
    # local CHW shard [C, Hp/8, W] + pre-packed rest rows; pack local,
    # concat packed (AG write stand-in).
    p_chw = {"planes": {}, "decoder": st.params["decoder"]}
    rest_packed = {}
    for name in ("xy", "xz", "yz"):
        p_chw["planes"][name] = []
        rest_packed[name] = []
        for pl in st.params["planes"][name]:
            C, Hh, Ww = pl.shape
            hloc = pad_h(Hh) // n_shards
            p_chw["planes"][name].append(pl[:, :hloc])
            rest_packed[name].append(
                interp.pack_corners(pl.astype(cdt))[hloc * Ww:])
    p_chw = jax.tree.map(jnp.asarray, p_chw)
    rest_packed = jax.tree.map(jnp.asarray, rest_packed)
    true_shapes = {name: [tuple(pl.shape) for pl in st.params["planes"][name]]
                   for name in ("xy", "xz", "yz")}

    def fold_block_cost(d_blk, Cc, Hh, Ww):
        B = d_blk.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        y, xx = r // Ww, r % Ww
        zdt = d_blk.dtype
        d00, d01, d10, d11 = (d_blk[:, i * Cc:(i + 1) * Cc] for i in range(4))

        def sbx(b):
            down = jnp.concatenate([jnp.zeros_like(b[:1]), b[:-1]], axis=0)
            return jnp.where(xx > 0, down, jnp.zeros((), zdt)) + \
                jnp.where(xx == Ww - 1, b, jnp.zeros((), zdt))

        b = d10 + sbx(d11)
        sby_b = jnp.concatenate([jnp.zeros((Ww, Cc), zdt), b[:-Ww]], axis=0) + \
            jnp.where(y == Hh - 1, b, jnp.zeros((), zdt))
        out = d00 + sbx(d01) + sby_b
        return jnp.where(y < Hh, out, jnp.zeros((), zdt))

    def make_seam_r3(true_shape):
        """rest is a traced ARGUMENT (not a closure constant — 270 MB of
        closed-over packed rows overflow the remote compiler's request
        limit, HTTP 413). Its zero cotangent is DCE'd by XLA."""
        C, Hh, Ww = true_shape
        R = Hh * Ww
        hloc = pad_h(Hh) // n_shards
        B = hloc * Ww

        @jax.custom_vjp
        def f(x, rest):  # x [C, hloc, W] local chw shard
            pk_local = interp.pack_corners(x.astype(cdt))   # [B, 4C] (1/8 lane concat)
            return jnp.concatenate([pk_local, rest], axis=0)[:R]

        def fwd(x, rest):
            return f(x, rest), None

        def bwd(_, d):
            blk = d[:B]                                     # RS local bound
            da = fold_block_cost(blk, C, min(Hh, hloc), Ww)  # block fold
            dx = jnp.transpose(da.reshape(hloc, Ww, C), (2, 0, 1)).astype(
                jnp.float32)
            return dx, jnp.zeros((R - B, 4 * C), cdt)

        f.defvjp(fwd, bwd)
        return f

    seams_r3 = {name: [make_seam_r3(true_shapes[name][lvl])
                       for lvl in range(2)] for name in ("xy", "xz", "yz")}

    def packed_r3(p, rest):
        return {name: [interp.PackedPlane(
            seams_r3[name][lvl](loc, rest[name][lvl]),
            true_shapes[name][lvl])
            for lvl, loc in enumerate(p["planes"][name])]
            for name in ("xy", "xz", "yz")}

    @jax.jit
    def f1(p, rest, db, kf_poses, key):
        def body(i, acc):
            return acc + render_loss(packed_r3(p, rest), p["decoder"], db,
                                     kf_poses, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["f1_fwd_sharded_pack"] = timed(
        "F1 fwd: sharded pack + packed-AG standin", f1, p_chw, rest_packed,
        st.db, st.kf_poses, jax.random.PRNGKey(0))

    @jax.jit
    def z1(p, s, rest, db, kf_poses, key):
        def body(i, c):
            p, s = c
            kk = jax.random.fold_in(key, i)
            _, g = jax.value_and_grad(
                lambda pp: render_loss(packed_r3(pp, rest), pp["decoder"],
                                       db, kf_poses, kk))(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s
        p, s = jax.lax.fori_loop(0, K, body, (p, s))
        return p["planes"]["xy"][1][0, 0, 0]

    results["z1_full_r3pack_blockfold"] = timed(
        "Z1 full step: sharded pack + packed-RS + block fold", z1, p_chw,
        opt.init(p_chw), rest_packed, st.db, st.kf_poses,
        jax.random.PRNGKey(0))

    # ---------------- F3: raw-AG + hwc pack (no masks) -----------------
    def pack_hwc_from_flat(flat, Hh, Ww):
        hwc = flat.reshape(Hh, Ww, -1)
        sx = jnp.concatenate([hwc[:, 1:], hwc[:, -1:]], axis=1)
        sy = jnp.concatenate([hwc[1:], hwc[-1:]], axis=0)
        sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
        return jnp.concatenate([hwc, sx, sy, sxy], axis=-1).reshape(
            Hh * Ww, -1)

    p_flat = {"planes": {}, "decoder": st.params["decoder"]}
    rest_raw = {}
    for name in ("xy", "xz", "yz"):
        p_flat["planes"][name] = []
        rest_raw[name] = []
        for pl in st.params["planes"][name]:
            C, Hh, Ww = pl.shape
            flat = jnp.transpose(pl, (1, 2, 0)).reshape(Hh * Ww, C)
            Rp = pad_h(Hh) * Ww
            if Rp > Hh * Ww:
                flat = jnp.pad(flat, ((0, Rp - Hh * Ww), (0, 0)))
            B = Rp // n_shards
            p_flat["planes"][name].append(flat[:B])
            rest_raw[name].append(flat[B:].astype(cdt))
    p_flat = jax.tree.map(jnp.asarray, p_flat)
    rest_raw = jax.tree.map(jnp.asarray, rest_raw)

    def packed_hwc(p):
        out = {}
        for name in ("xy", "xz", "yz"):
            out[name] = []
            for lvl, loc in enumerate(p["planes"][name]):
                C, Hh, Ww = true_shapes[name][lvl]
                xg = jnp.concatenate([loc.astype(cdt), rest_raw[name][lvl]],
                                     axis=0)[:Hh * Ww]
                out[name].append(interp.PackedPlane(
                    pack_hwc_from_flat(xg, Hh, Ww), true_shapes[name][lvl]))
        return out

    @jax.jit
    def f3(p, db, kf_poses, key):
        def body(i, acc):
            return acc + render_loss(packed_hwc(p), p["decoder"], db,
                                     kf_poses, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["f3_fwd_raw_ag_hwc_pack"] = timed(
        "F3 fwd: raw-AG standin + full hwc pack", f3, p_flat, st.db,
        st.kf_poses, jax.random.PRNGKey(0))

    # ---------------- scatter candidates ------------------------------
    rng = np.random.default_rng(0)
    N_pts = (n_global + n_cur) * 43
    sdt = cdt
    cot = jnp.asarray(rng.standard_normal((N_pts, 128)), dtype=sdt)

    def scatter_sep(shapes_):
        idxs = [jnp.asarray(rng.integers(0, h * w, N_pts))
                for (c, h, w) in shapes_]

        @jax.jit
        def f(cot):
            def body(i, acc):
                cc = cot * (1.0 + 1e-6 * i)
                for (c, h, w), idx in zip(shapes_, idxs):
                    d = jnp.zeros((h * w, 128), sdt).at[idx].add(cc)
                    acc = acc + d[0, 0].astype(jnp.float32)
                return acc
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f

    results["s1_scatter_6sep"] = timed(
        f"S1 scatter 6 x [{N_pts},128] separate", scatter_sep(shapes), cot)

    total_rows = sum(h * w for (c, h, w) in shapes)
    offs = np.cumsum([0] + [h * w for (c, h, w) in shapes])[:-1]
    idx_comb = jnp.asarray(np.concatenate(
        [rng.integers(0, h * w, N_pts) + o
         for (c, h, w), o in zip(shapes, offs)]))
    cot6 = jnp.asarray(rng.standard_normal((6 * N_pts, 128)), dtype=sdt)

    @jax.jit
    def s2(cot6):
        def body(i, acc):
            d = jnp.zeros((total_rows, 128), sdt).at[idx_comb].add(
                cot6 * (1.0 + 1e-6 * i))
            return acc + d[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["s2_scatter_combined"] = timed(
        f"S2 scatter 1 x [{6*N_pts},128] into [{total_rows},128]", s2, cot6)

    # S3: two scatters of 3N rows (the three orientations share a level)
    for half, tag in ((shapes[0::2], "coarse3"), (shapes[1::2], "fine3")):
        rows = sum(h * w for (c, h, w) in half)
        off = np.cumsum([0] + [h * w for (c, h, w) in half])[:-1]
        idx3 = jnp.asarray(np.concatenate(
            [rng.integers(0, h * w, N_pts) + o
             for (c, h, w), o in zip(half, off)]))
        cot3 = jnp.asarray(rng.standard_normal((3 * N_pts, 128)), dtype=sdt)

        @jax.jit
        def s3(cot3, idx3=idx3, rows=rows):
            def body(i, acc):
                d = jnp.zeros((rows, 128), sdt).at[idx3].add(
                    cot3 * (1.0 + 1e-6 * i))
                return acc + d[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, K, body, 0.0)

        results[f"s3_scatter_{tag}"] = timed(
            f"S3 scatter 1 x [{3*N_pts},128] into [{rows},128] ({tag})",
            s3, cot3)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
