"""Bisect prof_zero (3.79 ms/iter) vs prof_zero4 (8.45 even with a no-op
seam backward): the two harnesses measure the same per-device row-sharded
program but differ in seam structure. One structural change at a time:

  V0  prof_zero structure: pack LOCAL raw shard per iter, concat with a
      PACKED rest table, plain AD (bwd = slice + pack transpose at
      rows/8).                                      [expect ~3.8]
  V1  V0 wrapped in a custom_vjp whose bwd does the same slice +
      fold_corners_rows at rows/8 — isolates custom-VJP cotangent
      materialization.
  V2  full pack per iter: concat RAW local + RAW rest, pack at FULL size
      inside a custom_vjp (bwd = slice + block fold) — the prof_zero4
      variant-C structure, i.e. the production seam's per-device program.
  V3  V2 with bwd = zeros (prof_zero4 variant A).

NOTE (round 4): prof_zero4 CLOSED OVER its rest tables; with all variants
in one process the constants exceeded the remote compiler's request-body
limit (HTTP 413), and embedded-constant handling is itself a suspect for
prof_zero4's anomalous numbers. Here every rest table is a jit ARGUMENT.

Also: scatter scaling for the routed-gradient-exchange design —
zeros+scatter of the per-device point count into full tables vs 1/8-row
local blocks (with the all-to-all's padded update count), plus the
routing sort/permute cost.

Protocol: CLAUDE.md direct timing (K-iter fori_loop -> scalar, median of
5 fetch-synced walls / K).

Usage: python tools/prof_zero5.py [n_shards] [--bf16]
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


def make_seam(variant, ts, hloc, cdt):
    """Per-plane 'collective seam': (local [C, hloc, W], rest) -> full
    packed table, per the structural variant under test. rest is a traced
    argument (packed rows for V0/V1, raw rows for V2/V3)."""
    from mneslam_tpu.ops import interp

    C, Hh, Ww = ts
    B = hloc * Ww

    if variant == "V0":
        def seam(loc, rest):
            return jnp.concatenate(
                [interp.pack_corners(loc.astype(cdt)), rest], axis=0)
        return seam

    if variant == "V1":
        @jax.custom_vjp
        def f(loc, rest):
            return jnp.concatenate(
                [interp.pack_corners(loc.astype(cdt)), rest], axis=0)

        def fwd(loc, rest):
            return f(loc, rest), None

        def bwd(_, d):
            blk = d[:B]
            out = interp.fold_corners_rows(blk, Hh, Ww, y0=0, halo_row=None)
            return (jnp.transpose(out.reshape(hloc, Ww, C), (2, 0, 1))
                    .astype(jnp.float32),
                    jnp.zeros((Hh * Ww - B, 4 * C), cdt))

        f.defvjp(fwd, bwd)
        return f

    # V2 / V3: raw concat + full pack inside custom_vjp
    @jax.custom_vjp
    def f(loc, rest):
        raw = jnp.transpose(loc.astype(cdt), (1, 2, 0)).reshape(B, C)
        xg = jnp.concatenate([raw, rest], axis=0)
        return interp.pack_corners_hwc(xg.reshape(Hh, Ww, C))

    def fwd(loc, rest):
        return f(loc, rest), None

    if variant == "V3":
        def bwd(_, d):
            out = jnp.zeros((C, hloc, Ww), jnp.float32) + d[0, 0]
            return out, jnp.zeros((Hh * Ww - B, C), cdt)
    else:
        def bwd(_, d):
            blk = d[:B]
            out = interp.fold_corners_rows(blk, Hh, Ww, y0=0, halo_row=None)
            return (jnp.transpose(out.reshape(hloc, Ww, C), (2, 0, 1))
                    .astype(jnp.float32),
                    jnp.zeros((Hh * Ww - B, C), cdt))

    f.defvjp(fwd, bwd)
    return f


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

    # local shard (leading ~H/n rows as [C, hloc, W]) + both rest forms.
    # floor split (prof_zero convention): the local block is slightly
    # under 1/n — the timing target is the local work's scale.
    p_local = {"planes": {}, "decoder": st.params["decoder"]}
    rest_packed, rest_raw, true_shapes, hlocs = {}, {}, {}, {}
    for name in ("xy", "xz", "yz"):
        p_local["planes"][name] = []
        rest_packed[name], rest_raw[name] = [], []
        true_shapes[name], hlocs[name] = [], []
        for pl in st.params["planes"][name]:
            C, Hh, Ww = pl.shape
            hloc = Hh // n_shards
            p_local["planes"][name].append(pl[:, :hloc])
            rest_packed[name].append(
                interp.pack_corners(pl.astype(cdt))[hloc * Ww:])
            rest_raw[name].append(jnp.transpose(pl, (1, 2, 0))
                                  .reshape(Hh * Ww, C)[hloc * Ww:].astype(cdt))
            true_shapes[name].append((C, Hh, Ww))
            hlocs[name].append(hloc)
    p_local = jax.tree.map(jnp.asarray, p_local)
    rest_packed = jax.tree.map(jnp.asarray, rest_packed)
    rest_raw = jax.tree.map(jnp.asarray, rest_raw)

    def run_variant(tag):
        rest_tree = rest_packed if tag in ("V0", "V1") else rest_raw
        seams = {name: [make_seam(tag, true_shapes[name][lvl],
                                  hlocs[name][lvl], cdt)
                        for lvl in range(2)] for name in ("xy", "xz", "yz")}

        def loss_local(p, rest, db, kf_poses, key):
            planes_packed = {
                name: [interp.PackedPlane(
                    seams[name][lvl](loc, rest[name][lvl]),
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
        def full(p, s, rest, db, kf_poses, key):
            def body(i, c):
                p, s = c
                kk = jax.random.fold_in(key, i)
                _, g = jax.value_and_grad(loss_local)(p, rest, db, kf_poses,
                                                      kk)
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s
            p, s = jax.lax.fori_loop(0, K, body, (p, s))
            return p["planes"]["xy"][1][0, 0, 0]

        return timed(f"full step, seam {tag}", full, p_local,
                     opt.init(p_local), rest_tree, st.db, st.kf_poses,
                     jax.random.PRNGKey(0))

    for tag in ("V0", "V1", "V2", "V3"):
        results[tag] = run_variant(tag)

    # ---- scatter scaling for the routed-exchange design ------------------
    N_pts = (n_global + n_cur) * 43
    rng = np.random.default_rng(0)
    shapes = [true_shapes[name][lvl] for name in ("xy", "xz", "yz")
              for lvl in range(2)]
    cot = jnp.asarray(rng.standard_normal((N_pts, 128), np.float32))

    def scatter_full(cot):
        def body(i, acc):
            c = cot * (1.0 + 1e-6 * i)
            for (C, Hh, Ww) in shapes:
                idx = jax.random.randint(jax.random.fold_in(
                    jax.random.PRNGKey(1), i), (N_pts,), 0, Hh * Ww)
                d = jnp.zeros((Hh * Ww, 4 * C), jnp.float32).at[idx].add(c)
                acc = acc + d[0, 0]
            return acc
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["scatter_full_tables"] = timed(
        f"zeros+scatter {N_pts} rows -> FULL tables x6",
        jax.jit(scatter_full), cot)

    # post-all-to-all local scatter: n_shards * CAP padded updates into the
    # 1/8-row local block (CAP = 2x the mean per-destination count)
    CAP = int(np.ceil(N_pts / n_shards * 2))
    cot_rt = jnp.asarray(
        rng.standard_normal((n_shards * CAP, 128), np.float32))

    def scatter_local(cot):
        def body(i, acc):
            c = cot * (1.0 + 1e-6 * i)
            for (C, Hh, Ww) in shapes:
                B = (Hh // n_shards) * Ww
                idx = jax.random.randint(jax.random.fold_in(
                    jax.random.PRNGKey(2), i), (n_shards * CAP,), 0, B)
                d = jnp.zeros((B, 4 * C), jnp.float32).at[idx].add(c)
                acc = acc + d[0, 0]
            return acc
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["scatter_local_blocks"] = timed(
        f"zeros+scatter {n_shards * CAP} padded rows -> 1/{n_shards} blocks x6",
        jax.jit(scatter_local), cot_rt)

    # routing cost: per plane, sort point rows by destination shard and
    # permute the payload (the all-to-all send-side prep)
    def route(cot):
        def body(i, acc):
            c = cot * (1.0 + 1e-6 * i)
            for (C, Hh, Ww) in shapes:
                idx = jax.random.randint(jax.random.fold_in(
                    jax.random.PRNGKey(3), i), (N_pts,), 0, Hh * Ww)
                dest = idx // ((Hh // n_shards) * Ww)
                order = jnp.argsort(dest)
                acc = acc + c[order][0, 0] + idx[order][0]
            return acc
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["routing_sort_permute"] = timed(
        f"argsort+permute {N_pts} x [128] payload x6", jax.jit(route), cot)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
