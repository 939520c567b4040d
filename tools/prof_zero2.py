"""Per-device cost of the ROW-SHARDED mapping step, round-4 FINAL design
(shard_map + explicit collectives: raw-rows all-gather -> local hwc pack
forward; reduce-scatter -> row-local hwc fold backward; see
parallel/mesh.make_row_sharded_pack and Mapper._optimize_row_sharded).

History: the first round-4 candidate packed/folded via flat row shifts
with iota-mask selects — measured 6.86 ms/iter fwd vs 1.12 for the 2D
slice-concat (hwc) form at identical payloads (the selects materialize
every shifted piece; see prof_zero3 F2/F3 and BASELINE.md round 4). This
tool now measures the production (hwc) form.

Measures the PER-DEVICE program of that step on one chip, mirroring
tools/prof_zero.py's round-3 conventions so numbers are comparable:
  * the all_gather is mimicked by concatenating the local cast block with
    a passed-in rest-table (same full-size HBM write the gather performs;
    the ICI time is estimated separately from payload sizes) — but the
    payload is now the RAW rows (C lanes), 4x less than round 3's packed
    gather,
  * the pack runs at FULL size locally (pack_corners_hwc — 2D
    slice-concats on the reshaped gather output),
  * the backward's scatter targets the full packed table (real, per
    device),
  * the reduce_scatter is mimicked by its local-compute lower bound (the
    block slice), and the fold runs per `--fold`:
      after  (default): block fold at rows/N (+ zero-halo stand-in)
      before: full-size flat fold, then the raw reduce-scatter's slice
  * Adam runs on the local plane blocks + full decoder.

Also isolates: full-size flat pack, full-size flat fold, block fold, and
the merged-level scatter candidate (3 x [N,256] into fine-size tables vs
6 x [N,128] mixed — the prof_scatter6 W2 shape at per-device ray counts).

Protocol: CLAUDE.md direct timing only (K-iter jitted fori_loop chain ->
scalar, median of 5 fetch-synced walls / K).

Usage: python tools/prof_zero2.py [n_shards] [--bf16] [--fold=before]
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
    print(f"{name:48s} {per:8.2f} ms/iter", flush=True)
    return per


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf16 = "--bf16" in sys.argv
    fold_mode = "before" if "--fold=before" in sys.argv else "after"
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
    csz = jnp.dtype(cdt).itemsize

    shapes = [tuple(pl.shape) for name in ("xy", "xz", "yz")
              for pl in st.params["planes"][name]]
    raw_bytes = sum(h * w * c * csz for (c, h, w) in shapes)
    packed_bytes = 4 * raw_bytes
    print(f"device={jax.devices()[0]}  K={K}  shards={n_shards}  "
          f"rays={n_global}+{n_cur}  fold={fold_mode}  dtype={jnp.dtype(cdt).name}  "
          f"raw tables={raw_bytes/1e6:.0f} MB  packed={packed_bytes/1e6:.0f} MB",
          flush=True)
    results = {"n_shards": n_shards, "fold": fold_mode, "bf16": bf16,
               "raw_mb": raw_bytes / 1e6, "packed_mb": packed_bytes / 1e6}

    # ---- per-plane flat layout: local block + rest rows (AG stand-in) ----
    def pad_h(h):
        return (h + n_shards - 1) // n_shards * n_shards

    def to_flat(pl):
        C, Hh, Ww = pl.shape
        flat = jnp.transpose(pl, (1, 2, 0)).reshape(Hh * Ww, C)
        Rp = pad_h(Hh) * Ww
        if Rp > Hh * Ww:
            flat = jnp.pad(flat, ((0, Rp - Hh * Ww), (0, 0)))
        return flat

    p_local = {"planes": {}, "decoder": st.params["decoder"]}
    rest_tables = {}
    for name in ("xy", "xz", "yz"):
        p_local["planes"][name] = []
        rest_tables[name] = []
        for pl in st.params["planes"][name]:
            flat = to_flat(pl)
            B = flat.shape[0] // n_shards
            p_local["planes"][name].append(flat[:B])
            rest_tables[name].append(flat[B:].astype(cdt))
    p_local = jax.tree.map(jnp.asarray, p_local)
    rest_tables = jax.tree.map(jnp.asarray, rest_tables)
    true_shapes = {name: [tuple(pl.shape) for pl in st.params["planes"][name]]
                   for name in ("xy", "xz", "yz")}

    def make_standin_seam(true_shape, rest):
        C, Hh, Ww = true_shape
        R, Rp = Hh * Ww, pad_h(Hh) * Ww
        B = Rp // n_shards

        @jax.custom_vjp
        def f(x):
            xg = jnp.concatenate([x.astype(cdt), rest], axis=0)  # AG write
            return interp.pack_corners_hwc(xg[:R].reshape(Hh, Ww, C))

        def fwd(x):
            return f(x), None

        def bwd(_, d):
            if Rp > R:
                d = jnp.pad(d, ((0, Rp - R), (0, 0)))
            if fold_mode == "before":
                full = interp.fold_corners_rows(d, Hh, Ww)
                out = full[:B]                       # raw RS local bound
            else:
                # packed RS local bound + block fold (zero-halo stand-in;
                # the real halo is one b-row over a tiny all-gather)
                out = interp.fold_corners_rows(d[:B], Hh, Ww, y0=0,
                                               halo_row=None)
            return (out.astype(jnp.float32),)

        f.defvjp(fwd, bwd)
        return f

    seams = {name: [make_standin_seam(true_shapes[name][lvl],
                                      rest_tables[name][lvl])
                    for lvl in range(len(true_shapes[name]))]
             for name in ("xy", "xz", "yz")}

    def loss_local(pl_params, db, kf_poses, key):
        planes_packed = {}
        for name in ("xy", "xz", "yz"):
            planes_packed[name] = [
                interp.PackedPlane(seams[name][lvl](loc), true_shapes[name][lvl])
                for lvl, loc in enumerate(pl_params["planes"][name])]
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
    def full(p, s, db, kf_poses, key):
        def body(i, c):
            p, s = c
            kk = jax.random.fold_in(key, i)
            _, g = jax.value_and_grad(loss_local)(p, db, kf_poses, kk)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s
        p, s = jax.lax.fori_loop(0, K, body, (p, s))
        return p["planes"]["xy"][1][0, 0]

    results["zero2_full"] = timed(
        f"row-sharded r4 per-device step (fold={fold_mode})", full, p_local,
        opt.init(p_local), st.db, st.kf_poses, jax.random.PRNGKey(0))

    @jax.jit
    def fwd_only(p, db, kf_poses, key):
        def body(i, acc):
            return acc + loss_local(p, db, kf_poses, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["zero2_fwd"] = timed("row-sharded r4 fwd only", fwd_only, p_local,
                                 st.db, st.kf_poses, jax.random.PRNGKey(0))

    # ---- isolated dense pieces --------------------------------------
    rng = np.random.default_rng(0)

    def make_pack_full(shapes):
        flats = [jnp.asarray(rng.standard_normal((h * w, c)),
                             dtype=cdt) for (c, h, w) in shapes]

        @jax.jit
        def f(flats):
            def body(i, acc):
                for (c, h, w), fl in zip(shapes, flats):
                    pk = interp.pack_corners_hwc(
                        (fl * (1 + 1e-6 * i)).reshape(h, w, c))
                    acc = acc + pk[0, 0].astype(jnp.float32)
                return acc
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f, flats

    f, a = make_pack_full(shapes)
    results["pack_full"] = timed("hwc pack, full tables (fwd local pack)", f, a)

    def make_fold_full(shapes):
        ds_ = [jnp.asarray(rng.standard_normal((pad_h(h) * w, 4 * c)),
                           dtype=cdt) for (c, h, w) in shapes]

        @jax.jit
        def f(ds_):
            def body(i, acc):
                for (c, h, w), d in zip(shapes, ds_):
                    out = interp.fold_corners_rows(d * (1 + 1e-6 * i), h, w)
                    acc = acc + out[0, 0].astype(jnp.float32)
                return acc
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f, ds_

    f, a = make_fold_full(shapes)
    results["fold_full_flat"] = timed("hwc fold, full tables (fold=before)", f, a)

    def make_fold_block(shapes):
        ds_ = [jnp.asarray(rng.standard_normal((pad_h(h) * w // n_shards, 4 * c)),
                           dtype=cdt) for (c, h, w) in shapes]

        @jax.jit
        def f(ds_):
            def body(i, acc):
                for (c, h, w), d in zip(shapes, ds_):
                    out = interp.fold_corners_rows(d * (1 + 1e-6 * i), h, w,
                                                   y0=0, halo_row=None)
                    acc = acc + out[0, 0].astype(jnp.float32)
                return acc
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f, ds_

    f, a = make_fold_block(shapes)
    results["fold_block"] = timed(f"block fold, rows/{n_shards} (fold=after)", f, a)

    # ---- scatter candidates at per-device ray counts ------------------
    N_pts = (n_global + n_cur) * 43
    sdt = cdt
    cot128 = jnp.asarray(rng.standard_normal((N_pts, 128)), dtype=sdt)
    cot256 = jnp.asarray(rng.standard_normal((N_pts, 256)), dtype=sdt)

    def make_scatter(shapes_, cot, width):
        idxs = [jnp.asarray(rng.integers(0, h * w, N_pts))
                for (c, h, w) in shapes_]

        @jax.jit
        def f(cot):
            def body(i, acc):
                cc = cot * (1.0 + 1e-6 * i)
                for (c, h, w), idx in zip(shapes_, idxs):
                    d = jnp.zeros((h * w, width), sdt)
                    d = d.at[idx].add(cc)
                    acc = acc + d[0, 0].astype(jnp.float32)
                return acc
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f

    results["scatter_6x128"] = timed(
        f"scatter 6 x [{N_pts},128] (shipped)", make_scatter(shapes, cot128, 128),
        cot128)
    fine_shapes = [s for s in shapes if s[1] == max(h for (_, h, _) in shapes)]
    results["scatter_3x256_fine"] = timed(
        f"scatter 3 x [{N_pts},256] fine-size (merged-level candidate)",
        make_scatter(fine_shapes, cot256, 256), cot256)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
