"""Per-device compute of the fold="before" backward orderings
(round 5 — pushing the v5e-8 serialized north-star bound).

The row-sharded seam's backward has two exact orderings
(`parallel/mesh.make_row_sharded_pack(fold=...)`, both shipped since
round 4 but only "after" ever measured):

  * "after"  (default): reduce-scatter the PACKED cotangent [R, 4C],
    fold the local block. Minimal per-device compute; 4x the ICI.
  * "before" (FB): fold the FULL packed cotangent locally (fold is
    linear, so fold-then-reduce == reduce-then-fold exactly), then
    reduce-scatter the RAW [Rp, C] cotangent — 4x less backward ICI for
    an n_shards-times-larger per-device fold.

Per-device emulation on one chip (same convention as prof_zero8 /
rowshard_step): collectives replaced by their local math — the
reduce-scatter becomes slicing the locally-folded full cotangent to the
local row block. Variants:

  S     sync seam, fold=after   (baseline, same-session re-measurement)
  FB    sync seam, fold=before
  G8    gather-every-8, fold=after  (round-5 k-stale structure)
  G8FB  gather-every-8, fold=before — the minimal-ICI combination:
        forward all-gather /8 (packed), backward reduce-scatter raw.

ICI per iteration (analytic, tools/projection.py): fold=after
(1/k + 1) * packed; fold=before (1/k + 1/4) * packed.

Protocol: CLAUDE.md direct timing (K-iter chain -> scalar fetch, median
of 5 walls / K). Rest tables are jit ARGUMENTS (closed-over constants
exceed the remote compiler's request limit).

Usage: python tools/prof_zero9.py [n_shards] [--bf16] [--fast]
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
    fast = "--fast" in sys.argv
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
        "training": {"n_range_d": 11, "n_samples_d": 8 if fast else 32,
                     "range_d": 0.1,
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
          f"rays={n_global}+{n_cur}  dtype={jnp.dtype(cdt).name}"
          f"{'  profile=fast' if fast else ''}", flush=True)
    results = {"n_shards": n_shards, "bf16": bf16, "fast": fast}

    p_local = {"planes": {}, "decoder": st.params["decoder"]}
    rest_packed, true_shapes, hlocs = {}, {}, {}
    for name in ("xy", "xz", "yz"):
        p_local["planes"][name] = []
        rest_packed[name], true_shapes[name], hlocs[name] = [], [], []
        for pl in st.params["planes"][name]:
            C, Hh, Ww = pl.shape
            hloc = Hh // n_shards
            p_local["planes"][name].append(pl[:, :hloc])
            rest_packed[name].append(
                interp.pack_corners(pl.astype(cdt))[hloc * Ww:])
            true_shapes[name].append((C, Hh, Ww))
            hlocs[name].append(hloc)
    p_local = jax.tree.map(jnp.asarray, p_local)
    rest_packed = jax.tree.map(jnp.asarray, rest_packed)

    def block_bwd(d, ts, hloc):
        """fold=after per-device backward: slice the local packed block
        (the reduce-scatter's local result), fold it."""
        C, Hh, Ww = ts
        B = hloc * Ww
        out = interp.fold_corners_rows(d[:B], Hh, Ww, y0=0, halo_row=None)
        return (jnp.transpose(out.reshape(hloc, Ww, C), (2, 0, 1))
                .astype(jnp.float32))

    def full_bwd(d, ts, hloc):
        """fold=before per-device backward: fold the FULL packed
        cotangent (linear, so fold-then-reduce == reduce-then-fold),
        then slice the local raw block (the raw reduce-scatter)."""
        C, Hh, Ww = ts
        B = hloc * Ww
        out = interp.fold_corners_rows(d, Hh, Ww)      # [Hh*Ww, C]
        return (jnp.transpose(out[:B].reshape(hloc, Ww, C), (2, 0, 1))
                .astype(jnp.float32))

    def make_sync_seam(ts, hloc, fold_fn):
        C, Hh, Ww = ts

        @jax.custom_vjp
        def f(loc, rest):
            return jnp.concatenate(
                [interp.pack_corners(loc.astype(cdt)), rest], axis=0)

        def fwd(loc, rest):
            return f(loc, rest), None

        def bwd(_, d):
            return (fold_fn(d, ts, hloc),
                    jnp.zeros((Hh * Ww - hloc * Ww, 4 * C), cdt))

        f.defvjp(fwd, bwd)
        f.pack = lambda loc, rest: jnp.concatenate(
            [interp.pack_corners(jax.lax.stop_gradient(loc).astype(cdt)),
             rest], axis=0)
        return f

    def make_consume_seam(ts, hloc, fold_fn):
        C, Hh, Ww = ts

        @jax.custom_vjp
        def consume(loc, table):
            return table

        def fwd(loc, table):
            return table, None

        def bwd(_, d):
            return (fold_fn(d, ts, hloc),
                    jnp.zeros((Hh * Ww, 4 * C), cdt))

        consume.defvjp(fwd, bwd)
        return consume

    def seams(maker, fold_fn):
        return {name: [maker(true_shapes[name][lvl], hlocs[name][lvl],
                             fold_fn)
                       for lvl in range(2)] for name in ("xy", "xz", "yz")}

    sync_a = seams(make_sync_seam, block_bwd)
    sync_b = seams(make_sync_seam, full_bwd)
    cons_a = seams(make_consume_seam, block_bwd)
    cons_b = seams(make_consume_seam, full_bwd)

    def loss_with(packed_fn, p, rest, db, kf_poses, key):
        planes_packed = {
            name: [interp.PackedPlane(
                packed_fn(name, lvl, p["planes"][name][lvl]),
                true_shapes[name][lvl])
                   for lvl in range(2)]
            for name in ("xy", "xz", "yz")}
        params = {"planes": planes_packed, "decoder": p["decoder"]}
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

    def pack_all(p, rest):
        return {name: [sync_a[name][lvl].pack(p["planes"][name][lvl],
                                              rest[name][lvl])
                       for lvl in range(2)] for name in ("xy", "xz", "yz")}

    def make_run_sync(sync_seams):
        @jax.jit
        def run(p, s, rest, db, kf_poses, key):
            def loss(p, kk):
                return loss_with(
                    lambda nm, lvl, loc: sync_seams[nm][lvl](loc, rest[nm][lvl]),
                    p, rest, db, kf_poses, kk)

            def body(i, c):
                p, s = c
                _, g = jax.value_and_grad(loss)(p, jax.random.fold_in(key, i))
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s

            p, s = jax.lax.fori_loop(0, K, body, (p, s))
            return p["planes"]["xy"][1][0, 0, 0]

        return run

    def make_run_gk(cons_seams, k_st):
        assert K % k_st == 0

        @jax.jit
        def run(p, s, rest, db, kf_poses, key):
            def loss(p, tables, kk):
                return loss_with(
                    lambda nm, lvl, loc: cons_seams[nm][lvl](
                        loc, tables[nm][lvl]),
                    p, rest, db, kf_poses, kk)

            def outer(o, c):
                p, s = c
                tables = pack_all(p, rest)   # closure invariant of `inner`

                def inner(j, c2):
                    p, s = c2
                    _, g = jax.value_and_grad(loss)(
                        p, tables, jax.random.fold_in(key, o * k_st + j))
                    u, s = opt.update(g, s, p)
                    return optax.apply_updates(p, u), s

                return jax.lax.fori_loop(0, k_st, inner, (p, s))

            p, s = jax.lax.fori_loop(0, K // k_st, outer, (p, s))
            return p["planes"]["xy"][1][0, 0, 0]

        return run

    base_args = (p_local, opt.init(p_local), rest_packed, st.db,
                 st.kf_poses, jax.random.PRNGKey(0))
    results["S_sync"] = timed("S: sync seam, fold=after (baseline)",
                              make_run_sync(sync_a), *base_args)
    results["FB"] = timed("FB: sync seam, fold=before",
                          make_run_sync(sync_b), *base_args)
    results["G8"] = timed("G8: gather every 8, fold=after",
                          make_run_gk(cons_a, 8), *base_args)
    results["G8FB"] = timed("G8FB: gather every 8, fold=before",
                            make_run_gk(cons_b, 8), *base_args)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
