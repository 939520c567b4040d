"""Per-device compute of the row-sharded mapper's three loop structures
(round 4 — deciding the default after the prefetch work):

  S  sync (prof_zero5 V1): each iteration packs the local block and
     concats the packed rest INSIDE the differentiated forward
     (custom_vjp bwd = slice + fold at rows/8). The gather sits on the
     critical path at the top of every iteration.
  H  hoisted double-buffer (exact): the packed full table lives in the
     fori_loop CARRY; the forward consumes it through a custom_vjp whose
     bwd folds at rows/8; the body re-packs AFTER its Adam update.
     Bit-identical math to S; the (emulated) all-gather's only
     dependence is the local Adam, freeing the TPU scheduler to overlap
     it with the other planes' backward.
  P  stale prefetch (mapping.shard_prefetch=1): like H but re-packs
     BEFORE the update (one-step-stale tables; a full iteration of
     overlap window). Approximate — quality A/B in
     tools/prof_prefetch_quality.py.

All rest tables are jit ARGUMENTS (closed-over constants exceed the
remote compiler's request limit at these sizes — prof_zero5 note).
Protocol: CLAUDE.md direct timing (K-iter fori_loop -> scalar, median of
5 fetch-synced walls / K).

Usage: python tools/prof_zero6.py [n_shards] [--bf16] [--fast]
  --fast: the room0_fast.yaml mapping profile (8 depth-guided samples
  instead of 32; pair with --bf16 for that profile's default dtype) — the
  equal-quality deployment profile's per-device sharded program.
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

    def make_sync_seam(ts, hloc):
        C, Hh, Ww = ts
        B = hloc * Ww

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
        f.pack = lambda loc, rest: jnp.concatenate(
            [interp.pack_corners(jax.lax.stop_gradient(loc).astype(cdt)),
             rest], axis=0)
        return f

    def make_consume_seam(ts, hloc):
        C, Hh, Ww = ts
        B = hloc * Ww

        @jax.custom_vjp
        def consume(loc, table):
            return table

        def fwd(loc, table):
            return table, None

        def bwd(_, d):
            blk = d[:B]
            out = interp.fold_corners_rows(blk, Hh, Ww, y0=0, halo_row=None)
            return (jnp.transpose(out.reshape(hloc, Ww, C), (2, 0, 1))
                    .astype(jnp.float32),
                    jnp.zeros((Hh * Ww, 4 * C), cdt))

        consume.defvjp(fwd, bwd)
        return consume

    sync_seams = {name: [make_sync_seam(true_shapes[name][lvl],
                                        hlocs[name][lvl])
                         for lvl in range(2)] for name in ("xy", "xz", "yz")}
    cons_seams = {name: [make_consume_seam(true_shapes[name][lvl],
                                           hlocs[name][lvl])
                         for lvl in range(2)] for name in ("xy", "xz", "yz")}

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
        return {name: [sync_seams[name][lvl].pack(p["planes"][name][lvl],
                                                  rest[name][lvl])
                       for lvl in range(2)] for name in ("xy", "xz", "yz")}

    # ---- S: sync --------------------------------------------------------
    @jax.jit
    def run_sync(p, s, rest, db, kf_poses, key):
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

    results["S_sync"] = timed("S: sync seam (prof_zero5 V1)", run_sync,
                              p_local, opt.init(p_local), rest_packed,
                              st.db, st.kf_poses, jax.random.PRNGKey(0))

    # ---- H: hoisted carry (exact) ----------------------------------------
    @jax.jit
    def run_hoist(p, s, rest, db, kf_poses, key):
        def loss(p, tables, kk):
            return loss_with(
                lambda nm, lvl, loc: cons_seams[nm][lvl](
                    loc, tables[nm][lvl]),
                p, rest, db, kf_poses, kk)

        def body(i, c):
            p, s, tables = c
            _, g = jax.value_and_grad(loss)(p, tables,
                                            jax.random.fold_in(key, i))
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
            return p, s, pack_all(p, rest)

        p, s, _ = jax.lax.fori_loop(
            0, K, body, (p, s, pack_all(p, rest)))
        return p["planes"]["xy"][1][0, 0, 0]

    results["H_hoisted"] = timed("H: hoisted double-buffer (exact)",
                                 run_hoist, p_local, opt.init(p_local),
                                 rest_packed, st.db, st.kf_poses,
                                 jax.random.PRNGKey(0))

    # ---- P: stale prefetch ------------------------------------------------
    @jax.jit
    def run_stale(p, s, rest, db, kf_poses, key):
        def loss(p, tables, kk):
            return loss_with(
                lambda nm, lvl, loc: cons_seams[nm][lvl](
                    loc, tables[nm][lvl]),
                p, rest, db, kf_poses, kk)

        def body(i, c):
            p, s, tables = c
            tables_next = pack_all(p, rest)
            _, g = jax.value_and_grad(loss)(p, tables,
                                            jax.random.fold_in(key, i))
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, tables_next

        p, s, _ = jax.lax.fori_loop(
            0, K, body, (p, s, pack_all(p, rest)))
        return p["planes"]["xy"][1][0, 0, 0]

    results["P_stale"] = timed("P: stale prefetch (shard_prefetch=1)",
                               run_stale, p_local, opt.init(p_local),
                               rest_packed, st.db, st.kf_poses,
                               jax.random.PRNGKey(0))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
