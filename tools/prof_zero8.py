"""Per-device compute of the k-stale loop-invariant table structure
(round 5 — VERDICT r4 next #1: `mapping.shard_gather_every`).

Structure G_k: hoist ONE pack (+ all-gather on a real mesh) out of every
k-iteration inner loop; render those k iterations against the same
loop-INVARIANT table (closure capture of the inner fori_loop — NOT loop
carry, which is what taxed the rejected H/P variants +0.6-1.1 ms/iter).
Gradients still reduce and Adam still applies every iteration; only the
forward's table view goes up-to-(k-1)-stale. ICI per iteration becomes
reduce-scatter + all-gather/k.

Baseline S (sync seam, prof_zero5 V1 == prof_zero6 S) re-measured in the
same session for a like-for-like delta. All rest tables are jit ARGUMENTS
(closed-over constants exceed the remote compiler's request limit).
Protocol: CLAUDE.md direct timing (K-iter chain -> scalar fetch, median
of 5 walls / K).

Usage: python tools/prof_zero8.py [n_shards] [--bf16] [--fast]
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

    # ---- S: sync baseline (same-session re-measurement) -------------------
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

    results["S_sync"] = timed("S: sync seam (baseline)", run_sync,
                              p_local, opt.init(p_local), rest_packed,
                              st.db, st.kf_poses, jax.random.PRNGKey(0))

    # ---- G_k: loop-invariant k-stale tables --------------------------------
    def make_run_gk(k_st):
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

    for k_st in (2, 4, 8):
        results[f"G{k_st}"] = timed(
            f"G{k_st}: loop-invariant tables, gather every {k_st}",
            make_run_gk(k_st), p_local, opt.init(p_local), rest_packed,
            st.db, st.kf_poses, jax.random.PRNGKey(0))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
