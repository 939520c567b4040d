"""Single-chip builder for the row-sharded mapper's PER-DEVICE program.

The row-sharded deployment (`parallel/mesh.make_row_sharded_pack` inside
shard_map) gives every device 1/N of the ray batch and 1/N of the plane
rows; per iteration each device packs its local row block, all-gathers
the packed blocks, renders/backprops its ray shard, reduce-scatters the
packed cotangents, folds and Adam-updates its local rows. This module
builds that per-device program on ONE chip by replacing the collectives
with their local equivalents (concat with a precomputed packed rest =
the all-gather's result; slice = the reduce-scatter's local block), so
the per-device COMPUTE is measured exactly while ICI stays an analytic
term (no multi-chip hardware in this image; see tools/projection.py).

Used by tools/prof_zero6.py / prof_zero8.py (structure comparisons) and
by bench.py's `rowshard` + `fleet.composed` extras blocks (the
driver-recorded north-star numbers). Emulation fidelity is pinned by
tests/test_parallel.py's 8-device == 1-device equality on the production
seam.

`build_composed_superstep` additionally builds the per-device program of
the COMPOSED agent x rows fleet
(`parallel/fleet.make_fleet_super_step_row_sharded`): each device of a
2-agent v5e-8 deployment runs its agent's 4-shard row program PLUS the
replicated `add_keyframe` packing and the valid-mask select over the
whole local map state — the overhead the bare per-iteration number omits
(VERDICT r4 next #4).

Config mirrors the deployment scale: Replica working shapes
(/root/reference/configs/Replica/replica.yaml:13-28 — 2048+~100 rays,
50 iters/kf, 32+11 samples; --fast: 8 depth-guided samples, 25 iters).
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax


def _build_env(n_shards: int, bf16: bool = False, fast: bool = False):
    """Shared setup for the per-device programs: config at deployment
    scale, local row shard + packed rest tables, sync seams, and the
    per-iteration loss over the local ray shard."""
    from mneslam_tpu.config import make_config
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping import keyframe as kf_lib
    from mneslam_tpu.mapping.mapper import Mapper, make_optimizer
    from mneslam_tpu.models.scene_rep import SceneRep
    from mneslam_tpu.ops import interp

    n_global, n_cur = 2048 // n_shards, 104 // n_shards
    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": n_global, "min_pixels_cur": n_cur, "iters": 50},
        "planes_res": {"coarse": coarse, "fine": fine,
                       "bound_dividable": coarse},
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
    frame = {kk: jnp.asarray(v) for kk, v in ds[0].items() if kk != "frame_id"}
    c2w = jnp.asarray(ds[0]["c2w"])
    st = mapper.add_keyframe(st, jnp.asarray(0), frame, c2w,
                             jax.random.PRNGKey(3))
    opt = make_optimizer(cfg)
    dir_flat = frame["direction"].reshape(-1, 3)
    rgb_flat = frame["rgb"].reshape(-1, 3)
    d_flat = frame["depth"].reshape(-1)
    cdt = scene.compute_dtype

    # local row shard + precomputed packed rest (the all-gather's result)
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
        # .pack: forward-only pack (no VJP) for the k-stale outer gather
        f.pack = lambda loc, rest: jnp.concatenate(
            [interp.pack_corners(jax.lax.stop_gradient(loc).astype(cdt)),
             rest], axis=0)
        return f

    def make_consume_seam(ts, hloc):
        """Identity forward over an already-packed (possibly stale) table
        whose VJP still folds the cotangent's local block into the local
        raw rows — the k-stale structure's gradient path
        (parallel/mesh `f.consume`; mapping.shard_gather_every)."""
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

    def loss_with_fn(packed_fn, p, db, kf_poses, key):
        """Generalized loss: packed_fn(name, lvl, loc) supplies the packed
        table view (sync seam, or consume seam over a stale table)."""
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

    def loss_with(p, rest, db, kf_poses, key):
        """Sync-seam loss (the production default's per-device program)."""
        return loss_with_fn(
            lambda nm, lvl, loc: sync_seams[nm][lvl](loc, rest[nm][lvl]),
            p, db, kf_poses, key)

    def pack_all(p, rest):
        """Forward-only pack of every plane (the k-stale outer gather)."""
        return {name: [sync_seams[name][lvl].pack(p["planes"][name][lvl],
                                                  rest[name][lvl])
                       for lvl in range(2)] for name in ("xy", "xz", "yz")}

    return dict(cfg=cfg, scene=scene, mapper=mapper, st=st, opt=opt,
                frame=frame, c2w=c2w, p_local=p_local,
                rest_packed=rest_packed, loss_with=loss_with,
                loss_with_fn=loss_with_fn, sync_seams=sync_seams,
                cons_seams=cons_seams, pack_all=pack_all,
                kf_lib=kf_lib)


def build_sync_step(n_shards: int, bf16: bool = False, fast: bool = False,
                    k: int = 40):
    """Build the sync-seam per-device mapping program.

    Returns (fn, args): fn is an UNJITTED k-iteration fori_loop chain
    reducing to a scalar (the CLAUDE.md direct-timing protocol); args is
    its argument tuple. jit and time it: median wall / k = ms/iter.
    """
    env = _build_env(n_shards, bf16=bf16, fast=fast)
    opt, loss_with = env["opt"], env["loss_with"]
    st = env["st"]

    def run_sync(p, s, rest, db, kf_poses, key):
        def loss(p, kk):
            return loss_with(p, rest, db, kf_poses, kk)

        def body(i, c):
            p, s = c
            _, g = jax.value_and_grad(loss)(p, jax.random.fold_in(key, i))
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s

        p, s = jax.lax.fori_loop(0, k, body, (p, s))
        return p["planes"]["xy"][1][0, 0, 0]

    args = (env["p_local"], opt.init(env["p_local"]), env["rest_packed"],
            st.db, st.kf_poses, jax.random.PRNGKey(0))
    return run_sync, args


def build_gk_step(n_shards: int, bf16: bool = False, fast: bool = False,
                  k: int = 40, gather_every: int = 8):
    """Per-device program of the k-stale seam (`mapping.shard_gather_every`,
    round 5): ONE pack (the all-gather's local half) hoisted out of every
    `gather_every`-iteration inner loop; the forward consumes the
    loop-invariant stale table while the gradient still folds to the local
    rows (consume seam) and Adam applies every iteration. Same
    (fn, args) contract as build_sync_step."""
    assert k % gather_every == 0, (k, gather_every)
    env = _build_env(n_shards, bf16=bf16, fast=fast)
    opt = env["opt"]
    loss_with_fn, cons_seams = env["loss_with_fn"], env["cons_seams"]
    pack_all, st = env["pack_all"], env["st"]

    def run_gk(p, s, rest, db, kf_poses, key):
        def loss(p, tables, kk):
            return loss_with_fn(
                lambda nm, lvl, loc: cons_seams[nm][lvl](
                    loc, tables[nm][lvl]),
                p, db, kf_poses, kk)

        def outer(o, c):
            p, s = c
            tables = pack_all(p, rest)   # closure invariant of `inner`

            def inner(j, c2):
                p, s = c2
                _, g = jax.value_and_grad(loss)(
                    p, tables, jax.random.fold_in(key, o * gather_every + j))
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s

            return jax.lax.fori_loop(0, gather_every, inner, (p, s))

        p, s = jax.lax.fori_loop(0, k // gather_every, outer, (p, s))
        return p["planes"]["xy"][1][0, 0, 0]

    args = (env["p_local"], opt.init(env["p_local"]), env["rest_packed"],
            st.db, st.kf_poses, jax.random.PRNGKey(0))
    return run_gk, args


def packed_bytes_all_planes(n_shards: int, bf16: bool = False,
                            fast: bool = False) -> int:
    """Total packed-table bytes at the deployment config (shape math only —
    jax.eval_shape, nothing materialized): per plane [C, H, W] the packed
    table is [pad_h*W, 4C] where pad_h rounds H up to a shard multiple
    (the production seam's padding). This is the per-iteration all-gather
    receive volume x N/(N-1) — bench.py's analytic ICI term uses it."""
    from mneslam_tpu.config import make_config
    from mneslam_tpu.models.scene_rep import SceneRep

    n_global, n_cur = 2048 // n_shards, 104 // n_shards
    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": n_global, "min_pixels_cur": n_cur, "iters": 50},
        "planes_res": {"coarse": coarse, "fine": fine,
                       "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 8 if fast else 32,
                     "range_d": 0.1,
                     "render_dtype": "bfloat16" if bf16 else "float32"},
    })
    scene = SceneRep(cfg)
    shapes = jax.eval_shape(scene.init_params, jax.random.PRNGKey(0))
    esize = 2 if bf16 else 4
    total = 0
    # both plane families: 'c_planes' exists when grid.oneGrid is False
    # (separate color planes) — same accounting as projection.py's
    # plane_packed_bytes
    for which in ("planes", "c_planes"):
        for name_planes in (shapes.get(which) or {}).values():
            for pl in name_planes:
                C, Hh, Ww = pl.shape
                pad_h = -(-Hh // n_shards) * n_shards
                total += pad_h * Ww * 4 * C * esize
    return total


def build_composed_superstep(n_shards: int, bf16: bool = False,
                             fast: bool = False, iters: int = 50):
    """The composed agent x rows fleet's per-device program for one
    keyframe super-step (make_fleet_super_step_row_sharded's shard_map
    body at an agent-block of 1): replicated `add_keyframe` packing +
    kf-pose slot write, `iters` sync-seam row-sharded iterations at
    `n_shards`, then the valid-mask select over the whole local map
    state. Returns (jitted step, state0, const) where step(state, const,
    r) -> state chains super-steps for the bench protocol (chained
    dispatches, one trailing fetch)."""
    env = _build_env(n_shards, bf16=bf16, fast=fast)
    opt, loss_with = env["opt"], env["loss_with"]
    st, frame, c2w = env["st"], env["frame"], env["c2w"]
    kf_lib = env["kf_lib"]
    cfg = env["cfg"]
    filter_depth = bool(cfg["mapping"].get("filter_depth", False))
    depth_trunc = float(cfg["cam"]["depth_trunc"])

    @jax.jit
    def step(state, const, r):
        p, s, db, kf_poses = state
        rest, dirs, rgb, depth = const
        k1 = jax.random.fold_in(jax.random.PRNGKey(11), r)
        k2 = jax.random.fold_in(jax.random.PRNGKey(12), r)
        valid = r >= 0  # always true at runtime; the select still executes

        db2 = kf_lib.add_keyframe(db, k1, jnp.asarray(1, jnp.int32), dirs,
                                  rgb, depth, filter_depth=filter_depth,
                                  depth_trunc=depth_trunc)
        kfp2 = jax.lax.dynamic_update_index_in_dim(
            kf_poses, c2w, db.count, axis=0)

        def loss(p, kk):
            return loss_with(p, rest, db2, kfp2, kk)

        def body(i, c):
            p, s = c
            _, g = jax.value_and_grad(loss)(p, jax.random.fold_in(k2, i))
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s

        p2, s2 = jax.lax.fori_loop(0, iters, body, (p, s))

        sel = lambda a, b: jnp.where(valid, a, b)
        p2 = jax.tree.map(sel, p2, p)
        s2 = jax.tree.map(sel, s2, s)
        db2 = jax.tree.map(sel, db2, db)
        kfp2 = sel(kfp2, kf_poses)
        return p2, s2, db2, kfp2

    state0 = (env["p_local"], opt.init(env["p_local"]), st.db, st.kf_poses)
    const = (env["rest_packed"], frame["direction"], frame["rgb"],
             frame["depth"])
    return step, state0, const


def measure_composed_ms_kf(n_shards: int, bf16: bool = False,
                           fast: bool = False, iters: int = 50,
                           reps: int = 5) -> float:
    """Chained-dispatch super-step wall per keyframe (bench protocol)."""
    import time

    step, state, const = build_composed_superstep(n_shards, bf16=bf16,
                                                  fast=fast, iters=iters)
    # fetch ONE scalar only — pulling a whole leaf through the ~10-20 MB/s
    # tunnel would bill megabytes of transfer as "compute" (CLAUDE.md)
    fetch = jax.jit(lambda st: st[0]["planes"]["xy"][1][0, 0, 0])
    state = step(state, const, jnp.asarray(0, jnp.int32))
    float(fetch(state))  # warm (incl. the fetch program's compile)
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        state = step(state, const, jnp.asarray(r, jnp.int32))
    float(fetch(state))
    return (time.perf_counter() - t0) / reps * 1e3


def measure_ms_iter(n_shards: int, bf16: bool = False, fast: bool = False,
                    k: int = 40, n_wall: int = 5,
                    gather_every: int = 1) -> float:
    """Direct-protocol measurement: jit the k-iter chain, warm it, median
    of n_wall fetch-synced walls / k. gather_every > 1 measures the
    k-stale seam (build_gk_step) instead of the sync seam."""
    import time

    if gather_every > 1:
        fn, args = build_gk_step(n_shards, bf16=bf16, fast=fast, k=k,
                                 gather_every=gather_every)
    else:
        fn, args = build_sync_step(n_shards, bf16=bf16, fast=fast, k=k)
    jfn = jax.jit(fn)
    float(np.asarray(jfn(*args)).ravel()[0])
    walls = []
    for _ in range(n_wall):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)).ravel()[0])
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls)) / k * 1e3
