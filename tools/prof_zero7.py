"""Decompose the row-sharded mapper's per-device step (the prof_zero6 "S"
sync program) by ablation, on the real chip.

Round-4 motivation: at 8 shards the sync per-device program measures
3.93 ms/iter fp32 (prof_zero6), giving a 5.09 Hz compute-bound ceiling at
reference sampling — zero slack against the >5 Hz north-star. Earlier
attributions conflict: prof_zero5 isolated "zeros+scatter x6 = 1.37 ms"
and round-3 prof_zero measured "fold at rows/8 = 0.96 ms", but prof_zero5
V1-V0 puts the fold-in-context at ~0.19 ms. This probe ablates one
component at a time INSIDE the full program so overlap is accounted for:

  full           the S sync step (baseline)
  fwd            loss only, no grad/update (forward pipeline)
  nograd_planes  packed tables stop_gradient'd (no vals concat, no
                 scatter, no fold, no plane Adam; decoder still trains)
  novals         sampler bwd emits zero d_packed without building the
                 [N,4C] corner-cotangent concat (fold/Adam on zeros)
  noscatter      sampler bwd builds vals but writes them CONTIGUOUSLY
                 (.at[:n].set) instead of the random-row scatter-add —
                 full - noscatter = the sort-based scatter pipeline
                 above a dense table-sized write
  nofold         seam bwd replaces fold_corners_rows with a lane slice
                 (same shapes, no shifted-adds relayout)
  sgd            Adam replaced by plain SGD (optimizer cost)

Protocol: CLAUDE.md direct timing (K-iter fori_loop -> scalar, median of
5 fetch-synced walls / K). Usage: python tools/prof_zero7.py [n_shards]
[--bf16]
"""

import json
import sys
import time
from functools import partial

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


def make_sample_variant(mode):
    """A sample_packed_table clone with an ablated backward."""
    from mneslam_tpu.ops import interp

    @partial(jax.custom_vjp, nondiff_argnums=(2,))
    def sample(packed, coords, shape):
        out, _ = interp._sample_packed_fwd_impl(packed, coords, shape)
        return out

    def fwd(packed, coords, shape):
        out, (g, wx, wy, idx) = interp._sample_packed_fwd_impl(
            packed, coords, shape)
        return out, (g, wx, wy, idx, coords)

    def bwd(shape, res, dout):
        g, wx, wy, idx, coords = res
        C, H, W = shape
        n_rows = H * W
        dout = dout.astype(g.dtype)
        if mode == "novals":
            d_packed = jnp.zeros((n_rows, 4 * C), g.dtype)
        else:
            vals = jnp.concatenate([
                dout * ((1 - wx) * (1 - wy))[:, None],
                dout * (wx * (1 - wy))[:, None],
                dout * ((1 - wx) * wy)[:, None],
                dout * (wx * wy)[:, None],
            ], axis=-1)
            if mode == "noscatter":
                d_packed = jnp.zeros((n_rows, 4 * C), vals.dtype)
                d_packed = d_packed.at[:vals.shape[0]].set(vals)
            elif mode == "xla_scatter":
                d_packed = jnp.zeros(
                    (n_rows, 4 * C), vals.dtype).at[idx].add(vals)
            else:  # "full" — the production dispatcher (Pallas since r4)
                from mneslam_tpu.ops import pallas_kernels
                d_packed = pallas_kernels.scatter_add_rows(idx, vals, n_rows)
        # coordinate cotangent kept in every mode (small, always live)
        g00, g01, g10, g11 = (g[:, i * C:(i + 1) * C] for i in range(4))
        gx = (g01 - g00) * (1 - wy)[:, None] + (g11 - g10) * wy[:, None]
        gy = (g10 - g00) * (1 - wx)[:, None] + (g11 - g01) * wx[:, None]
        mx = ((coords[:, 0] >= -1.0) & (coords[:, 0] <= 1.0)).astype(dout.dtype)
        my = ((coords[:, 1] >= -1.0) & (coords[:, 1] <= 1.0)).astype(dout.dtype)
        dx = jnp.sum(gx * dout, axis=-1) * (0.5 * (W - 1)) * mx
        dy = jnp.sum(gy * dout, axis=-1) * (0.5 * (H - 1)) * my
        d_coords = jnp.stack([dx, dy], axis=-1).astype(coords.dtype)
        return d_packed, d_coords

    sample.defvjp(fwd, bwd)
    return sample


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

    def make_sync_seam(ts, hloc, fold=True):
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
            if fold:
                out = interp.fold_corners_rows(blk, Hh, Ww, y0=0, halo_row=None)
            else:
                out = blk[:, :C]  # ablation: lane slice, no shifted adds
            return (jnp.transpose(out.reshape(hloc, Ww, C), (2, 0, 1))
                    .astype(jnp.float32),
                    jnp.zeros((Hh * Ww - B, 4 * C), cdt))

        f.defvjp(fwd, bwd)
        return f

    def seams_for(fold=True):
        return {name: [make_sync_seam(true_shapes[name][lvl],
                                      hlocs[name][lvl], fold=fold)
                       for lvl in range(2)] for name in ("xy", "xz", "yz")}

    def loss_with(seams, p, rest, db, kf_poses, key, stop_planes=False):
        planes_packed = {}
        for name in ("xy", "xz", "yz"):
            tbls = []
            for lvl in range(2):
                t = seams[name][lvl](p["planes"][name][lvl], rest[name][lvl])
                if stop_planes:
                    t = jax.lax.stop_gradient(t)
                tbls.append(interp.PackedPlane(t, true_shapes[name][lvl]))
            planes_packed[name] = tbls
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

    def make_run(sample_mode="full", fold=True, optimizer=None,
                 stop_planes=False, fwd_only=False):
        seams = seams_for(fold=fold)
        the_opt = optimizer or opt
        sample_fn = make_sample_variant(sample_mode)

        orig = interp.sample_packed_table
        interp.sample_packed_table = sample_fn
        try:
            @jax.jit
            def run(p, s, rest, db, kf_poses, key):
                def loss(p, kk):
                    return loss_with(seams, p, rest, db, kf_poses, kk,
                                     stop_planes=stop_planes)

                if fwd_only:
                    def body(i, c):
                        p, s, acc = c
                        return p, s, acc + loss(p, jax.random.fold_in(key, i))

                    _, _, acc = jax.lax.fori_loop(
                        0, K, body, (p, s, jnp.zeros((), jnp.float32)))
                    return acc

                def body(i, c):
                    p, s = c
                    _, g = jax.value_and_grad(loss)(p, jax.random.fold_in(key, i))
                    u, s = the_opt.update(g, s, p)
                    return optax.apply_updates(p, u), s

                p, s = jax.lax.fori_loop(0, K, body, (p, s))
                return p["planes"]["xy"][1][0, 0, 0]

            s0 = the_opt.init(p_local)
            return run, s0
        finally:
            interp.sample_packed_table = orig

    probes = [
        ("full", dict()),
        ("xla_scatter", dict(sample_mode="xla_scatter")),
        ("fwd", dict(fwd_only=True)),
        ("nograd_planes", dict(stop_planes=True)),
        ("novals", dict(sample_mode="novals")),
        ("noscatter", dict(sample_mode="noscatter")),
        ("nofold", dict(fold=False)),
        ("sgd", dict(optimizer=optax.sgd(1e-2))),
    ]
    for name, kw in probes:
        run, s0 = make_run(**kw)
        # Tracing happens at first call — re-patch the sampler for it.
        from mneslam_tpu.ops import interp as _i
        orig = _i.sample_packed_table
        _i.sample_packed_table = make_sample_variant(kw.get("sample_mode", "full"))
        try:
            results[name] = timed(name, run, p_local, s0, rest_packed,
                                  st.db, st.kf_poses, jax.random.PRNGKey(0))
        finally:
            _i.sample_packed_table = orig

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
