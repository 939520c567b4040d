"""Definitive mapping-iteration breakdown (round 3, direct protocol ONLY).

VERDICT round 2 flagged that BASELINE.md carried two contradictory accounts
of the ~15.4 ms/iter mapping floor (plane gather/scatter ~100% vs backward
through decoder/render ~12.5 ms).  This tool settles it with the one
trustworthy protocol (CLAUDE.md): every probe is a k-iteration chain inside
ONE jitted fori_loop reducing to a scalar, warmed, then median of >=5 full
fetch-synced wall times divided by k.  No k-slope "marginal" arithmetic
(invalidated by tools/prof_hlo_diff.py), no non-scalar fetches.

Probe set (differential decomposition of the production step):
  full          fwd + bwd + adam (the mapper.optimize body)
  fwd           loss forward only
  fwd_bwd       jax.grad, params chained through tiny SGD
  fwd_bwd_nopl  same, but plane features stop_gradient'd -> NO plane
                cotangent: no corner scatter, no pack adjoint, no plane
                grads.  (fwd_bwd - fwd_bwd_nopl) = the whole plane-gradient
                path; (fwd_bwd_nopl - fwd) = backward through
                OneBlob/decoder/render/losses only.
  planes_fwd    sum(plane_feature_blocks) over the true batch points
  planes_bwd    grad of planes_fwd (gathers + corner scatter + adjoint)
  adam          optimizer update with fixed grads
  full_bf16     production step with training.render_dtype=bfloat16

Workload: bench.py reference shapes — 2048+100 rays x 43 samples, c_dim 32,
coarse 0.04 / fine 0.02 planes over an 8 m bound (Replica working profile,
/root/reference/configs/Replica/replica.yaml:13-28).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax


K = 40          # iterations chained per program
N_WALL = 5      # fetch-synced wall samples (median)


def timed(name, fn, *args):
    """fn is a jitted callable returning a scalar; median wall / K."""
    float(np.asarray(fn(*args)).ravel()[0])  # warm (compile)
    walls = []
    for _ in range(N_WALL):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        walls.append(time.perf_counter() - t0)
    per = float(np.median(walls)) / K * 1e3
    print(f"{name:40s} {per:8.2f} ms/iter   (walls {[round(w,3) for w in walls]})",
          flush=True)
    return per


def build(render_dtype="float32"):
    from mneslam_tpu.config import make_config
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper
    from mneslam_tpu.models.scene_rep import SceneRep

    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": 2048, "min_pixels_cur": 100, "iters": 50},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1,
                     "render_dtype": render_dtype},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=bound * 0.9)
    mapper = Mapper(cfg, scene, num_kf=8, rays_per_kf=ds.num_rays_to_save)
    st = mapper.init_state(jax.random.PRNGKey(2))
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    c2w = jnp.asarray(ds[0]["c2w"])
    st = mapper.add_keyframe(st, jnp.asarray(0), frame, c2w, jax.random.PRNGKey(3))
    return cfg, scene, mapper, st, frame, c2w


def main():
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.mapping import keyframe as kf_lib
    from mneslam_tpu.mapping.mapper import make_optimizer
    from mneslam_tpu.models.scene_rep import SceneRep

    cfg, scene, mapper, st, frame, c2w = build()
    opt = make_optimizer(cfg)
    H, W = frame["depth"].shape
    n_global, n_cur = 2048, 100
    dir_flat = frame["direction"].reshape(-1, 3)
    rgb_flat = frame["rgb"].reshape(-1, 3)
    d_flat = frame["depth"].reshape(-1)
    print(f"device={jax.devices()[0]}  K={K}", flush=True)

    def sample_batch(db, kf_poses, key):
        k_db, k_cur, k_render = jax.random.split(key, 3)
        g_rays, slot_ids = kf_lib.sample_global_rays(db, k_db, n_global)
        g_poses = kf_poses[slot_ids]
        g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3], g_poses)
        idx = jax.random.randint(k_cur, (n_cur,), 0, H * W)
        c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], c2w)
        rays_o = jnp.concatenate([g_o, c_o], axis=0)
        rays_d = jnp.concatenate([g_d, c_d], axis=0)
        t_rgb = jnp.concatenate([g_rays[:, 3:6], rgb_flat[idx]], axis=0)
        t_d = jnp.concatenate([g_rays[:, 6], d_flat[idx]], axis=0)[:, None]
        return rays_o, rays_d, t_rgb, t_d, k_render

    def make_loss(sc):
        def loss_from_key(p, db, kf_poses, key):
            rays_o, rays_d, t_rgb, t_d, k_render = sample_batch(db, kf_poses, key)
            ret = sc.forward(p, rays_o, rays_d, t_rgb, t_d, key=k_render)
            return sc.get_loss_from_ret(ret)
        return loss_from_key

    loss_fp32 = make_loss(scene)
    results = {}

    # -- full production step ------------------------------------------
    @jax.jit
    def full(p, s, db, kf_poses, key):
        def body(i, c):
            p, s = c
            kk = jax.random.fold_in(key, i)
            _, g = jax.value_and_grad(loss_fp32)(p, db, kf_poses, kk)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s
        p, s = jax.lax.fori_loop(0, K, body, (p, s))
        return p["planes"]["xy"][1][0, 0, 0]

    results["full"] = timed("full (fwd+bwd+adam)", full, st.params,
                            opt.init(st.params), st.db, st.kf_poses,
                            jax.random.PRNGKey(0))

    # -- fwd only ------------------------------------------------------
    @jax.jit
    def fwd(p, db, kf_poses, key):
        def body(i, acc):
            return acc + loss_fp32(p, db, kf_poses, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["fwd"] = timed("fwd only", fwd, st.params, st.db, st.kf_poses,
                           jax.random.PRNGKey(0))

    # -- fwd + bwd (sgd-chained) ---------------------------------------
    def make_grad_chain(loss_fn):
        @jax.jit
        def g(p, db, kf_poses, key):
            def body(i, p):
                gg = jax.grad(loss_fn)(p, db, kf_poses, jax.random.fold_in(key, i))
                return jax.tree.map(lambda a, b: a - 1e-12 * b.astype(a.dtype), p, gg)
            p = jax.lax.fori_loop(0, K, body, p)
            return p["decoder"]["sdf"][0][0, 0] + p["planes"]["xy"][1][0, 0, 0]
        return g

    results["fwd_bwd"] = timed("fwd+bwd (sgd-chained)",
                               make_grad_chain(loss_fp32),
                               st.params, st.db, st.kf_poses,
                               jax.random.PRNGKey(0))

    # -- fwd + bwd with plane features stop-gradient'd ------------------
    class SceneNoPlaneGrad(SceneRep):
        def plane_feature_blocks(self, planes, p_nor):
            return [jax.lax.stop_gradient(b)
                    for b in super().plane_feature_blocks(planes, p_nor)]

    scene_nopl = SceneNoPlaneGrad(cfg)
    results["fwd_bwd_noplane"] = timed("fwd+bwd, plane feats stop-grad",
                                       make_grad_chain(make_loss(scene_nopl)),
                                       st.params, st.db, st.kf_poses,
                                       jax.random.PRNGKey(0))

    # -- plane pipeline only (true batch geometry) ----------------------
    def plane_loss(p, db, kf_poses, key):
        rays_o, rays_d, _, t_d, k_render = sample_batch(db, kf_poses, key)
        z_vals = scene.sample_z_vals(t_d, rays_o.shape[0], k_render)
        pts = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)
        blocks = scene.plane_feature_blocks(p["planes"], scene._normalize(pts))
        return sum(b.sum() for b in blocks)

    @jax.jit
    def planes_fwd(p, db, kf_poses, key):
        def body(i, acc):
            return acc + plane_loss(p, db, kf_poses, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["planes_fwd"] = timed("plane pipeline fwd only", planes_fwd,
                                  st.params, st.db, st.kf_poses,
                                  jax.random.PRNGKey(0))

    results["planes_fwd_bwd"] = timed("plane pipeline fwd+bwd",
                                      make_grad_chain(plane_loss),
                                      st.params, st.db, st.kf_poses,
                                      jax.random.PRNGKey(0))

    # -- adam only ------------------------------------------------------
    g_fixed = jax.jit(jax.grad(loss_fp32))(st.params, st.db, st.kf_poses,
                                           jax.random.PRNGKey(7))
    g_fixed = jax.block_until_ready(g_fixed)

    @jax.jit
    def adam_only(p, s, g):
        def body(i, c):
            p, s = c
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s
        p, s = jax.lax.fori_loop(0, K, body, (p, s))
        return p["planes"]["xy"][1][0, 0, 0]

    results["adam"] = timed("adam only (fixed grads)", adam_only,
                            st.params, opt.init(st.params), g_fixed)

    # -- bf16 full step -------------------------------------------------
    cfg16, scene16, mapper16, st16, frame16, _ = build("bfloat16")
    opt16 = make_optimizer(cfg16)
    loss_bf16 = make_loss(scene16)

    @jax.jit
    def full16(p, s, db, kf_poses, key):
        def body(i, c):
            p, s = c
            kk = jax.random.fold_in(key, i)
            _, g = jax.value_and_grad(loss_bf16)(p, db, kf_poses, kk)
            u, s = opt16.update(g, s, p)
            return optax.apply_updates(p, u), s
        p, s = jax.lax.fori_loop(0, K, body, (p, s))
        return p["planes"]["xy"][1][0, 0, 0]

    results["full_bf16"] = timed("full step, render_dtype=bf16", full16,
                                 st16.params, opt16.init(st16.params),
                                 st16.db, st16.kf_poses, jax.random.PRNGKey(0))

    # -- derived decomposition -----------------------------------------
    print("\n--- derived ---", flush=True)
    print(f"bwd through decoder/render/losses (no plane grads): "
          f"{results['fwd_bwd_noplane'] - results['fwd']:.2f} ms", flush=True)
    print(f"plane-gradient path (scatter+adjoint+plane-bwd sched): "
          f"{results['fwd_bwd'] - results['fwd_bwd_noplane']:.2f} ms", flush=True)
    print(f"plane scatter+adjoint isolated (planes_bwd - planes_fwd): "
          f"{results['planes_fwd_bwd'] - results['planes_fwd']:.2f} ms", flush=True)
    print(f"additive check: fwd + dec-bwd + plane-bwd + adam = "
          f"{results['fwd'] + (results['fwd_bwd_noplane'] - results['fwd']) + (results['fwd_bwd'] - results['fwd_bwd_noplane']) + results['adam']:.2f} "
          f"vs full {results['full']:.2f}", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
