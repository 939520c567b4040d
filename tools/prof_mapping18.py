"""Per-device decomposition of the ray-sharded mapping step (round 3).

prof_mapping17 measured the per-device program of the 8-way ray-sharded
mapper (same planes/bound, rays/8 = 256+13) at 9.32 ms/iter vs 17.01
full — only 1.8x for 8x fewer rays, so table-sized fixed costs dominate
the sharded regime. This tool reruns the prof_mapping12 differential
probe set at the per-device ray count to attribute the fixed 9 ms:
pack_corners rebuild (table-sized fwd), corner-adjoint unpack
(table-sized bwd), Adam on full planes, and the N-sized remainder.

Protocol: CLAUDE.md direct timing only (K-iter jitted fori_loop chain ->
scalar, median of 5 fetch-synced walls / K).

Usage: python tools/prof_mapping18.py [n_global n_cur]   (default 256 13)
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
    print(f"{name:40s} {per:8.2f} ms/iter", flush=True)
    return per


def main():
    n_global = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_cur = int(sys.argv[2]) if len(sys.argv) > 2 else 13

    from mneslam_tpu.config import make_config
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping import keyframe as kf_lib
    from mneslam_tpu.mapping.mapper import Mapper, make_optimizer
    from mneslam_tpu.models.scene_rep import SceneRep

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
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
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
    print(f"device={jax.devices()[0]}  K={K}  rays={n_global}+{n_cur}", flush=True)

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
    results = {"n_global": n_global, "n_cur": n_cur}

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

    @jax.jit
    def fwd(p, db, kf_poses, key):
        def body(i, acc):
            return acc + loss_fp32(p, db, kf_poses, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    results["fwd"] = timed("fwd only", fwd, st.params, st.db, st.kf_poses,
                           jax.random.PRNGKey(0))

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

    from mneslam_tpu.models.scene_rep import SceneRep as SR

    class SceneNoPlaneGrad(SR):
        def plane_feature_blocks(self, planes, p_nor):
            return [jax.lax.stop_gradient(b)
                    for b in super().plane_feature_blocks(planes, p_nor)]

    results["fwd_bwd_noplane"] = timed("fwd+bwd, plane feats stop-grad",
                                       make_grad_chain(make_loss(SceneNoPlaneGrad(cfg))),
                                       st.params, st.db, st.kf_poses,
                                       jax.random.PRNGKey(0))

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

    print("\n--- derived (per-device, ray-sharded regime) ---", flush=True)
    print(f"bwd decoder/render/losses: "
          f"{results['fwd_bwd_noplane'] - results['fwd']:.2f} ms", flush=True)
    print(f"plane-gradient path: "
          f"{results['fwd_bwd'] - results['fwd_bwd_noplane']:.2f} ms", flush=True)
    print(f"adam (table-sized): {results['adam']:.2f} ms", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
