"""Fetch-synced mapping-iteration breakdown (reliable protocol).

block_until_ready returns before execution completes on the remote backend,
so every timed region here is k chained repetitions INSIDE one jitted
fori_loop, ended by a host fetch of a value depending on all the work.
Per-rep cost = (t(k2) - t(k1)) / (k2 - k1), immune to dispatch/RTT floors.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def marginal(name, make_fn, args, reps=(2, 10)):
    ts = []
    for k in reps:
        f = make_fn(k)
        float(np.asarray(f(*args)).ravel()[0])  # warm
        t0 = time.perf_counter()
        for i in range(3):
            float(np.asarray(f(*args)).ravel()[0])
        ts.append((time.perf_counter() - t0) / 3)
    per = (ts[1] - ts[0]) / (reps[1] - reps[0]) * 1e3
    print(f"{name:52s} {per:8.2f} ms/rep", flush=True)
    return per


def main():
    import optax

    from mneslam_tpu.config import make_config
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping import keyframe as kf_lib
    from mneslam_tpu.mapping.mapper import Mapper, make_optimizer
    from mneslam_tpu.models.scene_rep import SceneRep

    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    n_global, n_cur = 2048, 100
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
    params, opt_state, db, kf_poses = (st.params, st.opt_state, st.db, st.kf_poses)
    opt = make_optimizer(cfg)
    print(f"device={jax.devices()[0]}  rays={n_global}+{n_cur}", flush=True)

    dir_flat = frame["direction"].reshape(-1, 3)
    rgb_flat = frame["rgb"].reshape(-1, 3)
    d_flat = frame["depth"].reshape(-1)

    def sample_batch(key):
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

    def loss_from_key(p, key):
        rays_o, rays_d, t_rgb, t_d, k_render = sample_batch(key)
        ret = scene.forward(p, rays_o, rays_d, t_rgb, t_d, key=k_render)
        return scene.get_loss_from_ret(ret)

    # full production step chain
    def mk_full(k):
        @jax.jit
        def f(p, s, key):
            def body(i, c):
                p, s = c
                kk = jax.random.fold_in(key, i)
                loss, g = jax.value_and_grad(loss_from_key)(p, kk)
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s
            import optax
            p, s = jax.lax.fori_loop(0, k, body, (p, s))
            return p["planes"]["xy"][1][0, 0, 0]
        return f

    import optax  # for mk_full closure
    marginal("full step (fwd+bwd+adam)", mk_full, (params, opt.init(params),
                                                   jax.random.PRNGKey(0)))

    # fwd+bwd only (params chained through a tiny SGD so iterations depend)
    def mk_grad(k):
        @jax.jit
        def f(p, key):
            def body(i, p):
                g = jax.grad(loss_from_key)(p, jax.random.fold_in(key, i))
                return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            p = jax.lax.fori_loop(0, k, body, p)
            return p["planes"]["xy"][1][0, 0, 0]
        return f

    marginal("fwd+bwd (sampling incl, sgd-chained)", mk_grad,
             (params, jax.random.PRNGKey(0)))

    # fwd only
    def mk_fwd(k):
        @jax.jit
        def f(p, key):
            def body(i, acc):
                return acc + loss_from_key(p, jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    marginal("fwd only (sampling incl)", mk_fwd, (params, jax.random.PRNGKey(0)))

    # sampling only
    def mk_sample(k):
        @jax.jit
        def f(key):
            def body(i, acc):
                ro, rd, trgb, td, _ = sample_batch(jax.random.fold_in(key, i))
                return acc + ro.sum() + rd.sum() + trgb.sum() + td.sum()
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    marginal("ray sampling only", mk_sample, (jax.random.PRNGKey(0),))

    # adam only (fixed grads, params chained)
    g_fixed = jax.jit(jax.grad(loss_from_key))(params, jax.random.PRNGKey(7))

    def mk_adam(k):
        @jax.jit
        def f(p, s, g):
            def body(i, c):
                p, s = c
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s
            p, s = jax.lax.fori_loop(0, k, body, (p, s))
            return p["planes"]["xy"][1][0, 0, 0]
        return f

    marginal("adam only (fixed grads, chained)", mk_adam,
             (params, opt.init(params), g_fixed))

    # plane gathers fwd+bwd only
    pts = jax.random.uniform(jax.random.PRNGKey(9),
                             (n_global + n_cur, 43, 3),
                             minval=-bound * 0.9, maxval=bound * 0.9)
    pts = pts.reshape(-1, 3)

    def mk_planes(k):
        @jax.jit
        def f(p, key):
            def body(i, p):
                def lf(q):
                    pn = scene._normalize(pts + 1e-6 * i)
                    return scene.plane_features(q["planes"], pn).sum()
                g = jax.grad(lf)(p)
                return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            p = jax.lax.fori_loop(0, k, body, p)
            return p["planes"]["xy"][1][0, 0, 0]
        return f

    marginal("plane gathers fwd+bwd (92k pts)", mk_planes,
             (params, jax.random.PRNGKey(0)))


if __name__ == "__main__":
    main()
