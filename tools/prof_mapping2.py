"""Finer-grained mapping-iteration profile: where do the non-math ms go?

Companion to prof_mapping.py — isolates ray sampling, the grad step with
sampling included, and the optimizer variants, to explain the gap between
forward+backward math (~9 ms) and the full iteration (~17 ms).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(name, f, args_list, inner=1):
    out = f(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list:
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / (len(args_list) * inner) * 1e3
    print(f"{name:52s} {ms:8.2f} ms")
    return ms


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
    mstate = mapper.init_state(jax.random.PRNGKey(2))
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    c2w = jnp.asarray(ds[0]["c2w"])
    mstate = mapper.add_keyframe(mstate, jnp.asarray(0), frame, c2w,
                                 jax.random.PRNGKey(3))
    params, opt_state, db, kf_poses = (mstate.params, mstate.opt_state,
                                       mstate.db, mstate.kf_poses)
    print(f"device={jax.devices()[0]}  rays={n_global}+{n_cur}")

    R = 12
    keys = [jax.random.PRNGKey(i) for i in range(R)]
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

    timeit("ray sampling alone", jax.jit(lambda k: sample_batch(k)[0].sum()),
           [(k,) for k in keys])

    def loss_from_key(p, key):
        rays_o, rays_d, t_rgb, t_d, k_render = sample_batch(key)
        ret = scene.forward(p, rays_o, rays_d, t_rgb, t_d, key=k_render)
        return scene.get_loss_from_ret(ret)

    timeit("sample+fwd", jax.jit(loss_from_key), [(params, k) for k in keys])

    @jax.jit
    def grad_step(p, key):
        g = jax.grad(loss_from_key)(p, key)
        return g["planes"]["xy"][1]

    timeit("sample+fwd+bwd", grad_step, [(params, k) for k in keys])

    # optimizer variants applied to real grads
    opt_multi = make_optimizer(cfg)
    opt_plain = optax.adam(0.01, b1=0.9, b2=0.99, eps=1e-15)
    s_multi = opt_multi.init(params)
    s_plain = opt_plain.init(params)

    @jax.jit
    def step_multi(p, s, key):
        loss, g = jax.value_and_grad(loss_from_key)(p, key)
        u, s = opt_multi.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    timeit("full step (multi_transform adam)", step_multi,
           [(params, s_multi, k) for k in keys])

    @jax.jit
    def step_plain(p, s, key):
        loss, g = jax.value_and_grad(loss_from_key)(p, key)
        u, s = opt_plain.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    timeit("full step (plain adam)", step_plain,
           [(params, s_plain, k) for k in keys])

    @jax.jit
    def step_sgd(p, key):
        loss, g = jax.value_and_grad(loss_from_key)(p, key)
        return jax.tree.map(lambda a, b: a - 0.01 * b, p, g), loss

    timeit("full step (sgd)", step_sgd, [(params, k) for k in keys])

    # donated full step (buffer reuse for params + opt state)
    step_multi_don = jax.jit(step_multi.__wrapped__, donate_argnums=(0, 1))
    p2 = jax.tree.map(jnp.copy, params)
    s2 = opt_multi.init(p2)
    out = step_multi_don(p2, s2, keys[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in keys[1:]:
        out = step_multi_don(out[0], out[1], k)
    jax.block_until_ready(out)
    print(f"{'full step (multi adam, donated)':52s} "
          f"{(time.perf_counter() - t0) / (R - 1) * 1e3:8.2f} ms")

    # the actual production program
    def ten_iter(st, k):
        st2, _ = mapper.optimize(st, frame, c2w, k, iters=10)
        return st2.params["planes"]["xy"][1]

    timeit("mapper.optimize amortized (10 iters)", ten_iter,
           [(mstate, k) for k in keys[:4]], inner=10)

    # adam update cost with REAL grad layout, fp32 vs bf16 moments
    g_real = jax.jit(jax.grad(loss_from_key))(params, keys[0])

    @jax.jit
    def upd_multi(p, s, g):
        u, s = opt_multi.update(g, s, p)
        return optax.apply_updates(p, u), s

    timeit("opt update only (multi_transform)", upd_multi,
           [(params, s_multi, g_real)] * R)

    @jax.jit
    def upd_plain(p, s, g):
        u, s = opt_plain.update(g, s, p)
        return optax.apply_updates(p, u), s

    timeit("opt update only (plain adam)", upd_plain,
           [(params, s_plain, g_real)] * R)


if __name__ == "__main__":
    main()
