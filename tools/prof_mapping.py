"""Mapping-step component profiler (reference Replica shapes).

Times the pieces of one mapping optimization iteration
(`mapping/mapper.py:optimize`) in isolation on the current backend, to
locate where the per-iteration milliseconds go: plane gathers (fwd/bwd),
decoder MLPs, ray sampling, the loss suite, and the Adam update.

Run on TPU:  python tools/prof_mapping.py
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--rays", type=int, default=2148)
    args = ap.parse_args()

    from mneslam_tpu.config import make_config
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper, make_optimizer
    from mneslam_tpu.models.scene_rep import SceneRep

    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": args.rays - 100, "min_pixels_cur": 100, "iters": 50},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))
    n_samples = scene.n_range_d + scene.n_samples_d
    n_pts = args.rays * n_samples
    print(f"device={jax.devices()[0]}  rays={args.rays}  samples={n_samples}  "
          f"pts={n_pts}  planes: " +
          ", ".join(f"{k}{v}" for k, v in
                    [("coarse", scene.plane_shapes[0]["xy"]),
                     ("fine", scene.plane_shapes[1]["xy"])]))

    R = args.reps
    keys = [jax.random.PRNGKey(i) for i in range(R)]

    def rand_pts(k):
        return jax.random.uniform(k, (n_pts, 3), minval=-bound * 0.9,
                                  maxval=bound * 0.9)

    pts_list = [(params, rand_pts(k)) for k in keys]

    # --- plane feature gathers ---
    @jax.jit
    def pf_fwd(p, pts):
        return scene.plane_features(p["planes"], scene._normalize(pts)).sum()

    timeit("plane_features fwd (6 planes)", pf_fwd, pts_list)

    @jax.jit
    def pf_bwd(p, pts):
        g = jax.grad(lambda q: scene.plane_features(
            q["planes"], scene._normalize(pts)).sum())(p)
        return g["planes"]["xy"][1]

    timeit("plane_features fwd+bwd", pf_bwd, pts_list)

    # --- full point query (gathers + OneBlob + MLPs) ---
    @jax.jit
    def q_fwd(p, pts):
        return scene.query_color_sdf(p, pts).sum()

    timeit("query_color_sdf fwd", q_fwd, pts_list)

    @jax.jit
    def q_bwd(p, pts):
        g = jax.grad(lambda q: scene.query_color_sdf(q, pts).sum())(p)
        return g["planes"]["xy"][1]

    timeit("query_color_sdf fwd+bwd", q_bwd, pts_list)

    # --- full forward (sampling + query + render + losses) ---
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=bound * 0.9)
    item = ds[0]
    dirs = jnp.asarray(np.asarray(item["direction"]).reshape(-1, 3))
    rgbf = jnp.asarray(np.asarray(item["rgb"]).reshape(-1, 3))
    df = jnp.asarray(np.asarray(item["depth"]).reshape(-1))
    sel = np.random.default_rng(0).integers(0, dirs.shape[0], args.rays)
    c2w = jnp.asarray(item["c2w"])
    rays_o = jnp.broadcast_to(c2w[:3, 3], (args.rays, 3))
    rays_d = dirs[sel] @ c2w[:3, :3].T
    t_rgb, t_d = rgbf[sel], df[sel][:, None]

    def loss_fn(p, k):
        ret = scene.forward(p, rays_o, rays_d, t_rgb, t_d, key=k)
        return scene.get_loss_from_ret(ret)

    fwd_list = [(params, k) for k in keys]
    timeit("forward+losses fwd", jax.jit(loss_fn), fwd_list)

    @jax.jit
    def loss_bwd(p, k):
        g = jax.grad(loss_fn)(p, k)
        return g["planes"]["xy"][1]

    timeit("forward+losses fwd+bwd", loss_bwd, fwd_list)

    # --- optimizer update alone ---
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def adam_step(p, s):
        grads = jax.tree.map(jnp.ones_like, p)
        updates, s = opt.update(grads, s, p)
        import optax
        return optax.apply_updates(p, updates), s

    timeit("adam update alone", adam_step, [(params, opt_state)] * R)

    # --- one full mapper iteration (sampling from DB + step) ---
    mapper = Mapper(cfg, scene, num_kf=8, rays_per_kf=ds.num_rays_to_save)
    mstate = mapper.init_state(jax.random.PRNGKey(2))
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    mstate = mapper.add_keyframe(mstate, jnp.asarray(0), frame, c2w,
                                 jax.random.PRNGKey(3))

    def one_iter(st, k):
        st2, _ = mapper.optimize(st, frame, c2w, k, iters=1)
        return st2.params["planes"]["xy"][1]

    timeit("mapper.optimize 1 iter", one_iter, [(mstate, k) for k in keys])

    def ten_iter(st, k):
        st2, _ = mapper.optimize(st, frame, c2w, k, iters=10)
        return st2.params["planes"]["xy"][1]

    timeit("mapper.optimize amortized (10 iters)", ten_iter,
           [(mstate, k) for k in keys[:4]], inner=10)


if __name__ == "__main__":
    main()
