"""Backward-pass breakdown of the mapping iteration (fetch-synced).

prof_mapping7 established: full step 15.4 ms, fwd 2.4 ms, plane gathers
fwd+bwd 2.4-3.4 ms, adam 0.2 ms -> ~12 ms unexplained backward. This tool
splits the backward by sub-pipeline, each timed with the chained-fori_loop
marginal protocol (see prof_mapping7 header for why).
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
    print(f"{name:58s} {per:8.2f} ms/rep", flush=True)
    return per


def main():
    from mneslam_tpu.config import make_config
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.models import decoder as decoder_lib
    from mneslam_tpu.models.scene_rep import SceneRep

    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    n_rays, n_samp = 2148, 43
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": 2048, "min_pixels_cur": 100, "iters": 50},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))
    print(f"device={jax.devices()[0]}  pts={n_rays}x{n_samp}", flush=True)

    key = jax.random.PRNGKey(1)
    rays_o = jax.random.uniform(key, (n_rays, 3), minval=-1.0, maxval=1.0)
    rays_d = jax.random.normal(jax.random.fold_in(key, 1), (n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target_rgb = jax.random.uniform(jax.random.fold_in(key, 2), (n_rays, 3))
    target_d = jax.random.uniform(jax.random.fold_in(key, 3), (n_rays, 1),
                                  minval=0.5, maxval=3.0)
    pts_flat = (rays_o[:, None, :] + rays_d[:, None, :]
                * jnp.linspace(0.2, 3.0, n_samp)[None, :, None]).reshape(-1, 3)

    def full_loss(p, key):
        ret = scene.forward(p, rays_o, rays_d, target_rgb, target_d, key=key)
        return scene.get_loss_from_ret(ret)

    def chained_grad(loss_fn, extract):
        def mk(k):
            @jax.jit
            def f(p, key):
                def body(i, p):
                    g = jax.grad(loss_fn)(p, jax.random.fold_in(key, i))
                    return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
                p = jax.lax.fori_loop(0, k, body, p)
                return extract(p)
            return f
        return mk

    ex_planes = lambda p: p["planes"]["xy"][1][0, 0, 0]

    # anchor: full fwd+bwd (prof7 measured ~15.2)
    marginal("[anchor] full loss fwd+bwd", chained_grad(full_loss, ex_planes),
             (params, jax.random.PRNGKey(0)))

    # (a) query pipeline only: grad of sum(raw) at fixed pts
    def query_loss(p, key):
        del key
        return scene.query_color_sdf(p, pts_flat).sum()

    marginal("(a) query_color_sdf fwd+bwd (planes+oneblob+mlp)",
             chained_grad(query_loss, ex_planes), (params, jax.random.PRNGKey(0)))

    # (b) decoder only, fixed embeddings
    embed = jax.random.normal(jax.random.fold_in(key, 4),
                              (n_rays * n_samp, scene.config["model"]["input_ch"]))
    embed_pos = jax.random.uniform(jax.random.fold_in(key, 5),
                                   (n_rays * n_samp, scene.config["model"]["input_ch_pos"]))

    def dec_loss(p, key):
        del key
        return decoder_lib.decoder_apply(p["decoder"], embed, embed_pos).sum()

    marginal("(b) decoder mlp fwd+bwd (fixed embeds)",
             chained_grad(dec_loss, lambda p: p["decoder"]["sdf"][0][0, 0]),
             (params, jax.random.PRNGKey(0)))

    # (c) render+losses bwd only: raw is the variable
    z_vals = jnp.broadcast_to(jnp.linspace(0.2, 3.0, n_samp), (n_rays, n_samp))

    def render_loss(raw, key):
        del key
        rgb_map, disp, acc, weights, depth_map, depth_var = scene.raw2outputs(raw, z_vals)
        t = target_d.reshape(-1)
        valid = ((t > 0) & (t < scene.depth_trunc)).astype(jnp.float32)
        nv = jnp.maximum(valid.sum(), 1.0)
        rgb_loss = jnp.mean(jnp.square(rgb_map - target_rgb))
        depth_loss = jnp.sum(jnp.square(depth_map - t) * valid) / nv
        sdf = raw[..., 3]
        co_fs, co_sdf = scene.co_sdf_losses(z_vals, target_d, sdf)
        trc = scene.config["training"]
        return (trc["rgb_weight"] * rgb_loss + trc["depth_weight"] * depth_loss
                + trc["sdf_weight"] * co_sdf + trc["fs_weight"] * co_fs)

    raw0 = jax.random.normal(jax.random.fold_in(key, 6), (n_rays, n_samp, 4))

    def mk_render(k):
        @jax.jit
        def f(raw, key):
            def body(i, raw):
                g = jax.grad(render_loss)(raw, jax.random.fold_in(key, i))
                return raw - 1e-12 * g
            raw = jax.lax.fori_loop(0, k, body, raw)
            return raw[0, 0, 0]
        return f

    marginal("(c) raw2outputs+losses bwd (raw as var)", mk_render,
             (raw0, jax.random.PRNGKey(0)))

    # (d) full loss but with z-sampling outside grad (fixed z_vals):
    # isolates sample_z_vals/sort/searchsorted from the backward
    def full_fixed_z(p, key):
        del key
        pts = pts_flat
        raw = scene.query_color_sdf(p, pts).reshape(n_rays, n_samp, 4)
        rgb_map, disp, acc, weights, depth_map, depth_var = scene.raw2outputs(raw, z_vals)
        t = target_d.reshape(-1)
        valid = ((t > 0) & (t < scene.depth_trunc)).astype(jnp.float32)
        nv = jnp.maximum(valid.sum(), 1.0)
        rgb_loss = jnp.mean(jnp.square(rgb_map - target_rgb))
        depth_loss = jnp.sum(jnp.square(depth_map - t) * valid) / nv
        sdf = raw[..., 3]
        co_fs, co_sdf = scene.co_sdf_losses(z_vals, target_d, sdf)
        trc = scene.config["training"]
        return (trc["rgb_weight"] * rgb_loss + trc["depth_weight"] * depth_loss
                + trc["sdf_weight"] * co_sdf + trc["fs_weight"] * co_fs)

    marginal("(d) full loss, fixed z (no sampling in grad)",
             chained_grad(full_fixed_z, ex_planes), (params, jax.random.PRNGKey(0)))

    # (e) like (a) but with jax.checkpoint over the query
    def query_ckpt(p, key):
        del key
        return jax.checkpoint(
            lambda q: scene.query_color_sdf(q, pts_flat).sum())(p)

    marginal("(e) query fwd+bwd with remat",
             chained_grad(query_ckpt, ex_planes), (params, jax.random.PRNGKey(0)))

    # (f) plane_features only (prof7 anchor)
    def planes_loss(p, key):
        del key
        return scene.plane_features(p["planes"], scene._normalize(pts_flat)).sum()

    marginal("(f) plane gathers fwd+bwd",
             chained_grad(planes_loss, ex_planes), (params, jax.random.PRNGKey(0)))

    # (g) oneblob encode fwd only at 92k pts (no grad path to params)
    def mk_blob(k):
        @jax.jit
        def f(key):
            def body(i, acc):
                x = scene._normalize01(pts_flat + 1e-9 * i)
                return acc + scene.pos_encode(x).sum()
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    marginal("(g) oneblob fwd only", mk_blob, (jax.random.PRNGKey(0),))


if __name__ == "__main__":
    main()
