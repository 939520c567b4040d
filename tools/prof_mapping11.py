"""Close the last gap: scene no-concat plane fwd+bwd (12.9 ms) vs the
hand-written prototype (5.1 ms). Same shapes, same ops on paper — bisect
jax.grad mechanics, custom-VJP residuals/coord-grads, and the scene
normalize path.
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
    from mneslam_tpu.models.scene_rep import SceneRep
    from mneslam_tpu.ops import interp

    bound, coarse, fine = 4.0, 0.04, 0.02
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))["planes"]
    key = jax.random.PRNGKey(1)
    rays_o = jax.random.uniform(key, (2148, 3), minval=-1.0, maxval=1.0)
    rays_d = jax.random.normal(jax.random.fold_in(key, 1), (2148, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = (rays_o[:, None] + rays_d[:, None]
           * jnp.linspace(0.2, 3.0, 43)[None, :, None]).reshape(-1, 3)
    print(f"device={jax.devices()[0]}  pts={pts.shape[0]}", flush=True)

    DIMS = (("xy", (0, 1)), ("xz", (0, 2)), ("yz", (1, 2)))
    ex = lambda p: p["xy"][1][0, 0, 0]

    def chained(grad_fn):
        def mk(k):
            @jax.jit
            def f(p):
                def body(i, p):
                    g = grad_fn(p, i)
                    return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
                p = jax.lax.fori_loop(0, k, body, p)
                return ex(p)
            return f
        return mk

    # (1) anchor: jax.grad over custom-VJP samplers, no concat
    def loss_nocat(planes, i):
        pn = scene._normalize(pts + 1e-9 * i)
        total = 0.0
        for lvl in range(2):
            acc = None
            for name, dd in DIMS:
                f = interp.sample_plane_packed(planes[name][lvl], pn[:, list(dd)])
                acc = f if acc is None else acc + f
            total = total + jnp.sum(acc * acc)
        return total

    marginal("(1) jax.grad over custom VJP", chained(jax.grad(loss_nocat)),
             (params,))

    # (2) hand-written direct grad (prototype-structure) on scene params
    def direct_grad(planes, i):
        pn = scene._normalize(pts + 1e-9 * i)
        feats, meta = {}, {}
        for lvl in range(2):
            acc = None
            for name, dd in DIMS:
                out, (g, wx, wy, idx) = interp._sample_plane_fwd_impl(
                    planes[name][lvl], pn[:, list(dd)])
                acc = out if acc is None else acc + out
                meta[(name, lvl)] = (wx, wy, idx)
            feats[lvl] = acc
        grads = {"xy": [None, None], "xz": [None, None], "yz": [None, None]}
        for lvl in range(2):
            dout = 2.0 * feats[lvl]
            for name, dd in DIMS:
                wx, wy, idx = meta[(name, lvl)]
                C, H, W = planes[name][lvl].shape
                vals = jnp.concatenate([
                    dout * ((1 - wx) * (1 - wy))[:, None],
                    dout * (wx * (1 - wy))[:, None],
                    dout * ((1 - wx) * wy)[:, None],
                    dout * (wx * wy)[:, None],
                ], axis=-1)
                d_packed = jnp.zeros((H * W, 4 * C), vals.dtype).at[idx].add(vals)
                grads[name][lvl] = interp._unpack_corners_adjoint(d_packed, C, H, W)
        return grads

    marginal("(2) hand-written direct grad, scene params",
             chained(direct_grad), (params,))

    # (3) jax.grad over a no-coord-grad custom VJP (g not in residuals)
    @jax.custom_vjp
    def sample_nc(plane, coords):
        out, _ = interp._sample_plane_fwd_impl(plane, coords)
        return out

    def sample_nc_fwd(plane, coords):
        out, (g, wx, wy, idx) = interp._sample_plane_fwd_impl(plane, coords)
        return out, (wx, wy, idx, plane, coords)

    def sample_nc_bwd(res, dout):
        wx, wy, idx, plane, coords = res
        C, H, W = plane.shape
        dout = dout.astype(plane.dtype)
        vals = jnp.concatenate([
            dout * ((1 - wx) * (1 - wy))[:, None],
            dout * (wx * (1 - wy))[:, None],
            dout * ((1 - wx) * wy)[:, None],
            dout * (wx * wy)[:, None],
        ], axis=-1)
        d_packed = jnp.zeros((H * W, 4 * C), vals.dtype).at[idx].add(vals)
        return (interp._unpack_corners_adjoint(d_packed, C, H, W),
                jnp.zeros_like(coords))

    sample_nc.defvjp(sample_nc_fwd, sample_nc_bwd)

    def loss_nc(planes, i):
        pn = scene._normalize(pts + 1e-9 * i)
        total = 0.0
        for lvl in range(2):
            acc = None
            for name, dd in DIMS:
                f = sample_nc(planes[name][lvl], pn[:, list(dd)])
                acc = f if acc is None else acc + f
            total = total + jnp.sum(acc * acc)
        return total

    marginal("(3) jax.grad, custom VJP w/o coord grads",
             chained(jax.grad(loss_nc)), (params,))


if __name__ == "__main__":
    main()
