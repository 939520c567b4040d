"""Post-custom-VJP follow-up: where does the in-context backward time go?

prof_scatter2 said the whole plane fwd+bwd should be ~5 ms, yet the full
mapping step is still ~16 ms (prof_mapping7 re-run). Re-measure the
isolated pieces with the custom-VJP sampler in place, plus ablations that
differ between the fast prototype and the production path.
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
    from mneslam_tpu.models import decoder as decoder_lib
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
    params = scene.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rays_o = jax.random.uniform(key, (2148, 3), minval=-1.0, maxval=1.0)
    rays_d = jax.random.normal(jax.random.fold_in(key, 1), (2148, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = (rays_o[:, None] + rays_d[:, None]
           * jnp.linspace(0.2, 3.0, 43)[None, :, None]).reshape(-1, 3)
    print(f"device={jax.devices()[0]}  pts={pts.shape[0]}  "
          f"sampler=custom-vjp", flush=True)

    ex = lambda p: p["planes"]["xy"][1][0, 0, 0]

    def chained(loss_fn, extract=ex):
        def mk(k):
            @jax.jit
            def f(p):
                def body(i, p):
                    g = jax.grad(loss_fn)(p, i)
                    return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
                p = jax.lax.fori_loop(0, k, body, p)
                return extract(p)
            return f
        return mk

    # (1) query pipeline, varied pts
    def q_full(p, i):
        return scene.query_color_sdf(p, pts + 1e-9 * i).sum()

    marginal("(1) query_color_sdf fwd+bwd", chained(q_full), (params,))

    # (2) planes + square-sum via scene.plane_features
    def q_elem(p, i):
        f = scene.plane_features(p["planes"], scene._normalize(pts + 1e-9 * i))
        return jnp.sum(f * f)

    marginal("(2) scene planes + square-sum", chained(q_elem), (params,))

    # (3) like (2) but no level concat: per-level losses
    def q_nocat(p, i):
        pn = scene._normalize(pts + 1e-9 * i)
        total = 0.0
        for lvl in range(2):
            acc = None
            for name, dd in (("xy", (0, 1)), ("xz", (0, 2)), ("yz", (1, 2))):
                f = interp.sample_plane_packed(p["planes"][name][lvl],
                                               pn[:, list(dd)])
                acc = f if acc is None else acc + f
            total = total + jnp.sum(acc * acc)
        return total

    marginal("(3) planes + square-sum, no level concat", chained(q_nocat),
             (params,))

    # (4) static coords (idx arithmetic hoistable)
    def q_static(p, i):
        del i
        f = scene.plane_features(p["planes"], scene._normalize(pts))
        return jnp.sum(f * f)

    marginal("(4) planes + square-sum, static coords", chained(q_static),
             (params,))

    # (5) query with decoder but pos encoding zeroed (concat still present)
    def q_nopos(p, i):
        pn = scene._normalize(pts + 1e-9 * i)
        f = scene.plane_features(p["planes"], pn)
        pos = jnp.zeros((f.shape[0], scene.input_ch_pos), f.dtype)
        raw = decoder_lib.decoder_apply(p["decoder"], f, pos)
        return raw.sum()

    marginal("(5) planes + decoder, zero pos-enc", chained(q_nopos), (params,))


if __name__ == "__main__":
    main()
