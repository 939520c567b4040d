"""Bisect the query_color_sdf backward pathology (prof_mapping8 follow-up).

prof8: query fwd+bwd = 14.3 ms, yet plane-gathers fwd+bwd = 3.0, decoder
fwd+bwd ~ 0, oneblob ~ 0. Something about the COMBINATION is 4x the parts.
Candidates: cotangent structure (ones vs real), pts->embed residuals,
embed_pos concat, per-level concat split, sampler variant.
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

    bound, coarse, fine = 4.0, 0.04, 0.02
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))
    n_pts = 2148 * 43
    key = jax.random.PRNGKey(1)
    # clustered like real ray samples
    rays_o = jax.random.uniform(key, (2148, 3), minval=-1.0, maxval=1.0)
    rays_d = jax.random.normal(jax.random.fold_in(key, 1), (2148, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = (rays_o[:, None] + rays_d[:, None]
           * jnp.linspace(0.2, 3.0, 43)[None, :, None]).reshape(-1, 3)
    print(f"device={jax.devices()[0]}  pts={n_pts}", flush=True)

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

    # (1) anchor: full query pipeline
    def q_full(p, i):
        return scene.query_color_sdf(p, pts + 1e-9 * i).sum()

    marginal("(1) query_color_sdf fwd+bwd", chained(q_full), (params,))

    # (2) planes -> nontrivial elementwise -> sum (no decoder):
    # gives the scatter a non-constant cotangent
    def q_elem(p, i):
        f = scene.plane_features(p["planes"], scene._normalize(pts + 1e-9 * i))
        return jnp.sum(f * f)

    marginal("(2) planes + square-sum (real cotangent)", chained(q_elem), (params,))

    # (3) planes -> sdf MLP only (no oneblob/pos concat)
    W_pad = jax.random.normal(jax.random.fold_in(key, 3),
                              (scene.config["model"]["input_ch_pos"],)) * 0.0

    def q_sdfmlp(p, i):
        f = scene.plane_features(p["planes"], scene._normalize(pts + 1e-9 * i))
        pos = jnp.zeros((f.shape[0], scene.config["model"]["input_ch_pos"]),
                        f.dtype)
        h = decoder_lib.mlp_apply(p["decoder"]["sdf"],
                                  jnp.concatenate([f, pos], axis=-1))
        return h.sum()

    marginal("(3) planes + sdf-mlp (zeros pos)", chained(q_sdfmlp), (params,))

    # (4) planes + REAL oneblob pos + sdf mlp
    def q_sdfmlp_pos(p, i):
        ptsi = pts + 1e-9 * i
        f = scene.plane_features(p["planes"], scene._normalize(ptsi))
        pos = scene.pos_encode(scene._normalize01(ptsi)).astype(f.dtype)
        h = decoder_lib.mlp_apply(p["decoder"]["sdf"],
                                  jnp.concatenate([f, pos], axis=-1))
        return h.sum()

    marginal("(4) planes + oneblob + sdf-mlp", chained(q_sdfmlp_pos), (params,))

    # (5) full decoder but stop_gradient on plane features
    def q_sg(p, i):
        ptsi = pts + 1e-9 * i
        p_nor = scene._normalize(ptsi)
        f = jax.lax.stop_gradient(scene.plane_features(p["planes"], p_nor))
        pos = scene.pos_encode(scene._normalize01(ptsi)).astype(f.dtype)
        raw = decoder_lib.decoder_apply(p["decoder"], f, pos)
        return raw.sum()

    marginal("(5) full decoder, stop-grad planes", chained(q_sg), (params,))

    # (6) query with rows sampler (unpacked 4-gather path)
    import mneslam_tpu.models.scene_rep as sr
    old = sr._PLANE_SAMPLER
    sr._PLANE_SAMPLER = "rows"
    marginal("(6) query fwd+bwd, rows sampler", chained(q_full), (params,))
    sr._PLANE_SAMPLER = old

    # (7) query fwd+bwd at bf16 compute
    def q_bf16(p, i):
        p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        ptsi = (pts + 1e-9 * i).astype(jnp.bfloat16)
        p_nor = scene._normalize(ptsi)
        f = scene.plane_features(p16["planes"], p_nor)
        pos = scene.pos_encode(scene._normalize01(ptsi)).astype(f.dtype)
        raw = decoder_lib.decoder_apply(p16["decoder"], f, pos)
        return raw.sum().astype(jnp.float32)

    marginal("(7) query fwd+bwd, bf16 compute", chained(q_bf16), (params,))


if __name__ == "__main__":
    main()
