"""Compile (no run) the fast prototype chain and the scene-based chain on
the TPU backend and diff their optimized-HLO op histograms — locating the
structural difference behind 5.1 vs 13 ms (prof_scatter2 B vs prof_mapping11).
"""

import collections
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def hist(compiled_text):
    h = collections.Counter()
    for line in compiled_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?[%\w.\-]+ = \S+ ([a-z\-]+)[(.]", line)
        if m:
            h[m.group(1)] += 1
    return h


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
    pn3 = jnp.clip(pts / 4.0, -0.999, 0.999)
    DIMS = (("xy", (0, 1)), ("xz", (0, 2)), ("yz", (1, 2)))

    # ---- scene chain (13 ms) ----
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

    @jax.jit
    def scene_chain(p):
        def body(i, p):
            g = jax.grad(loss_nocat)(p, i)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
        p = jax.lax.fori_loop(0, 10, body, p)
        return p["xy"][1][0, 0, 0]

    # ---- prototype chain (5.1 ms), verbatim structure from prof_scatter2 ----
    C = 32

    def pack_hwc(hwc):
        H, W, _ = hwc.shape
        sx = jnp.concatenate([hwc[:, 1:], hwc[:, -1:]], axis=1)
        sy = jnp.concatenate([hwc[1:], hwc[-1:]], axis=0)
        sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
        return jnp.concatenate([hwc, sx, sy, sxy], axis=-1).reshape(H * W, 4 * C)

    def unpack_hwc(d_packed, H, W):
        d = d_packed.reshape(H, W, 4 * C)
        d00, d01, d10, d11 = (d[..., i * C:(i + 1) * C] for i in range(4))

        def shift_back_x(a):
            z = jnp.zeros_like(a[:, :1])
            main = jnp.concatenate([z, a[:, :-1]], axis=1)
            return main.at[:, -1].add(a[:, -1])

        def shift_back_y(a):
            z = jnp.zeros_like(a[:1])
            main = jnp.concatenate([z, a[:-1]], axis=0)
            return main.at[-1].add(a[-1])

        return d00 + shift_back_x(d01) + shift_back_y(d10 + shift_back_x(d11))

    def coords_weights(pn, H, W):
        x = jnp.clip((pn[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
        y = jnp.clip((pn[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = x - x0; wy = y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        return y0i * W + x0i, wx, wy

    def proto_grad(planes, pn3i):
        feats, meta = {}, {}
        for lvl in range(2):
            acc = None
            for name, dd in DIMS:
                a = planes[name][lvl]
                H, W = a.shape[1], a.shape[2]
                packed = pack_hwc(jnp.transpose(a, (1, 2, 0)))
                idx, wx, wy = coords_weights(pn3i[:, list(dd)], H, W)
                g = packed[idx]
                f = (g[:, 0 * C:1 * C] * ((1 - wx) * (1 - wy))[:, None]
                     + g[:, 1 * C:2 * C] * (wx * (1 - wy))[:, None]
                     + g[:, 2 * C:3 * C] * ((1 - wx) * wy)[:, None]
                     + g[:, 3 * C:4 * C] * (wx * wy)[:, None])
                acc = f if acc is None else acc + f
                meta[(name, lvl)] = (idx, wx, wy, H, W)
            feats[lvl] = acc
        grads = {"xy": [None, None], "xz": [None, None], "yz": [None, None]}
        for lvl in range(2):
            dout = 2.0 * feats[lvl]
            for name, dd in DIMS:
                idx, wx, wy, H, W = meta[(name, lvl)]
                vals = jnp.concatenate([
                    dout * ((1 - wx) * (1 - wy))[:, None],
                    dout * (wx * (1 - wy))[:, None],
                    dout * ((1 - wx) * wy)[:, None],
                    dout * (wx * wy)[:, None],
                ], axis=-1)
                d_packed = jnp.zeros((H * W, 4 * C), vals.dtype).at[idx].add(vals)
                grads[name][lvl] = jnp.transpose(
                    unpack_hwc(d_packed, H, W), (2, 0, 1))
        return grads

    @jax.jit
    def proto_chain(p):
        def body(i, p):
            g = proto_grad(p, pn3 + 1e-9 * i)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
        p = jax.lax.fori_loop(0, 10, body, p)
        return p["xy"][1][0, 0, 0]

    for name, fn in (("scene", scene_chain), ("proto", proto_chain)):
        compiled = fn.lower(params).compile()
        txt = compiled.as_text()
        h = hist(txt)
        print(f"\n=== {name} ===  ({len(txt.splitlines())} HLO lines)")
        for op, n in sorted(h.items(), key=lambda kv: -kv[1]):
            if n >= 3 or op in ("scatter", "gather", "transpose", "copy",
                                "while", "all-reduce"):
                print(f"  {op:28s} {n}")
        open(f"/tmp/hlo_{name}.txt", "w").write(txt)

    # ---- head-to-head timing (the HLO histograms came out identical, so
    # settle whether the 5 vs 13 ms gap was real or measurement noise):
    # both chains run k=10 iterations; interleave many timed fetches ----
    import time

    import numpy as np

    for rnd in range(3):
        for name, fn in (("scene", scene_chain), ("proto", proto_chain)):
            float(np.asarray(fn(params)))  # warm
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(np.asarray(fn(params)))
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts)) * 1e3
            print(f"round {rnd} {name}: {med:7.2f} ms /10 iters "
                  f"= {med / 10:5.2f} ms/iter  (all: "
                  + " ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
