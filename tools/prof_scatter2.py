"""End-to-end plane_features fwd+bwd prototypes (fetch-synced marginals).

Anchor: the current autodiff packed sampler (~22 ms with real cotangent,
prof_mapping9 (2)). Prototypes re-express the whole sampler as a custom
VJP over (B) CHW storage, (C) HWC storage (no per-iter transposes),
(D) HWC + bf16 scatter, (E) HWC + ONE fused scatter over all 6 planes.
Loss = 0.5*sum(feats^2) so the cotangent is a real array.
"""

import sys
import time
from functools import partial

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


C = 32
SHAPES = {"fine": (401, 401), "coarse": (201, 201)}
DIMS = {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}


def pack_hwc(hwc):
    """[H, W, C] -> [H*W, 4C] corner table, no transposes."""
    H, W, _ = hwc.shape
    sx = jnp.concatenate([hwc[:, 1:], hwc[:, -1:]], axis=1)
    sy = jnp.concatenate([hwc[1:], hwc[-1:]], axis=0)
    sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
    return jnp.concatenate([hwc, sx, sy, sxy], axis=-1).reshape(H * W, 4 * C)


def unpack_hwc(d_packed, H, W):
    """Adjoint of pack_hwc: [H*W, 4C] -> [H, W, C]."""
    d = d_packed.reshape(H, W, 4 * C)
    d00, d01, d10, d11 = (d[..., i * C:(i + 1) * C] for i in range(4))

    def shift_back_x(a):  # adjoint of [:,1:] + duplicated last col
        z = jnp.zeros_like(a[:, :1])
        main = jnp.concatenate([z, a[:, :-1]], axis=1)
        return main.at[:, -1].add(a[:, -1])

    def shift_back_y(a):
        z = jnp.zeros_like(a[:1])
        main = jnp.concatenate([z, a[:-1]], axis=0)
        return main.at[-1].add(a[-1])

    out = d00
    out = out + shift_back_x(d01)
    out = out + shift_back_y(d10)
    out = out + shift_back_y(shift_back_x(d11))
    return out


def coords_weights(pn, H, W):
    x = jnp.clip((pn[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((pn[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = x - x0; wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    return y0i * W + x0i, wx, wy


def sample_packed(packed, idx, wx, wy):
    g = packed[idx]
    return (g[:, 0 * C:1 * C] * ((1 - wx) * (1 - wy))[:, None]
            + g[:, 1 * C:2 * C] * (wx * (1 - wy))[:, None]
            + g[:, 2 * C:3 * C] * ((1 - wx) * wy)[:, None]
            + g[:, 3 * C:4 * C] * (wx * wy)[:, None]), g


def corner_vals(dout, wx, wy):
    return jnp.concatenate([
        dout * ((1 - wx) * (1 - wy))[:, None],
        dout * (wx * (1 - wy))[:, None],
        dout * ((1 - wx) * wy)[:, None],
        dout * (wx * wy)[:, None],
    ], axis=-1)


def make_manual(layout="hwc", scatter_dtype=None, fused=False):
    """Returns loss_grad(planes, pn3) -> grad pytree. planes: dict
    {lvl: {orient: array}}, HWC or CHW layout. pn3 [N,3] in [-1,1]."""

    def fwd_all(planes, pn3):
        feats = {}
        meta = {}
        for lvl in ("fine", "coarse"):
            H, W = SHAPES[lvl]
            acc = None
            for o, dd in DIMS.items():
                a = planes[lvl][o]
                hwc = a if layout == "hwc" else jnp.transpose(a, (1, 2, 0))
                packed = pack_hwc(hwc)
                idx, wx, wy = coords_weights(pn3[:, list(dd)], H, W)
                f, g = sample_packed(packed, idx, wx, wy)
                acc = f if acc is None else acc + f
                meta[(lvl, o)] = (idx, wx, wy)
            feats[lvl] = acc
        return feats, meta

    def loss_grad(planes, pn3):
        feats, meta = fwd_all(planes, pn3)
        # cotangent of 0.5*sum(f^2) is f itself
        grads = {"fine": {}, "coarse": {}}
        if fused:
            all_vals, all_idx = [], []
            offsets = {}
            off = 0
            for lvl in ("fine", "coarse"):
                H, W = SHAPES[lvl]
                for o in DIMS:
                    idx, wx, wy = meta[(lvl, o)]
                    all_vals.append(corner_vals(feats[lvl], wx, wy))
                    all_idx.append(idx + off)
                    offsets[(lvl, o)] = (off, H, W)
                    off += H * W
            vals = jnp.concatenate(all_vals, 0)
            idxc = jnp.concatenate(all_idx, 0)
            if scatter_dtype is not None:
                vals = vals.astype(scatter_dtype)
            big = jnp.zeros((off, 4 * C), vals.dtype).at[idxc].add(vals)
            for (lvl, o), (off0, H, W) in offsets.items():
                d_packed = big[off0:off0 + H * W].astype(jnp.float32)
                g = unpack_hwc(d_packed, H, W)
                grads[lvl][o] = g if layout == "hwc" else jnp.transpose(g, (2, 0, 1))
        else:
            for lvl in ("fine", "coarse"):
                H, W = SHAPES[lvl]
                for o in DIMS:
                    idx, wx, wy = meta[(lvl, o)]
                    vals = corner_vals(feats[lvl], wx, wy)
                    if scatter_dtype is not None:
                        vals = vals.astype(scatter_dtype)
                    d_packed = (jnp.zeros((H * W, 4 * C), vals.dtype)
                                .at[idx].add(vals).astype(jnp.float32))
                    g = unpack_hwc(d_packed, H, W)
                    grads[lvl][o] = g if layout == "hwc" else jnp.transpose(g, (2, 0, 1))
        return grads

    return loss_grad


def main():
    n_pts = 2148 * 43
    key = jax.random.PRNGKey(1)
    rays_o = jax.random.uniform(key, (2148, 3), minval=-1.0, maxval=1.0)
    rays_d = jax.random.normal(jax.random.fold_in(key, 1), (2148, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = (rays_o[:, None] + rays_d[:, None]
           * jnp.linspace(0.2, 3.0, 43)[None, :, None]).reshape(-1, 3)
    pn3 = jnp.clip(pts / 4.0, -0.999, 0.999)
    print(f"device={jax.devices()[0]}  pts={n_pts}", flush=True)

    def init_planes(layout):
        p = {}
        for lvl, (H, W) in SHAPES.items():
            p[lvl] = {}
            for i, o in enumerate(DIMS):
                k = jax.random.fold_in(key, hash((lvl, o)) % 1000)
                shape = (H, W, C) if layout == "hwc" else (C, H, W)
                p[lvl][o] = jax.random.normal(k, shape) * 0.01
        return p

    def chained(grad_fn, planes):
        def mk(k):
            @jax.jit
            def f(p):
                def body(i, p):
                    g = grad_fn(p, pn3 + 1e-9 * i)
                    return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
                p = jax.lax.fori_loop(0, k, body, p)
                return jax.tree.leaves(p)[0].ravel()[0]
            return f
        return mk

    # (A) autodiff anchor over the same manual forward, CHW
    def auto_loss(planes, pn3):
        lg = make_manual(layout="chw")
        feats, _ = None, None
        # rebuild fwd inline for autodiff
        total = 0.0
        for lvl in ("fine", "coarse"):
            H, W = SHAPES[lvl]
            acc = None
            for o, dd in DIMS.items():
                hwc = jnp.transpose(planes[lvl][o], (1, 2, 0))
                packed = pack_hwc(hwc)
                idx, wx, wy = coords_weights(pn3[:, list(dd)], H, W)
                f, _ = sample_packed(packed, idx, wx, wy)
                acc = f if acc is None else acc + f
            total = total + 0.5 * jnp.sum(acc * acc)
        return total

    p_chw = init_planes("chw")
    p_hwc = init_planes("hwc")

    marginal("(A) autodiff, CHW (anchor)",
             chained(jax.grad(auto_loss), p_chw), (p_chw,))

    marginal("(B) manual VJP, CHW",
             chained(make_manual("chw"), p_chw), (p_chw,))

    marginal("(C) manual VJP, HWC (no transposes)",
             chained(make_manual("hwc"), p_hwc), (p_hwc,))

    marginal("(D) manual VJP, HWC + bf16 scatter",
             chained(make_manual("hwc", scatter_dtype=jnp.bfloat16), p_hwc),
             (p_hwc,))

    marginal("(E) manual VJP, HWC + fused fp32 scatter",
             chained(make_manual("hwc", fused=True), p_hwc), (p_hwc,))

    marginal("(F) manual VJP, HWC + fused bf16 scatter",
             chained(make_manual("hwc", fused=True, scatter_dtype=jnp.bfloat16),
                     p_hwc), (p_hwc,))


if __name__ == "__main__":
    main()
