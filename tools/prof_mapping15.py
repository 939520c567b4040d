"""Sampler-VJP variant shootout at the L1 probe (the smallest program that
reproduces the full-context plane-backward blowup: prof_mapping13 L0 4.9 ->
L1 16.1 ms/iter).

The [H*W, 4, C] sublane-table rewrite measured 4x SLOWER end-to-end
((1,4,C) slab gathers are pathological), so the gather table stays
[H*W, 4C].  These variants change ONLY the backward:

  A_current    lane-concat vals [N, 4C] + one scatter      (shipped)
  C_noscatter  d_plane = 0 (no vals/scatter/adjoint)       lower bound
  D_reshape    vals = (dout[:,None,:]*w4[:,:,None]).reshape(N, 4C)
  E_rowconcat  vals = row-concat [4N, C]; scatter into [4*HW, C]
  F_four       4 separate [N, C] scatters into 4 [HW, C] tables
  G_bf16vals   A with vals+table in bf16 (grads cast back to f32)

plus B_doutrand: the L0 loss with a random (non-unit) cotangent — tests
whether dout-dependence alone (no MLP) triggers the blowup.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K, N_WALL = 40, 5


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


def make_variant(bwd_kind):
    """A custom-vjp sampler matching sample_plane_packed's forward."""
    from mneslam_tpu.ops import interp

    @jax.custom_vjp
    def sampler(plane, coords):
        out, _ = interp._sample_plane_fwd_impl(plane, coords)
        return out

    def fwd(plane, coords):
        out, (g, wx, wy, idx) = interp._sample_plane_fwd_impl(plane, coords)
        return out, (g, wx, wy, idx, coords, plane)

    def bwd(res, dout):
        g, wx, wy, idx, coords, plane = res
        C, H, W = plane.shape
        dout = dout.astype(plane.dtype)
        w00 = (1 - wx) * (1 - wy)
        w01 = wx * (1 - wy)
        w10 = (1 - wx) * wy
        w11 = wx * wy

        if bwd_kind == "noscatter":
            d_plane = jnp.zeros_like(plane)
        elif bwd_kind == "reshape":
            w4 = jnp.stack([w00, w01, w10, w11], axis=1)       # [N, 4]
            vals = (w4[:, :, None] * dout[:, None, :]).reshape(-1, 4 * C)
            d_packed = jnp.zeros((H * W, 4 * C), vals.dtype).at[idx].add(vals)
            d_plane = interp._unpack_corners_adjoint(d_packed, C, H, W)
        elif bwd_kind == "rowconcat":
            vals = jnp.concatenate([dout * w00[:, None], dout * w01[:, None],
                                    dout * w10[:, None], dout * w11[:, None]],
                                   axis=0)                     # [4N, C]
            HW = H * W
            idx4 = jnp.concatenate([idx, idx + HW, idx + 2 * HW, idx + 3 * HW])
            d_tab = jnp.zeros((4 * HW, C), vals.dtype).at[idx4].add(vals)
            d = d_tab.reshape(4, H, W, C)
            d_plane = _adjoint_from_corners(d[0], d[1], d[2], d[3])
        elif bwd_kind == "four":
            HW = H * W
            tabs = [jnp.zeros((HW, C), dout.dtype).at[idx].add(dout * w[:, None])
                    for w in (w00, w01, w10, w11)]
            d = [t.reshape(H, W, C) for t in tabs]
            d_plane = _adjoint_from_corners(d[0], d[1], d[2], d[3])
        elif bwd_kind == "bf16vals":
            db = dout.astype(jnp.bfloat16)
            vals = jnp.concatenate([
                db * w00.astype(jnp.bfloat16)[:, None],
                db * w01.astype(jnp.bfloat16)[:, None],
                db * w10.astype(jnp.bfloat16)[:, None],
                db * w11.astype(jnp.bfloat16)[:, None]], axis=-1)
            d_packed = jnp.zeros((H * W, 4 * C), jnp.bfloat16).at[idx].add(vals)
            d_plane = interp._unpack_corners_adjoint(
                d_packed, C, H, W).astype(plane.dtype)
        else:
            raise ValueError(bwd_kind)
        d_coords = jnp.zeros_like(coords)
        return d_plane, d_coords

    def _adjoint_from_corners(d00, d01, d10, d11):
        def shift_back_x(a):
            main = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
            return main.at[:, -1].add(a[:, -1])

        def shift_back_y(a):
            main = jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)
            return main.at[-1].add(a[-1])

        out = d00 + shift_back_x(d01) + shift_back_y(d10 + shift_back_x(d11))
        return jnp.transpose(out, (2, 0, 1))

    sampler.defvjp(fwd, bwd)
    return sampler


def main():
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.mapping import keyframe as kf_lib
    from mneslam_tpu.models import decoder as decoder_lib
    from mneslam_tpu.ops import interp
    from tools.prof_mapping12 import build

    cfg, scene, mapper, st, frame, c2w = build()
    H, W = frame["depth"].shape
    n_global, n_cur = 2048, 100
    dir_flat = frame["direction"].reshape(-1, 3)
    rgb_flat = frame["rgb"].reshape(-1, 3)
    d_flat = frame["depth"].reshape(-1)
    print(f"device={jax.devices()[0]}  K={K}", flush=True)

    def sample_batch(db, kf_poses, key):
        k_db, k_cur, k_render = jax.random.split(key, 3)
        g_rays, slot_ids = kf_lib.sample_global_rays(db, k_db, n_global)
        g_poses = kf_poses[slot_ids]
        g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3], g_poses)
        idx = jax.random.randint(k_cur, (n_cur,), 0, H * W)
        c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], c2w)
        rays_o = jnp.concatenate([g_o, c_o], axis=0)
        rays_d = jnp.concatenate([g_d, c_d], axis=0)
        t_d = jnp.concatenate([g_rays[:, 6], d_flat[idx]], axis=0)[:, None]
        return rays_o, rays_d, t_d, k_render

    def geom(db, kf_poses, key):
        rays_o, rays_d, t_d, k_render = sample_batch(db, kf_poses, key)
        z_vals = scene.sample_z_vals(t_d, rays_o.shape[0], k_render)
        return (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)

    def loss_L1(p, db, kf_poses, key):
        pts = geom(db, kf_poses, key)
        blocks = scene.plane_feature_blocks(p["planes"], scene._normalize(pts))
        pos = scene.pos_encode(scene._normalize01(pts)).astype(blocks[0].dtype)
        h = decoder_lib.mlp_apply_blocks(p["decoder"]["sdf"], [*blocks, pos])
        return h.sum()

    def loss_B(p, db, kf_poses, key):
        """L0 with a random per-element cotangent (no MLP)."""
        pts = geom(db, kf_poses, key)
        blocks = scene.plane_feature_blocks(p["planes"], scene._normalize(pts))
        tot = 0.0
        for i, b in enumerate(blocks):
            r = jax.random.normal(jax.random.fold_in(key, 50 + i), b.shape,
                                  dtype=b.dtype)
            tot = tot + (b * r).sum()
        return tot

    def make_bwd_probe(loss_fn):
        @jax.jit
        def g(p, db, kf_poses, key):
            def body(i, p):
                gg = jax.grad(loss_fn)(p, db, kf_poses, jax.random.fold_in(key, i))
                return jax.tree.map(lambda a, b: a - 1e-12 * b.astype(a.dtype), p, gg)
            p = jax.lax.fori_loop(0, K, body, p)
            return p["decoder"]["sdf"][0][0, 0] + p["planes"]["xy"][1][0, 0, 0]
        return g

    args = (st.params, st.db, st.kf_poses, jax.random.PRNGKey(0))
    results = {}
    orig = interp.sample_plane_packed

    results["A_current"] = timed("A: current lane-concat VJP",
                                 make_bwd_probe(loss_L1), *args)
    results["B_doutrand"] = timed("B: L0 + random cotangent (no MLP)",
                                  make_bwd_probe(loss_B), *args)
    for kind in ("noscatter", "reshape", "rowconcat", "four", "bf16vals"):
        try:
            interp.sample_plane_packed = make_variant(kind)
            results[kind] = timed(f"{kind} VJP", make_bwd_probe(loss_L1), *args)
        finally:
            interp.sample_plane_packed = orig

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
