"""Bisection ladder for the full-context plane-backward blowup.

prof_mapping12 (round 3) found: plane scatter+adjoint is 1.85 ms isolated
but the plane-gradient path costs 12.5 ms inside the full fwd+bwd — the
extra ~10 ms appears only when the plane cotangent flows from the full
render chain.  This tool climbs a ladder from the isolated probe to the
production loss, one structural ingredient at a time, fwd and fwd+bwd each
(direct protocol: K-chained fori_loop, median of 5 fetch-synced walls).

  L0  sum(plane blocks)                       (the isolated probe)
  L1  + sdf-head MLP (blocks + OneBlob pos encoding) -> sum(h)
  L2  + full decoder (color head too) -> sum(raw)
  L3  + reshape to rays + raw2outputs -> sum(rgb_map)+sum(depth_map)
  L4  + rgb/depth losses vs targets (no sdf losses)
  L5  + co_sdf + eslam sdf losses  (== production forward)
  R   L5 with jax.checkpoint around query_color_sdf (remat probe)
  Z   L5 with d_coords zeroed in the sampler VJP (DCE probe)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K = 40
N_WALL = 5


def timed(name, fn, *args):
    float(np.asarray(fn(*args)).ravel()[0])  # warm
    walls = []
    for _ in range(N_WALL):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        walls.append(time.perf_counter() - t0)
    per = float(np.median(walls)) / K * 1e3
    print(f"{name:44s} {per:8.2f} ms/iter", flush=True)
    return per


def main():
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.mapping import keyframe as kf_lib
    from mneslam_tpu.models import decoder as decoder_lib
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
        t_rgb = jnp.concatenate([g_rays[:, 3:6], rgb_flat[idx]], axis=0)
        t_d = jnp.concatenate([g_rays[:, 6], d_flat[idx]], axis=0)[:, None]
        return rays_o, rays_d, t_rgb, t_d, k_render

    def geom(db, kf_poses, key):
        rays_o, rays_d, t_rgb, t_d, k_render = sample_batch(db, kf_poses, key)
        z_vals = scene.sample_z_vals(t_d, rays_o.shape[0], k_render)
        pts = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)
        return pts, z_vals, t_rgb, t_d

    R = n_global + n_cur

    def loss_L0(p, db, kf_poses, key):
        pts, _, _, _ = geom(db, kf_poses, key)
        blocks = scene.plane_feature_blocks(p["planes"], scene._normalize(pts))
        return sum(b.sum() for b in blocks)

    def loss_L1(p, db, kf_poses, key):
        pts, _, _, _ = geom(db, kf_poses, key)
        blocks = scene.plane_feature_blocks(p["planes"], scene._normalize(pts))
        pos = scene.pos_encode(scene._normalize01(pts)).astype(blocks[0].dtype)
        h = decoder_lib.mlp_apply_blocks(p["decoder"]["sdf"], [*blocks, pos])
        return h.sum()

    def loss_L2(p, db, kf_poses, key):
        pts, _, _, _ = geom(db, kf_poses, key)
        raw = scene.query_color_sdf(p, pts)
        return raw.sum()

    def loss_L3(p, db, kf_poses, key):
        pts, z_vals, _, _ = geom(db, kf_poses, key)
        raw = scene.query_color_sdf(p, pts).reshape(R, z_vals.shape[1], 4)
        rgb_map, disp, acc, w, depth_map, dvar = scene.raw2outputs(raw, z_vals)
        return rgb_map.sum() + depth_map.sum()

    def loss_L4(p, db, kf_poses, key):
        pts, z_vals, t_rgb, t_d = geom(db, kf_poses, key)
        raw = scene.query_color_sdf(p, pts).reshape(R, z_vals.shape[1], 4)
        rgb_map, disp, acc, w, depth_map, dvar = scene.raw2outputs(raw, z_vals)
        t = t_d.reshape(-1)
        valid = ((t > 0) & (t < scene.depth_trunc)).astype(jnp.float32)
        rgb_loss = jnp.mean(jnp.square(rgb_map - t_rgb))
        depth_loss = jnp.sum(jnp.square(depth_map - t) * valid) / jnp.maximum(valid.sum(), 1.0)
        tr = cfg["training"]
        return tr["rgb_weight"] * rgb_loss + tr["depth_weight"] * depth_loss

    def loss_L5(p, db, kf_poses, key):
        rays_o, rays_d, t_rgb, t_d, k_render = sample_batch(db, kf_poses, key)
        ret = scene.forward(p, rays_o, rays_d, t_rgb, t_d, key=k_render)
        return scene.get_loss_from_ret(ret)

    def loss_R(p, db, kf_poses, key):
        """L5 with remat around the point pipeline."""
        rays_o, rays_d, t_rgb, t_d, k_render = sample_batch(db, kf_poses, key)
        z_vals = scene.sample_z_vals(t_d, rays_o.shape[0], k_render)
        pts = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)
        raw = jax.checkpoint(scene.query_color_sdf)(p, pts).reshape(R, z_vals.shape[1], 4)
        rgb_map, disp, acc, w, depth_map, dvar = scene.raw2outputs(raw, z_vals)
        t = t_d.reshape(-1)
        valid = ((t > 0) & (t < scene.depth_trunc)).astype(jnp.float32)
        rgb_loss = jnp.mean(jnp.square(rgb_map - t_rgb))
        depth_loss = jnp.sum(jnp.square(depth_map - t) * valid) / jnp.maximum(valid.sum(), 1.0)
        sdf = raw[..., 3]
        co_fs, co_sdf = scene.co_sdf_losses(z_vals, t_d, sdf)
        e_fs, e_c, e_t = scene.eslam_sdf_losses(z_vals, t_d, sdf)
        tr = cfg["training"]
        return (tr["rgb_weight"] * rgb_loss + tr["depth_weight"] * depth_loss
                + tr["sdf_weight"] * co_sdf + tr["fs_weight"] * co_fs)

    def make_fwd(loss_fn):
        @jax.jit
        def f(p, db, kf_poses, key):
            def body(i, acc):
                return acc + loss_fn(p, db, kf_poses, jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f

    def make_bwd(loss_fn):
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
    for name, fn in [("L0_blocks", loss_L0), ("L1_sdfmlp", loss_L1),
                     ("L2_decoder", loss_L2), ("L3_composite", loss_L3),
                     ("L4_rgbd_loss", loss_L4), ("L5_full", loss_L5),
                     ("R_remat", loss_R)]:
        results[name + "_bwd"] = timed(name + " fwd+bwd", make_bwd(fn), *args)

    # Z probe: d_coords hard-zeroed in the sampler VJP
    from mneslam_tpu.ops import interp

    @jax.custom_vjp
    def sample_nocoordgrad(plane, coords):
        out, _ = interp._sample_plane_fwd_impl(plane, coords)
        return out

    def _z_fwd(plane, coords):
        out, (g, wx, wy, idx) = interp._sample_plane_fwd_impl(plane, coords)
        return out, (g, wx, wy, idx, coords, plane)

    def _z_bwd(res, dout):
        d_plane, _ = interp._sample_plane_bwd(res, dout)
        _, _, _, _, coords, _ = res
        return d_plane, jnp.zeros_like(coords)

    sample_nocoordgrad.defvjp(_z_fwd, _z_bwd)

    orig = interp.sample_plane_packed
    try:
        import mneslam_tpu.models.scene_rep as sr
        # SceneRep.plane_feature_blocks picks up interp.sample_plane_packed
        # at call time via the module global
        interp.sample_plane_packed = sample_nocoordgrad
        sr_interp = getattr(sr, "interp", None)
        if sr_interp is not None:
            sr.interp.sample_plane_packed = sample_nocoordgrad
        results["Z_nocoordgrad_bwd"] = timed("Z: L5, d_coords zeroed",
                                             make_bwd(loss_L5), *args)
    finally:
        interp.sample_plane_packed = orig

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
