"""Camera ray generation (OpenGL convention, -z forward).

Matches the reference's conventions exactly so that poses from the same
datasets drive both systems identically:
  * `get_camera_rays` — per-pixel unit-less direction vectors in the camera
    frame (`/root/reference/datasets/utils.py:24-56`), dirs =
    ((i-cx)/fx, -(j-cy)/fy, -1).
  * `get_rays` — world-frame origins/directions for a c2w pose
    (`/root/reference/model/utils.py:7-25`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_camera_rays(H: int, W: int, fx: float, fy: float, cx: float, cy: float) -> jax.Array:
    """Camera-frame ray directions [H, W, 3], OpenGL (-z forward, y up)."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dirs = jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )
    return dirs


def get_rays(H: int, W: int, fx, fy, cx, cy, c2w: jax.Array):
    """World-frame rays for a full image: (rays_o [H,W,3], rays_d [H,W,3])."""
    dirs = get_camera_rays(H, W, fx, fy, cx, cy)
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_from_pose(directions: jax.Array, c2w: jax.Array):
    """Rotate camera-frame directions [N, 3] by pose(s).

    c2w may be [4,4] (one pose for all rays) or [N,4,4] (per-ray poses, as
    used when sampling the global keyframe ray set —
    `mp_slam/mapper.py:151-153`).
    """
    if c2w.ndim == 2:
        rays_d = directions @ c2w[:3, :3].T
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nc,nrc->nr", directions, c2w[:, :3, :3])
        rays_o = c2w[:, :3, 3]
    return rays_o, rays_d
