"""Frustum + occlusion mesh culling.

Rebuild of the reference's culled meshing (`/root/reference/model/Mesher.py`
frustum path and `tools/coslam_eval/cull_mesh.py`): drop mesh geometry never
observed by any keyframe — vertices are kept if they project inside some
keyframe's image with positive depth, optionally within the observed depth
plus a margin (occlusion test). Used before reconstruction metrics so unseen
regions don't count against accuracy.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("H", "W", "chunk"))
def _visible_counts(
    verts: jax.Array,       # [V, 3] world points (padded)
    c2w: jax.Array,         # [K, 4, 4] keyframe poses (OpenGL convention)
    intrinsics: jax.Array,  # [4] fx fy cx cy at full res
    depths: Optional[jax.Array],  # [K, H, W] observed depths or None
    H: int,
    W: int,
    eps: float = 0.08,
    chunk: int = 16384,
) -> jax.Array:
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    w2c = jnp.linalg.inv(c2w)

    def per_kf(w2c_k, depth_k, pts):
        cam = pts @ w2c_k[:3, :3].T + w2c_k[:3, 3]
        z = -cam[:, 2]                       # OpenGL: -z forward
        u = fx * (cam[:, 0] / jnp.maximum(z, 1e-6)) + cx
        v = -fy * (cam[:, 1] / jnp.maximum(z, 1e-6)) + cy
        inb = (z > 0.01) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        if depth_k is not None:
            ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
            obs = depth_k[vi, ui]
            not_occluded = (obs <= 0) | (z <= obs + eps)
            inb = inb & not_occluded
        return inb.astype(jnp.int32)

    def body(pts):
        if depths is not None:
            vis = jax.vmap(per_kf)(w2c, depths, jnp.broadcast_to(pts, (c2w.shape[0],) + pts.shape))
        else:
            vis = jax.vmap(lambda wk: per_kf(wk, None, pts))(w2c)
        return jnp.sum(vis, axis=0)

    n = verts.shape[0]
    n_pad = (chunk - n % chunk) % chunk
    p = jnp.concatenate([verts, jnp.zeros((n_pad, 3))]).reshape(-1, chunk, 3)
    counts = jax.lax.map(body, p)
    return counts.reshape(-1)[:n]


def cull_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    c2w: np.ndarray,
    intrinsics: np.ndarray,
    H: int,
    W: int,
    depths: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    eps: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Keep faces whose every vertex is observed by >= 1 keyframe."""
    if len(verts) == 0:
        return verts, faces, colors
    counts = np.asarray(_visible_counts(
        jnp.asarray(verts), jnp.asarray(c2w), jnp.asarray(intrinsics),
        None if depths is None else jnp.asarray(depths), H, W, eps=eps))
    keep_v = counts > 0
    keep_f = keep_v[faces].all(axis=1)
    remap = -np.ones(len(verts), np.int64)
    remap[keep_v] = np.arange(int(keep_v.sum()))
    new_faces = remap[faces[keep_f]]
    new_colors = colors[keep_v] if colors is not None else None
    return verts[keep_v], new_faces, new_colors
