"""Mesh extraction: TPU-side SDF grid evaluation + host marching tetrahedra.

Rebuild of the reference's NeuralRGBD-style mesh extractor
(`/root/reference/utils.py:63-153`, used by `mneslam_mp.py:562-575`) and the
frustum-culled `Mesher` (`model/Mesher.py`): evaluate the SDF on a dense
grid over the marching-cubes bound (jitted, chunked — this is the expensive
part and runs entirely on device), then extract the isosurface with the
truncation-aware marching-tetrahedra kernel and color vertices by point
queries.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene_rep import SceneRep
from ..ops import mc


@partial(jax.jit, static_argnames=("scene", "chunk"))
def _query_sdf_chunked(scene: SceneRep, params: Dict, pts: jax.Array, chunk: int = 65536):
    n = pts.shape[0]
    n_pad = (chunk - n % chunk) % chunk
    p = jnp.concatenate([pts, jnp.zeros((n_pad, 3), pts.dtype)], axis=0).reshape(-1, chunk, 3)
    sdf = jax.lax.map(lambda q: scene.query_sdf(params, q), p)
    return sdf.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("scene", "chunk"))
def _query_color_chunked(scene: SceneRep, params: Dict, pts: jax.Array, chunk: int = 65536):
    n = pts.shape[0]
    n_pad = (chunk - n % chunk) % chunk
    p = jnp.concatenate([pts, jnp.zeros((n_pad, 3), pts.dtype)], axis=0).reshape(-1, chunk, 3)
    rgb = jax.lax.map(lambda q: scene.query_color(params, q), p)
    return rgb.reshape(-1, 3)[:n]


@partial(jax.jit, static_argnames=("scene", "chunk"))
def _render_surface_color_chunked(scene: SceneRep, params: Dict, pts: jax.Array,
                                  normals: jax.Array, chunk: int = 16384):
    """`mesh.render_color: True` path: composite color along each vertex
    normal within the truncation band (reference `render_surface_color`,
    model/scene_rep.py:333-349, selected by mneslam_mp.py:562-566)."""
    n = pts.shape[0]
    n_pad = (chunk - n % chunk) % chunk
    pad = jnp.zeros((n_pad, 3), pts.dtype)
    p = jnp.concatenate([pts, pad], axis=0).reshape(-1, chunk, 3)
    nr = jnp.concatenate([normals.astype(pts.dtype), pad], axis=0).reshape(-1, chunk, 3)
    rgb = jax.lax.map(
        lambda qn: scene.render_surface_color(params, qn[0], qn[1]), (p, nr))
    return rgb.reshape(-1, 3)[:n]


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (trimesh.vertex_normals semantics:
    face normals scaled by face area, summed per vertex, normalized —
    `utils.py:133` uses trimesh's property as the render direction)."""
    v = verts.astype(np.float64)
    fn = np.cross(v[faces[:, 1]] - v[faces[:, 0]], v[faces[:, 2]] - v[faces[:, 0]])
    out = np.zeros_like(v)
    for k in range(3):
        np.add.at(out, faces[:, k], fn)
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(norm, 1e-12)).astype(np.float32)


def sdf_grid(
    scene: SceneRep,
    params: Dict,
    bound: np.ndarray,
    voxel_size: float,
    chunk: int = 65536,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense SDF volume over `bound` [3,2] -> (volume, origin, spacing)."""
    bound = np.asarray(bound, np.float32)
    sizes = [max(int(np.ceil((bound[i, 1] - bound[i, 0]) / voxel_size)) + 1, 2) for i in range(3)]
    axes = [np.linspace(bound[i, 0], bound[i, 1], sizes[i], dtype=np.float32) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], axis=-1).reshape(-1, 3))
    sdf = np.asarray(_query_sdf_chunked(scene, params, pts, chunk=chunk)).copy()
    spacing = np.asarray([a[1] - a[0] for a in axes], np.float32)
    return sdf.reshape(sizes), bound[:, 0].copy(), spacing


def extract_mesh(
    scene: SceneRep,
    params: Dict,
    config,
    voxel_size: Optional[float] = None,
    color: bool = True,
    save_path: Optional[str] = None,
    observed=None,
):
    """Full pipeline: grid query -> marching tets -> vertex colors -> PLY.

    Truncation window follows the reference: only cubes fully inside the
    truncation band produce surface, and the band is **3.0 in normalized
    SDF units** (`utils.py:96` `mcubes.marching_cubes(raw, isolevel,
    truncation=3.0)` — the model's sdf head is trained to (t - z)/trunc,
    scene_rep.py:333-349, so the volume is already in units of the
    truncation distance; passing a metric band here would drop every
    sharp observed surface whose per-voxel sdf delta exceeds it).

    `observed` (optional): (kf_poses [K,4,4] c2w, intrinsics [4], H, W,
    depths [K,H,W] or None, eps) — the extracted mesh is filtered to
    keyframe-observed space: faces with any vertex seen by NO keyframe
    (outside every frustum, or occluded beyond the observed depth + eps +
    one voxel diagonal) are dropped. This reproduces the reference
    Mesher.get_mesh observed-space bound (the keyframe TSDF hull mask,
    model/Mesher.py:92-157,234-250): the RAW mesh never contains geometry
    no camera ever saw. Filtering happens post-extraction (like the
    reference's `z[~mask] = -1` grid mask, which still polygonizes surface
    cubes at the hull boundary) so observed surfaces whose back-side cube
    corners are occluded still produce their triangles.
    """
    bound = np.asarray(config["mapping"]["marching_cubes_bound"], np.float32) * config["scale"]
    if voxel_size is None:
        voxel_size = float(config["meshing"]["resolution"])
    vol, origin, spacing = sdf_grid(scene, params, bound, voxel_size)
    verts, faces = mc.marching_cubes(
        vol, isovalue=float(config["meshing"].get("level_set", 0.0)),
        truncation=3.0, origin=origin, spacing=spacing,
    )
    if observed is not None and len(verts):
        from . import cull

        kf_poses, intr, H, W, depths, eps = observed
        diag = float(np.linalg.norm(spacing))
        verts, faces, _ = cull.cull_mesh(
            verts, faces, np.asarray(kf_poses), np.asarray(intr),
            int(H), int(W),
            depths=None if depths is None else np.asarray(depths),
            eps=float(eps) + diag)
    colors = None
    if color and len(verts):
        if config.get("mesh", {}).get("render_color", False):
            normals = vertex_normals(verts, faces)
            colors = np.asarray(_render_surface_color_chunked(
                scene, params, jnp.asarray(verts), jnp.asarray(normals)))
        else:
            colors = np.asarray(_query_color_chunked(scene, params, jnp.asarray(verts)))
    if save_path is not None and len(verts):
        mc.save_ply(save_path, verts, faces, colors)
    return verts, faces, colors
