"""Marching-tetrahedra tests against analytic SDFs + PLY round-trip."""

import jax.numpy as jnp
import numpy as np

from mneslam_tpu.ops import mc


def sphere_sdf(n=48, r=0.6):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(gx**2 + gy**2 + gz**2) - r, ax


def test_sphere_surface_accuracy():
    vol, ax = sphere_sdf()
    spacing = np.full(3, ax[1] - ax[0], np.float32)
    origin = np.full(3, ax[0], np.float32)
    verts, faces = mc.marching_cubes(vol, 0.0, origin=origin, spacing=spacing)
    assert len(verts) > 500 and len(faces) > 500
    radii = np.linalg.norm(verts, axis=1)
    # all vertices within half a voxel of the analytic sphere
    assert np.max(np.abs(radii - 0.6)) < 0.5 * spacing[0], np.max(np.abs(radii - 0.6))
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
    # surface area close to 4 pi r^2
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    expected = 4 * np.pi * 0.6**2
    assert abs(area - expected) / expected < 0.05, (area, expected)


def test_truncation_skips_far_cubes():
    vol, ax = sphere_sdf()
    # with a tight truncation, surface still extracted (band covers crossing)
    verts, _ = mc.marching_cubes(vol, 0.0, truncation=0.2)
    assert len(verts) > 0
    radii_idx = np.linalg.norm(verts * (ax[1] - ax[0]) + ax[0], axis=1)
    assert np.max(np.abs(radii_idx - 0.6)) < 0.05
    # NaN-poisoned region produces no surface there
    vol2 = vol.copy()
    vol2[:10] = np.nan
    verts2, _ = mc.marching_cubes(vol2, 0.0)
    assert len(verts2) > 0
    assert verts2[:, 0].min() >= 9.0  # nothing in the poisoned slab


def test_isovalue_offset():
    vol, ax = sphere_sdf()
    spacing = np.full(3, ax[1] - ax[0], np.float32)
    origin = np.full(3, ax[0], np.float32)
    verts, _ = mc.marching_cubes(vol, 0.1, origin=origin, spacing=spacing)
    radii = np.linalg.norm(verts, axis=1)
    assert abs(np.mean(radii) - 0.7) < 0.02  # sdf = |x| - 0.6 = 0.1 at r=0.7


def test_empty_volume():
    vol = np.ones((8, 8, 8), np.float32)
    verts, faces = mc.marching_cubes(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_ply_roundtrip(tmp_path):
    vol, ax = sphere_sdf(n=24)
    verts, faces = mc.marching_cubes(vol, 0.0)
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    mc.save_ply(p, verts, faces, colors)
    v2, f2, c2 = mc.load_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    assert np.max(np.abs(c2 - colors)) < 1 / 255 + 1e-3


def test_native_polygonizer_matches_numpy():
    """C++ runtime path produces the identical vertex set as numpy."""
    import os
    from runtime import native
    if not native.available():
        import pytest
        pytest.skip("native runtime not built")
    vol, ax = sphere_sdf(n=32)
    os.environ["MNESLAM_NO_NATIVE"] = "1"
    try:
        v_py, f_py = mc.marching_cubes(vol, 0.0)
    finally:
        del os.environ["MNESLAM_NO_NATIVE"]
    v_nat, f_nat = mc.marching_cubes(vol, 0.0)
    assert len(v_py) == len(v_nat) and len(f_py) == len(f_nat)
    sv_py = np.asarray(sorted(map(tuple, np.round(v_py, 4))))
    sv_nat = np.asarray(sorted(map(tuple, np.round(v_nat, 4))))
    np.testing.assert_allclose(sv_py, sv_nat, atol=1e-3)


def test_frustum_culling():
    """Vertices behind the camera or outside every frustum are culled."""
    import jax.numpy as jnp
    from mneslam_tpu.mapping.cull import cull_mesh

    # a small quad in front of the camera (z = -2, OpenGL) and one behind
    verts = np.asarray([
        [0, 0, -2], [0.2, 0, -2], [0, 0.2, -2],    # visible triangle
        [0, 0, 3], [0.2, 0, 3], [0, 0.2, 3],       # behind camera
    ], np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]])
    c2w = np.eye(4, dtype=np.float32)[None]
    intr = np.asarray([50.0, 50.0, 31.5, 23.5], np.float32)
    v, f, _ = cull_mesh(verts, faces, c2w, intr, H=48, W=64)
    assert len(v) == 3 and len(f) == 1

    # occlusion: observed depth 1.0 hides the z=-2 triangle
    depths = np.ones((1, 48, 64), np.float32)
    v2, f2, _ = cull_mesh(verts, faces, c2w, intr, H=48, W=64, depths=depths)
    assert len(f2) == 0


def test_raw_mesh_bounded_to_observed_space():
    """With `observed`, the RAW mesh contains zero geometry outside the
    keyframe frustums/depth support (reference Mesher.get_mesh's TSDF-hull
    bound, model/Mesher.py:92-157). An untrained map produces spurious
    surface everywhere; the observed-space mask must remove everything a
    camera never saw."""
    import jax

    from mneslam_tpu.config import make_config
    from mneslam_tpu.mapping import cull
    from mneslam_tpu.mapping.mesher import extract_mesh
    from mneslam_tpu.models.scene_rep import SceneRep

    cfg = make_config({
        "mapping": {"bound": [[-2.0, 2.0]] * 3,
                    "marching_cubes_bound": [[-2.0, 2.0]] * 3},
        "planes_res": {"coarse": 0.8, "fine": 0.4, "bound_dividable": 0.4},
        "cam": {"H": 32, "W": 40, "fx": 30.0, "fy": 30.0, "cx": 19.5,
                "cy": 15.5, "near": 0.0, "far": 8.0},
        "training": {"trunc": 0.3},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48,
                  "truncation": 0.3},
        "meshing": {"resolution": 0.25},
    })
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))

    # one keyframe looking down -z from the origin, constant 1.5 m depth
    H, W = 32, 40
    kf_poses = np.eye(4)[None]
    depths = np.full((1, H, W), 1.5, np.float32)
    intr = np.asarray([30.0, 30.0, 19.5, 15.5], np.float32)
    eps = 3.0 * 0.3
    observed = (kf_poses, intr, H, W, depths, eps)

    verts_raw, _, _ = extract_mesh(scene, params, cfg, color=False)
    verts_obs, _, _ = extract_mesh(scene, params, cfg, color=False,
                                   observed=observed)
    assert len(verts_raw) > 0, "untrained map should produce spurious surface"
    assert len(verts_obs) < len(verts_raw)

    if len(verts_obs):
        # every surviving vertex is visible (small tolerance band for the
        # cube-corner quantization: a cube polygonizes only if ALL corners
        # are observed, so verts can sit at most one diagonal inside)
        diag = 0.25 * np.sqrt(3.0)
        counts = np.asarray(cull._visible_counts(
            jnp.asarray(verts_obs), jnp.asarray(kf_poses), jnp.asarray(intr),
            jnp.asarray(depths), H=H, W=W, eps=eps + diag))
        assert (counts > 0).all(), f"{(counts == 0).sum()} verts unobserved"


def test_render_color_mesh_path():
    """`mesh.render_color: True` colors vertices by compositing along the
    vertex normal inside the truncation band (reference utils.py:130-142 +
    model/scene_rep.py:333-349) instead of point color queries. Both paths
    must produce one finite [0,1] RGB row per vertex, and the two colorings
    agree closely for a smooth color field (the band composite is a convex
    blend of nearby point colors)."""
    import jax

    from mneslam_tpu.config import make_config
    from mneslam_tpu.mapping.mesher import extract_mesh, vertex_normals
    from mneslam_tpu.models.scene_rep import SceneRep

    cfg = make_config({
        "mapping": {"bound": [[-2.0, 2.0]] * 3,
                    "marching_cubes_bound": [[-2.0, 2.0]] * 3},
        "planes_res": {"coarse": 0.8, "fine": 0.4, "bound_dividable": 0.4},
        "cam": {"H": 32, "W": 40, "fx": 30.0, "fy": 30.0, "cx": 19.5,
                "cy": 15.5, "near": 0.0, "far": 8.0},
        "training": {"trunc": 0.3},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48,
                  "truncation": 0.3},
        "meshing": {"resolution": 0.25},
    })
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))

    verts_q, faces_q, col_q = extract_mesh(scene, params, cfg, color=True)
    assert len(verts_q) and col_q.shape == (len(verts_q), 3)

    cfg_r = dict(cfg)
    cfg_r["mesh"] = dict(cfg["mesh"], render_color=True)
    verts_r, faces_r, col_r = extract_mesh(scene, params, cfg_r, color=True)
    np.testing.assert_array_equal(verts_r, verts_q)  # geometry unchanged
    assert col_r.shape == (len(verts_r), 3)
    assert np.isfinite(col_r).all()
    assert (col_r >= 0).all() and (col_r <= 1).all()
    # distinct code path actually ran (colors differ from point queries)...
    assert not np.allclose(col_r, col_q)
    # ...but stays a local blend of the same smooth field
    assert np.abs(col_r - col_q).mean() < 0.2

    # vertex_normals: unit length, matches analytic normals on a sphere-ish
    # surface (untrained SDF is smooth; just check unit norm + shape here)
    n = vertex_normals(verts_q, faces_q)
    assert n.shape == verts_q.shape
    norms = np.linalg.norm(n, axis=1)
    assert ((norms > 0.99) & (norms < 1.01)).sum() > 0.9 * len(n)
