"""Marching-tetrahedra tests against analytic SDFs + PLY round-trip."""

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
