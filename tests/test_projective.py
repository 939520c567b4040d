"""Projective-transform tests: analytic Jacobians vs autodiff / finite diffs."""

import jax
import jax.numpy as jnp
import numpy as np

from mneslam_tpu.ops import lie, projective


HT, WD = 8, 12
INTR = jnp.asarray([10.0, 10.0, WD / 2 - 0.5, HT / 2 - 0.5])


def make_scene(key, n_frames=4):
    k1, k2, k3 = jax.random.split(key, 3)
    phi = 0.05 * jax.random.normal(k1, (n_frames, 3))
    t = 0.1 * jax.random.normal(k2, (n_frames, 3))
    poses = jnp.concatenate([t, lie.so3_exp(phi)], axis=-1)
    disps = 0.5 + 0.3 * jax.random.uniform(k3, (n_frames, HT, WD))
    return poses, disps


def test_reprojection_identity():
    """Same-pose (distinct ii!=jj but equal pose), same depth -> coords == pixel grid."""
    poses = lie.identity((2,))
    disps = 0.7 * jnp.ones((2, HT, WD))
    ii = jnp.array([0])
    jj = jnp.array([1])
    coords, valid = projective.projective_transform(poses, disps, INTR, ii, jj)
    grid = projective.coords_grid(HT, WD)
    np.testing.assert_allclose(coords[0], grid, atol=1e-4)
    np.testing.assert_allclose(valid, jnp.ones_like(valid))


def test_induced_flow_translation():
    """Pure x-translation of the target camera shifts pixels by -fx * tx * d."""
    tx = 0.2
    poses = jnp.stack([
        lie.identity(),
        jnp.asarray([tx, 0, 0, 0, 0, 0, 1.0]),
    ])
    d = 0.5
    disps = d * jnp.ones((2, HT, WD))
    flow, valid = projective.induced_flow(poses, disps, INTR, jnp.array([0]), jnp.array([1]))
    # w2c translation tx moves points +x in cam frame: pixel shift = fx * tx * d
    np.testing.assert_allclose(flow[0, ..., 0], INTR[0] * tx * d, atol=1e-4)
    np.testing.assert_allclose(flow[0, ..., 1], 0.0, atol=1e-4)


def test_jacobians_match_autodiff():
    key = jax.random.PRNGKey(0)
    poses, disps = make_scene(key)
    ii = jnp.array([0, 1, 2])
    jj = jnp.array([1, 2, 0])

    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, INTR, ii, jj, jacobian=True
    )

    # autodiff wrt left perturbation of pose jj for edge 0
    def f_j(xi):
        p = poses.at[jj[0]].set(lie.retr(poses[jj[0]], xi))
        c, _ = projective.projective_transform(p, disps, INTR, ii, jj)
        return c[0]

    Jj_auto = jax.jacobian(f_j)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Jj_auto), np.asarray(Jj[0]), atol=1e-3, rtol=1e-3)

    def f_i(xi):
        p = poses.at[ii[0]].set(lie.retr(poses[ii[0]], xi))
        c, _ = projective.projective_transform(p, disps, INTR, ii, jj)
        return c[0]

    Ji_auto = jax.jacobian(f_i)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Ji_auto), np.asarray(Ji[0]), atol=1e-3, rtol=1e-3)

    # autodiff wrt source disparities (diagonal of the pixelwise jacobian)
    def f_z(dd):
        c, _ = projective.projective_transform(
            poses, disps.at[ii[0]].add(dd), INTR, ii, jj
        )
        return c[0]

    Jz_auto = jax.jacobian(f_z)(jnp.zeros((HT, WD)))
    # extract diagonal: d coords[y, x, :] / d disp[y, x]
    diag = np.zeros((HT, WD, 2))
    Jz_np = np.asarray(Jz_auto)
    for y in range(HT):
        for x in range(WD):
            diag[y, x] = Jz_np[y, x, :, y, x]
    np.testing.assert_allclose(diag, np.asarray(Jz[0, ..., 0]), atol=1e-3, rtol=1e-3)


def test_self_edge_convention():
    """ii == jj edges use the fixed small-baseline pose for self-correlation."""
    poses, disps = make_scene(jax.random.PRNGKey(1))
    ii = jj = jnp.array([1])
    coords, _ = projective.projective_transform(poses, disps, INTR, ii, jj)
    # equals transform under G = [-0.1, 0, 0, identity]
    G = jnp.asarray([[-0.1, 0, 0, 0, 0, 0, 1.0]])
    X0 = projective.iproj(disps[ii], INTR)
    X1 = lie.act4(G[:, None, None, :], X0)
    expected, _ = projective.proj(X1, INTR)
    np.testing.assert_allclose(coords, expected, atol=1e-5)


def test_projective_transform_planes_matches_reference_layout():
    """projective_transform_planes == projective_transform(jacobian=True):
    same coords/valid; Jacobian planes equal the [..., 2, 6] layout
    transposed (the BA hot path consumes the planes layout)."""
    from mneslam_tpu.ops.projective import (projective_transform,
                                            projective_transform_planes)

    key = jax.random.PRNGKey(3)
    N, ht, wd = 5, 12, 16
    poses = jnp.concatenate([
        0.3 * jax.random.normal(key, (N, 3)),
        lie.quat_normalize(jax.random.normal(jax.random.fold_in(key, 1), (N, 4))),
    ], axis=-1)
    disps = 0.3 + jax.random.uniform(jax.random.fold_in(key, 2), (N, ht, wd))
    intr = jnp.asarray([14.0, 15.0, 7.5, 5.5])
    ii = jnp.asarray([0, 1, 2, 3, 2])
    jj = jnp.asarray([1, 2, 3, 4, 2])  # includes a self-edge

    c_ref, v_ref, (Ji_r, Jj_r, Jz_r) = projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)
    c_pl, v_pl, (Ji_p, Jj_p, Jz_p) = projective_transform_planes(
        poses, disps, intr, ii, jj)

    E, HW = 5, ht * wd
    np.testing.assert_allclose(
        np.asarray(c_pl), np.asarray(c_ref).reshape(E, HW, 2).transpose(0, 2, 1),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(v_pl), np.asarray(v_ref).reshape(E, 1, HW))
    # reference [E, H, W, 2, 6] -> planes [E, 6, 2, HW]
    for ref, pl in ((Ji_r, Ji_p), (Jj_r, Jj_p)):
        ref_t = np.asarray(ref).reshape(E, HW, 2, 6).transpose(0, 3, 2, 1)
        np.testing.assert_allclose(np.asarray(pl), ref_t, rtol=1e-4, atol=1e-5)
    Jz_t = np.asarray(Jz_r).reshape(E, HW, 2).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(Jz_p), Jz_t, rtol=1e-4, atol=1e-5)
