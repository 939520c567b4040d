"""Unit tests for the SE(3) library: closed-form identities + finite diffs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mneslam_tpu.ops import lie, rotations


def random_poses(key, n):
    k1, k2 = jax.random.split(key)
    phi = 0.5 * jax.random.normal(k1, (n, 3))
    t = jax.random.normal(k2, (n, 3))
    q = lie.so3_exp(phi)
    return jnp.concatenate([t, q], axis=-1)


def test_identity_and_inverse():
    key = jax.random.PRNGKey(0)
    T = random_poses(key, 8)
    eye = lie.identity((8,))
    np.testing.assert_allclose(lie.mul(T, lie.inv(T)), eye, atol=1e-5)
    np.testing.assert_allclose(lie.mul(lie.inv(T), T), eye, atol=1e-5)
    np.testing.assert_allclose(lie.mul(T, eye), T, atol=1e-6)


def test_associativity_and_action():
    key = jax.random.PRNGKey(1)
    a, b, c = (random_poses(jax.random.fold_in(key, i), 4) for i in range(3))
    np.testing.assert_allclose(
        lie.mul(lie.mul(a, b), c), lie.mul(a, lie.mul(b, c)), atol=1e-5
    )
    p = jax.random.normal(jax.random.fold_in(key, 9), (4, 3))
    np.testing.assert_allclose(
        lie.act(lie.mul(a, b), p), lie.act(a, lie.act(b, p)), atol=1e-5
    )


def test_matrix_roundtrip():
    key = jax.random.PRNGKey(2)
    T = random_poses(key, 16)
    M = lie.matrix(T)
    T2 = lie.from_matrix(M)
    # quaternion sign canonicalized — compare matrices
    np.testing.assert_allclose(lie.matrix(T2), M, atol=1e-5)
    p = jax.random.normal(key, (16, 3))
    hom = jnp.concatenate([p, jnp.ones((16, 1))], axis=-1)
    np.testing.assert_allclose(
        lie.act(T, p), jnp.einsum("nij,nj->ni", M, hom)[:, :3], atol=1e-5
    )


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(3)
    xi = jax.random.normal(key, (32, 6))
    # log returns the principal value: keep rotation angle below pi
    phi_norm = jnp.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi = xi.at[:, 3:].multiply(jnp.minimum(1.0, 2.8 / phi_norm))
    # float32 trig precision degrades near theta=pi; 1e-2 abs is ~0.3% rel
    np.testing.assert_allclose(lie.log(lie.exp(xi)), xi, atol=1e-2)
    # tiny tangent vectors (Taylor branch)
    xi_small = 1e-9 * jax.random.normal(key, (8, 6))
    np.testing.assert_allclose(lie.log(lie.exp(xi_small)), xi_small, atol=1e-12)


def test_exp_log_grad_finite():
    xi = jnp.array([1e-10, 0.0, 0.0, 0.0, 0.0, 1e-10])
    g = jax.jacobian(lie.exp)(xi)
    assert np.all(np.isfinite(g))
    g2 = jax.jacobian(lambda x: lie.log(lie.exp(x)))(xi)
    assert np.all(np.isfinite(g2))


def test_act4_homogeneous_consistency():
    """act4 on (X, Y, Z, d) must equal acting on the real point (X,Y,Z)/d."""
    key = jax.random.PRNGKey(4)
    T = random_poses(key, 8)
    p4 = jax.random.normal(key, (8, 4))
    p4 = p4.at[:, 3].set(jnp.abs(p4[:, 3]) + 0.5)
    out = lie.act4(T, p4)
    real = lie.act(T, p4[:, :3] / p4[:, 3:4])
    np.testing.assert_allclose(out[:, :3] / out[:, 3:4], real, atol=1e-4)
    np.testing.assert_allclose(out[:, 3], p4[:, 3], atol=1e-6)


def test_adjoint_identity():
    """a * exp(xi) == exp(Ad(a) xi) * a."""
    key = jax.random.PRNGKey(5)
    a = random_poses(key, 4)
    xi = 0.1 * jax.random.normal(key, (4, 6))
    lhs = lie.mul(a, lie.exp(xi))
    rhs = lie.mul(lie.exp(jnp.einsum("nij,nj->ni", lie.adjoint(a), xi)), a)
    np.testing.assert_allclose(lie.matrix(lhs), lie.matrix(rhs), atol=1e-4)


def test_retr_convention():
    """retr(X, xi) = exp(xi) * X (left retraction)."""
    key = jax.random.PRNGKey(6)
    a = random_poses(key, 4)
    xi = 0.1 * jax.random.normal(key, (4, 6))
    np.testing.assert_allclose(
        lie.retr(a, xi), lie.mul(lie.exp(xi), a), atol=1e-6
    )


def test_slerp_endpoints_and_midpoint():
    key = jax.random.PRNGKey(7)
    q0 = lie.so3_exp(jax.random.normal(key, (5, 3)))
    q1 = lie.so3_exp(jax.random.normal(jax.random.fold_in(key, 1), (5, 3)))
    np.testing.assert_allclose(
        jnp.abs(jnp.sum(lie.slerp(q0, q1, jnp.zeros((5, 1))) * q0, -1)),
        jnp.ones(5), atol=1e-5,
    )
    np.testing.assert_allclose(
        jnp.abs(jnp.sum(lie.slerp(q0, q1, jnp.ones((5, 1))) * q1, -1)),
        jnp.ones(5), atol=1e-5,
    )
    # midpoint is equidistant
    qm = lie.slerp(q0, q1, 0.5 * jnp.ones((5, 1)))
    d0 = jnp.abs(jnp.sum(qm * q0, -1))
    d1 = jnp.abs(jnp.sum(qm * q1, -1))
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_pose_interp():
    key = jax.random.PRNGKey(8)
    a = random_poses(key, 4)
    b = random_poses(jax.random.fold_in(key, 1), 4)
    np.testing.assert_allclose(lie.matrix(lie.interp(a, b, jnp.zeros(4))), lie.matrix(a), atol=1e-4)
    np.testing.assert_allclose(lie.matrix(lie.interp(a, b, jnp.ones(4))), lie.matrix(b), atol=1e-4)


@pytest.mark.parametrize("rep", ["axis_angle", "quat", "6d"])
def test_rotation_representations_roundtrip(rep):
    key = jax.random.PRNGKey(9)
    phi = jax.random.normal(key, (16, 3))
    R = rotations.axis_angle_to_matrix(phi)
    rot, trans = rotations.transform_to_rot_trans(
        rotations.rot_trans_to_transform(
            {"axis_angle": phi,
             "quat": lie.so3_exp(phi),
             "6d": rotations.matrix_to_rotation_6d(R)}[rep],
            jnp.zeros((16, 3)),
            rep,
        ),
        rep,
    )
    R2 = rotations.rot_trans_to_transform(rot, trans, rep)[..., :3, :3]
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_matrix_quat_branch_coverage():
    """Exercise all four Shepperd branches incl. 180-degree rotations."""
    Rs = []
    for axis in range(3):
        phi = jnp.zeros(3).at[axis].set(jnp.pi - 1e-4)
        Rs.append(rotations.axis_angle_to_matrix(phi))
    Rs.append(jnp.eye(3))
    R = jnp.stack(Rs)
    q = lie.matrix_to_quat(R)
    np.testing.assert_allclose(lie.quat_to_matrix(q), R, atol=1e-4)


def test_sim3_group_axioms():
    key = jax.random.PRNGKey(20)
    def rand_sim3(k, n):
        k1, k2, k3 = jax.random.split(k, 3)
        t = jax.random.normal(k1, (n, 3))
        q = lie.so3_exp(0.5 * jax.random.normal(k2, (n, 3)))
        s = jnp.exp(0.3 * jax.random.normal(k3, (n, 1)))
        return jnp.concatenate([t, q, s], -1)
    a = rand_sim3(key, 6)
    b = rand_sim3(jax.random.fold_in(key, 1), 6)
    eye = lie.sim3_identity((6,))
    np.testing.assert_allclose(lie.sim3_mul(a, lie.sim3_inv(a)), eye, atol=1e-4)
    p = jax.random.normal(jax.random.fold_in(key, 2), (6, 3))
    np.testing.assert_allclose(
        lie.sim3_act(lie.sim3_mul(a, b), p), lie.sim3_act(a, lie.sim3_act(b, p)),
        atol=1e-4)
    # act4 homogeneous consistency
    p4 = jax.random.normal(jax.random.fold_in(key, 3), (6, 4))
    p4 = p4.at[:, 3].set(jnp.abs(p4[:, 3]) + 0.5)
    out = lie.sim3_act4(a, p4)
    real = lie.sim3_act(a, p4[:, :3] / p4[:, 3:4])
    np.testing.assert_allclose(out[:, :3] / out[:, 3:4], real, atol=1e-4)


def test_sim3_exp_log_roundtrip():
    key = jax.random.PRNGKey(21)
    xi = 0.4 * jax.random.normal(key, (16, 7))
    np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(xi)), xi, atol=1e-3)
    # sigma = 0 reduces to SE(3)
    xi_se3 = xi.at[:, 6].set(0.0)
    g = lie.sim3_exp(xi_se3)
    np.testing.assert_allclose(np.asarray(g[:, 7]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[:, :7]),
                               np.asarray(lie.exp(xi_se3[:, :6])), atol=1e-4)
