"""Rotation-representation converters (pure JAX).

Replaces the reference's pytorch3d/mathutils-backed converters
(`/root/reference/optimization/utils.py:5-222`): matrix <-> quaternion <->
axis-angle <-> 6D, plus pose assembly helpers used by loop-closure pose
optimization (`mp_slam/mapper.py:388-410`). All functions broadcast and are
jit/grad-safe (branch-free singular handling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    return lie.quat_to_matrix(lie.so3_exp(aa))


def matrix_to_axis_angle(R: jax.Array) -> jax.Array:
    return lie.so3_log(lie.matrix_to_quat(R))


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    return lie.quat_to_matrix(q)


def matrix_to_quaternion(R: jax.Array) -> jax.Array:
    return lie.matrix_to_quat(R)


def axis_angle_to_quaternion(aa: jax.Array) -> jax.Array:
    return lie.so3_exp(aa)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    return lie.so3_log(q)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Zhou et al. continuous 6D -> rotation matrix, Gram-Schmidt."""
    a1, a2 = d6[..., :3], d6[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)


def matrix_to_rotation_6d(R: jax.Array) -> jax.Array:
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def rot_trans_to_transform(rot: jax.Array, trans: jax.Array, rep: str = "axis_angle") -> jax.Array:
    """(rotation param, translation) -> [..., 4, 4] c2w transform.

    `rep` selects the rotation parametrization optimized during loop
    closure (config `training.rot_rep`, default 'axis_angle').
    """
    if rep == "axis_angle":
        R = axis_angle_to_matrix(rot)
    elif rep == "quat":
        R = quaternion_to_matrix(lie.quat_normalize(rot))
    elif rep == "6d":
        R = rotation_6d_to_matrix(rot)
    else:
        raise ValueError(f"unknown rotation representation: {rep}")
    top = jnp.concatenate([R, trans[..., None]], axis=-1)
    bot = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


def transform_to_rot_trans(T: jax.Array, rep: str = "axis_angle"):
    R, t = T[..., :3, :3], T[..., :3, 3]
    if rep == "axis_angle":
        return matrix_to_axis_angle(R), t
    if rep == "quat":
        return matrix_to_quaternion(R), t
    if rep == "6d":
        return matrix_to_rotation_6d(R), t
    raise ValueError(f"unknown rotation representation: {rep}")


def slerp_matrices(R0: jax.Array, R1: jax.Array, t: jax.Array) -> jax.Array:
    """SLERP between rotation matrices (loop-closure trajectory deformation,
    `mp_slam/mapper.py:417-489`)."""
    q0 = lie.matrix_to_quat(R0)
    q1 = lie.matrix_to_quat(R1)
    return lie.quat_to_matrix(lie.slerp(q0, q1, t))
