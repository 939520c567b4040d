"""SE(3) Lie group operations on plain JAX arrays.

TPU-native replacement for the lietorch CUDA extension used by the reference
tracker (`/root/reference/tracker/depth_video.py:2`,
`tracker/geom/projective_ops.py:2`): instead of a C++/CUDA autograd group
type, poses are plain `[..., 7]` arrays `[tx, ty, tz, qx, qy, qz, qw]`
(translation + unit quaternion, scalar-last — the same memory layout the
reference stores in its keyframe buffer), and every op is a pure function
that broadcasts over leading dims, differentiates under `jax.grad`, and
fuses under `jit`/`vmap`/`pallas`.

Conventions
-----------
* se(3) tangent vectors are `[..., 6]` = `[tau(3), phi(3)]`, translation
  first — matching the Jacobian column layout of the reference's dense-BA
  spec (`tracker/geom/projective_ops.py:66-71`).
* Retraction is LEFT multiplication: `retr(X, xi) = exp(xi) * X`, matching
  the perturbation convention of the reference Jacobians.
* All trig-singular ops (exp/log) use Taylor fallbacks near theta=0 with
  `jnp.where` guards on both value and derivative paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Quaternion layout: [x, y, z, w] (scalar last).


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2, scalar-last layout, broadcasts."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate 3-vectors v by unit quaternions q (broadcasts).

    Uses the expanded form v' = v + 2 w (u × v) + 2 u × (u × v),
    u = vector part — two cross products, cheap on the VPU.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (xyzw) -> rotation matrix [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = [
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (xyzw).

    Branch-free variant: computes all four Shepperd candidates and selects
    the best-conditioned one with `where` masks, so it is safe under jit
    and vmap (the reference's hand-rolled branch-mask converter in
    `optimization/utils.py` has the same goal).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Candidate 0: w-major
    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1)
    # Candidate 1: x-major
    q1 = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    # Candidate 2: y-major
    q2 = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    # Candidate 3: z-major
    q3 = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1)

    # Pick candidate with the largest leading term (numerically safest).
    c0 = 1.0 + tr
    c1 = 1.0 + m00 - m11 - m22
    c2 = 1.0 - m00 + m11 - m22
    c3 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    best = jnp.argmax(cands, axis=-1)

    q = jnp.where(
        (best == 0)[..., None], q0,
        jnp.where((best == 1)[..., None], q1,
                  jnp.where((best == 2)[..., None], q2, q3)),
    )
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def _skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    rows = [
        jnp.stack([o, -z, y], axis=-1),
        jnp.stack([z, o, -x], axis=-1),
        jnp.stack([-y, x, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


# ---------------------------------------------------------------------------
# SE(3): [..., 7] = [t(3), q(4)]
# ---------------------------------------------------------------------------

def identity(shape=(), dtype=jnp.float32) -> jax.Array:
    """Identity pose(s) of shape `shape + (7,)`."""
    e = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(e, tuple(shape) + (7,))


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3]


def quaternion(T: jax.Array) -> jax.Array:
    return T[..., 3:7]


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose: (a*b) acts as a(b(x))."""
    t = translation(a) + quat_rotate(quaternion(a), translation(b))
    q = quat_mul(quaternion(a), quaternion(b))
    return jnp.concatenate([t, q], axis=-1)


def inv(a: jax.Array) -> jax.Array:
    qc = quat_conj(quaternion(a))
    t = -quat_rotate(qc, translation(a))
    return jnp.concatenate([t, qc], axis=-1)


def act(a: jax.Array, p: jax.Array) -> jax.Array:
    """Apply pose to 3D points [..., 3]."""
    return quat_rotate(quaternion(a), p) + translation(a)


def act4(a: jax.Array, p: jax.Array) -> jax.Array:
    """Homogeneous-depth action on [..., 4] = [X, Y, Z, d].

    The real 3D point is (X, Y, Z)/d; the action is (R p + d t, d) — the
    same 4-vector convention the reference BA uses for inverse-depth
    parametrized points (`tracker/geom/projective_ops.py:54-84`).
    """
    xyz = quat_rotate(quaternion(a), p[..., :3]) + p[..., 3:4] * translation(a)
    return jnp.concatenate([xyz, p[..., 3:4]], axis=-1)


def matrix(a: jax.Array) -> jax.Array:
    """[..., 7] -> [..., 4, 4] homogeneous matrix."""
    R = quat_to_matrix(quaternion(a))
    t = translation(a)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(M: jax.Array) -> jax.Array:
    """[..., 4, 4] homogeneous matrix -> [..., 7]."""
    q = matrix_to_quat(M[..., :3, :3])
    return jnp.concatenate([M[..., :3, 3], q], axis=-1)


def _so3_exp_coeffs(theta_sq: jax.Array):
    """(A, B, C) s.t. exp(skew(phi)) = I + A skew + B skew^2 and V = I + B skew + C skew^2.

    Taylor-guarded near 0. Uses the double-`where` trick: the untaken
    branch's operands are replaced by safe values so its (discarded)
    Jacobian stays finite — otherwise 0-cotangent x inf-Jacobian = NaN
    under `jax.grad`.
    """
    small = theta_sq < 1e-8
    ts = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)  # safe in untaken branch
    theta = jnp.sqrt(ts)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / ts)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - A) / ts)
    return A, B, C


def so3_exp(phi: jax.Array) -> jax.Array:
    """so(3) vector -> unit quaternion (xyzw)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    ts = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)  # safe in untaken branch
    theta = jnp.sqrt(ts)
    half = 0.5 * theta
    # sin(theta/2)/theta with Taylor guard
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([k * phi, w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion (xyzw) -> so(3) vector."""
    # Force w >= 0 for the short geodesic.
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    u = q[..., :3]
    w = q[..., 3:4]
    un_sq = jnp.sum(u * u, axis=-1, keepdims=True)
    small = un_sq < 1e-12
    un = jnp.sqrt(jnp.where(small, jnp.ones_like(un_sq), un_sq))
    theta = 2.0 * jnp.arctan2(un, w)
    # theta / sin(theta/2) ≈ 2/w near 0  (since sin(theta/2)=un)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / un)
    return scale * u


def exp(xi: jax.Array) -> jax.Array:
    """se(3) [..., 6] = [tau, phi] -> SE(3) [..., 7]."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    _, B, C = _so3_exp_coeffs(theta_sq)
    Phi = _skew(phi)
    V = jnp.eye(3, dtype=xi.dtype) + B * Phi + C * (Phi @ Phi)
    t = jnp.einsum("...ij,...j->...i", V, tau)
    return jnp.concatenate([t, q], axis=-1)


def log(a: jax.Array) -> jax.Array:
    """SE(3) [..., 7] -> se(3) [..., 6] = [tau, phi]."""
    phi = so3_log(quaternion(a))
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    A, B, _ = _so3_exp_coeffs(theta_sq)
    Phi = _skew(phi)
    # V^{-1} = I - 1/2 skew + (1/theta^2)(1 - A/(2B)) skew^2, Taylor-guarded.
    small = theta_sq < 1e-8
    ts = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)  # safe in untaken branch
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - A / (2.0 * jnp.maximum(B, 1e-12))) / ts,
    )
    Vinv = jnp.eye(3, dtype=a.dtype) - 0.5 * Phi + coef * (Phi @ Phi)
    tau = jnp.einsum("...ij,...j->...i", Vinv, translation(a))
    return jnp.concatenate([tau, phi], axis=-1)


def adjoint(a: jax.Array) -> jax.Array:
    """Adjoint matrix Ad(a): [..., 6, 6], tangent layout [tau, phi].

    Ad = [[R, skew(t) R], [0, R]] so that a * exp(xi) = exp(Ad(a) xi) * a.
    """
    R = quat_to_matrix(quaternion(a))
    tR = _skew(translation(a)) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def adjT_apply(a: jax.Array, J: jax.Array) -> jax.Array:
    """Dual-adjoint action on row-Jacobians: J [..., k, 6] -> J @ Ad(a).

    Matches lietorch's `adjT` as used to convert d(residual)/d(xi_ij) into
    d(residual)/d(xi_i) in `tracker/geom/projective_ops.py:137`.
    """
    return J @ adjoint(a)


def retr(a: jax.Array, xi: jax.Array) -> jax.Array:
    """Left retraction: exp(xi) * a (the BA update convention)."""
    return mul(exp(xi), a)


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Spherical interpolation of unit quaternions, lerp fallback near 0°.

    Behavioral twin of the reference's batched slerp
    (`optimization/utils.py:5-44`), branch-free for jit.
    """
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else t
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - eps))
    sin_theta = jnp.sin(theta)
    use_lerp = dot > 1.0 - eps
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, eps))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, eps))
    return quat_normalize(w0 * q0 + w1 * q1)


def interp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """Geodesic interpolation between poses: exp(t * log(b a^-1)) * a.

    Used by the trajectory filler to seed non-keyframe poses
    (`tracker/trajectory_filler.py:44-57`).
    """
    d = log(mul(b, inv(a)))
    tt = jnp.asarray(t)
    if tt.ndim < d.ndim:
        tt = tt[..., None]
    return mul(exp(tt * d), a)


# ---------------------------------------------------------------------------
# Sim(3): [..., 8] = [t(3), q(4), s(1)] — lietorch Sim3 parity
# (`tracker/geom/projective_ops.py:73-80` supports Sim3 rigs; runtime uses
# SE(3) only). Tangent layout [tau(3), phi(3), sigma(1)].
# ---------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    e = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(e, tuple(shape) + (8,))


def sim3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a*b)(x) = a(b(x)) with x -> s R x + t."""
    t = a[..., :3] + a[..., 7:8] * quat_rotate(a[..., 3:7], b[..., :3])
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    s = a[..., 7:8] * b[..., 7:8]
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_inv(a: jax.Array) -> jax.Array:
    qc = quat_conj(a[..., 3:7])
    s_inv = 1.0 / a[..., 7:8]
    t = -s_inv * quat_rotate(qc, a[..., :3])
    return jnp.concatenate([t, qc, s_inv], axis=-1)


def sim3_act(a: jax.Array, p: jax.Array) -> jax.Array:
    return a[..., 7:8] * quat_rotate(a[..., 3:7], p) + a[..., :3]


def sim3_act4(a: jax.Array, p: jax.Array) -> jax.Array:
    """Homogeneous-depth action: (s R p + d t, d)."""
    xyz = a[..., 7:8] * quat_rotate(a[..., 3:7], p[..., :3]) + p[..., 3:4] * a[..., :3]
    return jnp.concatenate([xyz, p[..., 3:4]], axis=-1)


def sim3_exp(xi: jax.Array) -> jax.Array:
    """sim(3) [..., 7] = [tau, phi, sigma] -> Sim(3) [..., 8].

    W-matrix (generalized left Jacobian with scale) evaluated with Taylor
    guards; see Strasdat's Sim3 parametrization.
    """
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3_exp(phi)
    s = jnp.exp(sigma)

    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    Phi = _skew(phi)
    I = jnp.eye(3, dtype=xi.dtype)

    # W = A I + B Phi + C Phi^2 (coefficients depend on sigma and theta)
    sig = sigma
    small_sig = jnp.abs(sig) < 1e-6
    sig_safe = jnp.where(small_sig, jnp.ones_like(sig), sig)
    A_s = jnp.where(small_sig, 1.0 + sig / 2.0, (s - 1.0) / sig_safe)

    small_th = theta_sq < 1e-8
    th_safe = jnp.where(small_th, jnp.ones_like(theta), theta)
    denom = sig * sig + theta_sq
    denom = jnp.where(denom < 1e-12, jnp.ones_like(denom), denom)

    a_coef = s * jnp.sin(theta)
    b_coef = s * jnp.cos(theta)
    # B = (a_coef*sig + (1 - b_coef)*theta) / (theta * denom), guarded
    B = jnp.where(
        small_th,
        jnp.where(small_sig, 0.5 + sig / 3.0, ((sig - 1.0) * s + 1.0) / jnp.square(sig_safe))
        * jnp.ones_like(theta),
        (a_coef * sig + (1.0 - b_coef) * theta) / (th_safe * denom),
    )
    # C = (A_s - ((b_coef - 1)*sig + a_coef*theta)/denom) / theta_sq, guarded
    C_num = A_s - ((b_coef - 1.0) * sig + a_coef * theta) / denom
    C = jnp.where(
        small_th,
        (1.0 / 6.0) * jnp.ones_like(theta),
        C_num / jnp.where(small_th, jnp.ones_like(theta_sq), theta_sq),
    )

    W = (A_s[..., None, None] * I + B[..., None, None] * Phi
         + C[..., None, None] * (Phi @ Phi))
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def sim3_log(a: jax.Array) -> jax.Array:
    """Sim(3) -> sim(3) via Newton-free closed form (W inverse by solve)."""
    phi = so3_log(a[..., 3:7])
    sigma = jnp.log(a[..., 7])
    # rebuild W from (phi, sigma) and solve W tau = t
    xi0 = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    # W from sim3_exp internals: recompute by calling exp on [e_k, phi, sigma]
    # columns — cheap (3 solves) and robust
    basis = jnp.eye(3, dtype=a.dtype)
    cols = [sim3_exp(jnp.concatenate([
        jnp.broadcast_to(basis[k], phi.shape), phi, sigma[..., None]], axis=-1))[..., :3]
        for k in range(3)]
    W = jnp.stack(cols, axis=-1)
    tau = jnp.linalg.solve(W, a[..., :3, None])[..., 0]
    return jnp.concatenate([tau, phi, sigma[..., None]], axis=-1)
