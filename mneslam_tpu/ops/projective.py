"""Pinhole projective geometry with analytic Jacobians (pure JAX).

Behavioral equivalent of the reference's
`/root/reference/tracker/geom/projective_ops.py` (which this file cites for
parity, not copies): inverse-depth point lifting, SE(3) homogeneous action,
pinhole projection, and the edge-indexed `projective_transform` that maps
pixels of keyframe ii into keyframe jj with Jacobians w.r.t. both poses and
the source inverse depth. Everything is static-shape and differentiable; the
edge dimension is the vmap/shard axis on TPU.

Shapes (no dummy batch dim — the reference always ran batch=1):
  poses       [N, 7]    world-to-camera SE(3), [t, q(xyzw)]
  disps       [N, H, W] inverse depth at 1/8 resolution
  intrinsics  [4]       (fx, fy, cx, cy), shared across frames
  ii, jj      [E]       edge source / destination frame indices
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import lie

MIN_DEPTH = 0.2  # same validity floor as the reference (projective_ops.py:4)


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """Pixel-center coordinate grid [ht, wd, 2] with (x, y) order."""
    y = jnp.arange(ht, dtype=dtype)
    x = jnp.arange(wd, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xx, yy], axis=-1)


def iproj(disps: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Inverse-project pixels to homogeneous inverse-depth points.

    disps [..., H, W] -> pts [..., H, W, 4] = (X, Y, 1, d) where the real
    3D point is (X, Y, 1)/d in the camera frame.
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    X = (grid[..., 0] - cx) / fx
    Y = (grid[..., 1] - cy) / fy
    X = jnp.broadcast_to(X, disps.shape)
    Y = jnp.broadcast_to(Y, disps.shape)
    ones = jnp.ones_like(disps)
    return jnp.stack([X, Y, ones, disps], axis=-1)


def proj(
    Xs: jax.Array,
    intrinsics: jax.Array,
    jacobian: bool = False,
    return_depth: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Pinhole projection of homogeneous points [..., 4] -> pixels [..., 2|3].

    With `jacobian=True` also returns d(pixel)/d(X,Y,Z,d) [..., 2, 4].
    Z is clamped away from zero exactly as the reference does
    (projective_ops.py:93) so invalid points stay finite and are masked
    downstream instead.
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    X, Y, Z, D = Xs[..., 0], Xs[..., 1], Xs[..., 2], Xs[..., 3]
    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    x = fx * (X / Z) + cx
    y = fy * (Y / Z) + cy

    if return_depth:
        coords = jnp.stack([x, y, D / Z], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(Z)
    Jrow0 = jnp.stack([fx / Z, o, -(fx / Z) * (X / Z), o], axis=-1)
    Jrow1 = jnp.stack([o, fy / Z, -(fy / Z) * (Y / Z), o], axis=-1)
    return coords, jnp.stack([Jrow0, Jrow1], axis=-2)


def act4_jacobian(X1: jax.Array) -> jax.Array:
    """Jacobian of the left-perturbed SE(3) homogeneous action at X1.

    X1 [..., 4] -> Ja [..., 4, 6], tangent layout [tau, phi]:
        d(exp(xi) * X1)/dxi = [[d*I, -skew(p)], [0, 0]] with p = (X,Y,Z),
    matching projective_ops.py:66-71.
    """
    X, Y, Z, d = X1[..., 0], X1[..., 1], X1[..., 2], X1[..., 3]
    o = jnp.zeros_like(d)
    rows = [
        jnp.stack([d, o, o, o, Z, -Y], axis=-1),
        jnp.stack([o, d, o, -Z, o, X], axis=-1),
        jnp.stack([o, o, d, Y, -X, o], axis=-1),
        jnp.stack([o, o, o, o, o, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def relative_poses(poses: jax.Array, ii: jax.Array, jj: jax.Array) -> jax.Array:
    """Gij = poses[jj] * poses[ii]^-1, with the reference's self-edge
    convention: edges with ii == jj get a fixed small x-translation
    (projective_ops.py:124) so self-correlation flow is well-defined."""
    Gij = lie.mul(poses[jj], lie.inv(poses[ii]))
    self_edge = jnp.asarray([-0.1, 0, 0, 0, 0, 0, 1], dtype=poses.dtype)
    return jnp.where((ii == jj)[:, None], self_edge, Gij)


def projective_transform(
    poses: jax.Array,
    disps: jax.Array,
    intrinsics: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
    jacobian: bool = False,
    return_depth: bool = False,
):
    """Reproject pixels of frames ii into frames jj.

    Returns:
      coords [E, H, W, 2(|3)] target pixel coords (and inverse depth if
        `return_depth`),
      valid  [E, H, W, 1] in {0,1} — both source and transformed points in
        front of the camera,
      and with `jacobian=True` a tuple (Ji, Jj, Jz):
        Ji, Jj [E, H, W, 2, 6] — d(coords)/d(xi_i|j) (left perturbation),
        Jz     [E, H, W, 2, 1] — d(coords)/d(source inverse depth).
    """
    X0 = iproj(disps[ii], intrinsics)                     # [E, H, W, 4]
    Gij = relative_poses(poses, ii, jj)                   # [E, 7]
    X1 = lie.act4(Gij[:, None, None, :], X0)              # [E, H, W, 4]
    x1, Jp = proj(X1, intrinsics, jacobian=jacobian, return_depth=return_depth)

    valid = (X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH)
    valid = valid[..., None].astype(disps.dtype)

    if not jacobian:
        return x1, valid

    # float32 matmul precision: these Jacobian chain products feed the BA
    # normal equations (see ba.bundle_adjust's precision note).
    with jax.default_matmul_precision("float32"):
        Ja = act4_jacobian(X1)                            # [E, H, W, 4, 6]
        Jj = Jp @ Ja                                      # [E, H, W, 2, 6]
        Ji = -lie.adjT_apply(Gij[:, None, None, :], Jj)   # [E, H, W, 2, 6]

        # d(coords)/d(disp): source point moves along (0,0,0,1); transform
        # and project through the chain rule (projective_ops.py:139-140).
        dzvec = jnp.zeros_like(X0).at[..., 3].set(1.0)
        Jz_pt = lie.act4(Gij[:, None, None, :], dzvec)    # [E, H, W, 4]
        Jz = Jp @ Jz_pt[..., None]                        # [E, H, W, 2, 1]

    return x1, valid, (Ji, Jj, Jz)


def projective_transform_planes(
    poses: jax.Array,
    disps: jax.Array,
    intrinsics: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
):
    """`projective_transform(jacobian=True)` in TPU planes layout.

    Returns everything with the PIXEL axis minor:
        coords [E, 2, HW], valid [E, 1, HW],
        Ji, Jj [E, 6, 2, HW]   (tangent component, pixel-coord component)
        Jz     [E, 2, HW]
    Rationale: the [..., 2, 6]-minor layout pads 6 -> 128 lanes, so the BA
    Hessian einsums stream ~21x the real bytes — measured 9 ms of a 22 ms
    GN iteration at the frontend window (tools/prof_ba.py). In planes
    layout every Jacobian entry is an [E, HW] plane built from closed-form
    per-edge scalars; the H/E/C reductions become batched [6, 2HW]-by-
    [2HW, 6] MXU matmuls. Math identical to projective_ops.py:66-141.
    """
    E = ii.shape[0]
    ht, wd = disps.shape[-2:]
    HW = ht * wd
    dt = disps.dtype
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]

    grid = coords_grid(ht, wd, dtype=dt).reshape(HW, 2)
    X0x = ((grid[:, 0] - cx) / fx)[None, :]                     # [1, HW]
    X0y = ((grid[:, 1] - cy) / fy)[None, :]
    d = disps[ii].reshape(E, HW)                                # [E, HW]

    Gij = relative_poses(poses, ii, jj)                         # [E, 7]
    R = lie.quat_to_matrix(Gij[:, 3:7])                         # [E, 3, 3]
    t0, t1, t2 = (Gij[:, 0:1], Gij[:, 1:2], Gij[:, 2:3])        # [E, 1]

    def rc(r, c):
        return R[:, r, c][:, None]                              # [E, 1]

    # X1 = R @ (X0x, X0y, 1) + t * d  (homogeneous w carries d)
    x1 = rc(0, 0) * X0x + rc(0, 1) * X0y + rc(0, 2) + t0 * d
    y1 = rc(1, 0) * X0x + rc(1, 1) * X0y + rc(1, 2) + t1 * d
    z1 = rc(2, 0) * X0x + rc(2, 1) * X0y + rc(2, 2) + t2 * d

    Z = jnp.where(z1 < 0.5 * MIN_DEPTH, jnp.ones_like(z1), z1)
    px = fx * (x1 / Z) + cx
    py = fy * (y1 / Z) + cy
    coords = jnp.stack([px, py], axis=1)                        # [E, 2, HW]
    valid = (z1 > MIN_DEPTH).astype(dt)[:, None, :]             # [E, 1, HW]

    # Jp rows (proj jacobian): [a, 0, -u2, 0], [0, b, -v2, 0]
    a = fx / Z
    b = fy / Z
    u2 = a * (x1 / Z)
    v2 = b * (y1 / Z)

    # Ja (act4_jacobian at X1, tangent [tau, phi]); Jj = Jp @ Ja, rows:
    #   Jj0 = [a*d, 0,   -u2*d, -u2*y1,      a*z1 + u2*x1, -a*y1]
    #   Jj1 = [0,   b*d, -v2*d, -b*z1-v2*y1,  v2*x1,        b*x1]
    zero = jnp.zeros_like(a)
    Jj0 = [a * d, zero, -u2 * d, -u2 * y1, a * z1 + u2 * x1, -a * y1]
    Jj1 = [zero, b * d, -v2 * d, -b * z1 - v2 * y1, v2 * x1, b * x1]
    Jj = jnp.stack([jnp.stack(Jj0, axis=1),
                    jnp.stack(Jj1, axis=1)], axis=2)            # [E, 6, 2, HW]

    # Ji = -(Jj @ Ad(Gij)): per-edge [6, 6] contraction with scalars.
    # float32 matmul precision — feeds the BA normal equations (see
    # ba.bundle_adjust's precision note).
    with jax.default_matmul_precision("float32"):
        Adj = lie.adjoint(Gij)                                  # [E, 6, 6]
        Ji = -jnp.einsum("elcp,elk->ekcp", Jj, Adj)

    # Jz = Jp @ act4(G, e4) with act4(G, (0,0,0,1)) = (t, 1)
    Jz = jnp.stack([a * t0 - u2 * t2, b * t1 - v2 * t2], axis=1)  # [E, 2, HW]

    return coords, valid, (Ji, Jj, Jz)


def induced_flow(
    poses: jax.Array,
    disps: jax.Array,
    intrinsics: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
):
    """Optical flow induced by camera motion + depth, plus validity mask."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1 - coords0, valid
