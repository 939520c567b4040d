"""Dense bundle adjustment (DBA) as batched Gauss-Newton + Schur solve.

TPU-native replacement for the reference's fused CUDA BA
(`/root/reference/src/lib/droid_kernels.cu:1314-1433`, whose executable
Python spec is `/root/reference/tracker/geom/ba.py:26-101` +
`tracker/geom/chol.py`): one call performs `iters` damped Gauss-Newton
iterations over keyframe poses and per-pixel inverse depths given dense
reprojection targets and confidence weights on a factor-graph edge set.

Design notes (TPU-first):
  * Static shapes everywhere: the edge set is a fixed-capacity table with a
    validity mask; fixed poses are handled by masking rows/columns of the
    pose Hessian rather than slicing, so one compiled kernel serves every
    window position.
  * The per-pixel Jacobian -> 6x6 block reduction is expressed as einsums
    over the (edge, pixel) axes — XLA maps these onto the MXU directly.
  * The depth block C is diagonal per pixel, so the Schur complement needs
    only one big [6P, EHW]-by-[EHW, 6P] matmul — MXU food.
  * Depth updates are scatter-added per source frame with `segment_sum`
    (replacing torch_scatter), exactly mirroring the reference's
    `safe_scatter_add_*` semantics.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import lie, projective

# Same constants as the reference kernels.
RES_WEIGHT = 0.001          # ba.py:38 — global residual weight
DEPTH_PRIOR_ALPHA = 0.05    # droid_kernels.cu:1396 — RGB-D disparity prior
LM_LAMBDA = 1e-4            # chol.py:46 — multiplicative damping
LM_EP = 0.1                 # chol.py:46 — additive damping


class BAProblem(NamedTuple):
    """Static-shape DBA inputs.

    target  [E, H, W, 2]  reprojection targets (predicted correspondences)
    weight  [E, H, W, 2]  per-pixel, per-component confidence
    eta     [N, H, W]     per-frame depth damping (from the update net)
    ii, jj  [E]           edge endpoints (int32); padded edges may point at 0
    mask    [E]           1.0 for real edges, 0.0 for padding
    """

    target: jax.Array
    weight: jax.Array
    eta: jax.Array
    ii: jax.Array
    jj: jax.Array
    mask: jax.Array


def _solve_psd(S: jax.Array, rhs: jax.Array) -> jax.Array:
    """Cholesky solve; returns zeros when the factorization fails.

    Mirrors the reference's exception-tolerant CholeskySolver
    (`tracker/geom/chol.py:4-29`) without host control flow: NaN/Inf in the
    factor marks failure and the update is suppressed.
    """
    L = jax.scipy.linalg.cholesky(S, lower=True)
    x = jax.scipy.linalg.cho_solve((L, True), rhs)
    ok = jnp.all(jnp.isfinite(x))
    return jnp.where(ok, x, jnp.zeros_like(x))


@partial(jax.jit, static_argnames=("iters", "motion_only"))
def bundle_adjust(
    poses: jax.Array,
    disps: jax.Array,
    intrinsics: jax.Array,
    problem: BAProblem,
    disps_sens: Optional[jax.Array] = None,
    t0: int | jax.Array = 1,
    t1: Optional[jax.Array] = None,
    iters: int = 2,
    lm: float = LM_LAMBDA,
    ep: float = LM_EP,
    motion_only: bool = False,
):
    """Run `iters` damped GN iterations; returns (poses, disps).

    poses [N, 7] w2c, disps [N, H, W] inverse depth (1/8 res), t0 = first
    optimized pose index (earlier poses are gauge-fixed), t1 = one past the
    last active frame (poses >= t1 are masked out of the system).
    """
    N = poses.shape[0]
    E, ht, wd = problem.target.shape[0], disps.shape[1], disps.shape[2]
    HW = ht * wd
    D = 6

    if t1 is None:
        t1 = N
    frame_idx = jnp.arange(N)
    opt_pose = ((frame_idx >= t0) & (frame_idx < t1)).astype(disps.dtype)  # [N]

    ii, jj, emask = problem.ii, problem.jj, problem.mask

    # Planes layout (pixel axis minor — see projective_transform_planes):
    # target/weight transposed ONCE per call, outside the GN loop.
    target_pl = problem.target.reshape(E, HW, 2).transpose(0, 2, 1)  # [E,2,HW]
    weight_pl = problem.weight.reshape(E, HW, 2).transpose(0, 2, 1)

    def one_iteration(_, state):
        poses, disps = state

        coords, valid, (Ji, Jj, Jz) = projective.projective_transform_planes(
            poses, disps, intrinsics, ii, jj
        )
        # Residuals and weights as (xy-component, pixel) planes.
        r = target_pl - coords                             # [E, 2, HW]
        w = RES_WEIGHT * valid * weight_pl * emask[:, None, None]

        wJi = w[:, None] * Ji                              # [E, D, 2, HW]
        wJj = w[:, None] * Jj
        Ji_f = Ji.reshape(E, D, 2 * HW)
        Jj_f = Jj.reshape(E, D, 2 * HW)
        wJi_f = wJi.reshape(E, D, 2 * HW)
        wJj_f = wJj.reshape(E, D, 2 * HW)
        r_f = r.reshape(E, 2 * HW)

        # --- pose-pose blocks (per edge, 6x6): batched [D, 2HW] matmuls ---
        Hii = jnp.einsum("eip,ejp->eij", wJi_f, Ji_f)
        Hij = jnp.einsum("eip,ejp->eij", wJi_f, Jj_f)
        Hji = jnp.einsum("eip,ejp->eij", wJj_f, Ji_f)
        Hjj = jnp.einsum("eip,ejp->eij", wJj_f, Jj_f)
        vi = jnp.einsum("eip,ep->ei", wJi_f, r_f)
        vj = jnp.einsum("eip,ep->ei", wJj_f, r_f)

        # --- pose-depth blocks (per edge, 6 x HW): c-plane contraction ---
        Ei = jnp.einsum("edcp,ecp->edp", wJi, Jz)          # [E, D, HW]
        Ej = jnp.einsum("edcp,ecp->edp", wJj, Jz)

        # --- depth-depth diagonal + rhs (per edge, HW) ---
        wJz = w * Jz                                       # [E, 2, HW]
        Ck = jnp.sum(wJz * Jz, axis=1)                     # [E, HW]
        wk = jnp.sum(wJz * r, axis=1)                      # [E, HW]

        # --- scatter-assemble the dense pose system over all N frames ---
        # (fixed/padded poses handled by masking, keeping shapes static)
        pair = ii * N + jj
        H = (
            jax.ops.segment_sum(Hii, ii * N + ii, num_segments=N * N)
            + jax.ops.segment_sum(Hij, pair, num_segments=N * N)
            + jax.ops.segment_sum(Hji, jj * N + ii, num_segments=N * N)
            + jax.ops.segment_sum(Hjj, jj * N + jj, num_segments=N * N)
        ).reshape(N, N, D, D)
        v = (
            jax.ops.segment_sum(vi, ii, num_segments=N)
            + jax.ops.segment_sum(vj, jj, num_segments=N)
        )  # [N, D]

        # Gauge-fix: zero rows/cols of non-optimized poses.
        H = H * opt_pose[:, None, None, None] * opt_pose[None, :, None, None]
        v = v * opt_pose[:, None]

        # Damping (chol.py:52-57) + identity on fixed diagonal blocks so the
        # full [6N, 6N] system stays SPD.
        Hmat = H.transpose(0, 2, 1, 3).reshape(N * D, N * D)
        diag = jnp.diagonal(Hmat)
        Hmat = Hmat + jnp.diag(ep + lm * diag)
        fixed_diag = jnp.repeat(1.0 - opt_pose, D)
        Hmat = Hmat + jnp.diag(fixed_diag)
        vvec = v.reshape(N * D)

        if motion_only:
            dx = _solve_psd(Hmat, vvec).reshape(N, D) * opt_pose[:, None]
            new_poses = _retract_poses(poses, dx, opt_pose)
            return new_poses, disps

        # --- depth system: diagonal C per (frame, pixel) ---
        C = jax.ops.segment_sum(Ck, ii, num_segments=N)   # [N, HW]
        wvec = jax.ops.segment_sum(wk, ii, num_segments=N)
        C = C + problem.eta.reshape(N, HW) + 1e-7
        if disps_sens is not None:
            has_sens = (disps_sens.reshape(N, HW) > 0).astype(C.dtype)
            C = C + DEPTH_PRIOR_ALPHA * has_sens
            wvec = wvec + DEPTH_PRIOR_ALPHA * has_sens * (
                disps_sens.reshape(N, HW) - disps.reshape(N, HW)
            )

        # --- pose-depth coupling + Schur complement, edge-pairwise ---
        # The dense E matrix is [N*D, N*HW] with nonzero 6xHW blocks only at
        # (p=ii,k=ii) and (p=jj,k=ii) per edge, so materializing it (and the
        # layout transposes that follow) wastes HBM traffic on zeros. Instead
        # stack the per-edge blocks [2E, D, HW] and form the Schur terms
        # directly: S[p_a, p_b] -= Ea Q_k Eb^T over block pairs sharing a
        # source frame k — one big MXU matmul + a small block scatter.
        Ecat = jnp.concatenate([Ei, Ej], axis=0)          # [2E, D, HW]
        pidx = jnp.concatenate([ii, jj])                  # pose row per block
        kidx = jnp.concatenate([ii, ii])                  # depth frame per block
        Ecat = Ecat * opt_pose[pidx][:, None, None]       # gauge-fix rows

        Qk = (1.0 / C)[kidx]                              # [2E, HW]
        Pq = Ecat * Qk[:, None, :]                        # E Q, blockwise

        # S -= sum over same-source block pairs of (E Q) E^T, entirely in
        # the lane-dense [2E*D, 2E*D] space: Gflat[a*D+d, b*D+e] =
        # sum_p Pq[a,d,p] Ecat[b,e,p] via ONE MXU matmul; the same-source
        # mask expands blockwise; and the per-pose-pair accumulation is
        # S -= L^T (G o M) L with L the block one-hot routing slot a to
        # pose pidx[a] (two thin matmuls). The earlier formulations — (2E)^2
        # batched 6x6 einsum, or reshaping to [2E,2E,6,6] + a 132k-segment
        # scatter — both stream lane-padded 6-minor arrays and were the
        # hottest stage of the GN iteration (tools/prof_ba.py).
        twoE = Pq.shape[0]
        Gflat = jax.lax.dot_general(
            Pq.reshape(twoE * D, HW), Ecat.reshape(twoE * D, HW),
            (((1,), (1,)), ((), ())),
        )                                                 # [2E*D, 2E*D]
        same_k = (kidx[:, None] == kidx[None, :]).astype(Gflat.dtype)
        M = jnp.repeat(jnp.repeat(same_k, D, axis=0), D, axis=1)
        onehot = (pidx[:, None] == jnp.arange(N)[None, :]).astype(Gflat.dtype)
        L = (onehot[:, None, :, None]
             * jnp.eye(D, dtype=Gflat.dtype)[None, :, None, :]
             ).reshape(twoE * D, N * D)
        S = Hmat - L.T @ (Gflat * M) @ L

        # rhs -= (E Q) w, blockwise then scattered per pose.
        rhs_blocks = jnp.einsum("adp,ap->ad", Pq, wvec[kidx])
        rhs = vvec - jax.ops.segment_sum(
            rhs_blocks, pidx, num_segments=N).reshape(N * D)

        dx = _solve_psd(S, rhs)

        # dz = Q (w - E^T dx): back-substitute blockwise per source frame.
        Etdx = jnp.einsum("adp,ad->ap", Ecat, dx.reshape(N, D)[pidx])
        Etdx = jax.ops.segment_sum(Etdx, kidx, num_segments=N)  # [N, HW]
        dz = ((wvec - Etdx) / C).reshape(N * HW)

        dx = dx.reshape(N, D) * opt_pose[:, None]
        new_poses = _retract_poses(poses, dx, opt_pose)
        new_disps = disps + dz.reshape(N, ht, wd)
        # Reference clamps: implausible (>10) disparities reset to 0, then
        # floored at 0 (ba.py:98-99).
        new_disps = jnp.where(new_disps > 10.0, 0.0, new_disps)
        new_disps = jnp.maximum(new_disps, 0.0)
        return new_poses, new_disps

    # The reference BA is full-fp32 CUDA (droid_kernels.cu); on TPU the
    # DEFAULT matmul precision runs every Hessian/Schur contraction AND the
    # blocked Cholesky factorization as single-pass bf16 — usually survivable
    # (GN is self-correcting), but an ill-conditioned window makes the
    # bf16-factored solve return a finite-but-wrong step and the trajectory
    # explodes (reproduced: 60-frame fast-motion slice at 240x320, poses
    # flying to 12 m while the same program on CPU stays at 0.2 mm —
    # BASELINE.md round 3). Trace the whole GN loop at float32 precision.
    with jax.default_matmul_precision("float32"):
        poses, disps = jax.lax.fori_loop(0, iters, one_iteration, (poses, disps))
    return poses, disps


def _retract_poses(poses: jax.Array, dx: jax.Array, opt_pose: jax.Array) -> jax.Array:
    new_poses = lie.retr(poses, dx)
    return jnp.where(opt_pose[:, None] > 0, new_poses, poses)


def reprojection_residuals(poses, disps, intrinsics, problem: BAProblem):
    """Masked mean reprojection error in pixels — debugging/metrics aid."""
    coords, valid = projective.projective_transform(
        poses, disps, intrinsics, problem.ii, problem.jj
    )
    err = jnp.linalg.norm(problem.target - coords, axis=-1) * valid[..., 0]
    err = err * problem.mask[:, None, None]
    denom = jnp.maximum(jnp.sum(valid[..., 0] * problem.mask[:, None, None]), 1.0)
    return jnp.sum(err) / denom
