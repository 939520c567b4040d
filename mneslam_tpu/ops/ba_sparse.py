"""Full-history dense-BA with sparse Schur assembly.

The windowed solver in `ops/ba.py` materializes the pose-depth coupling E as
a dense [N, N, 6, HW] block matrix — fine for frontend windows, impossible
for a 250-keyframe global BA (~5 GB). This module solves the SAME system
(droid_kernels.cu `ba_cuda`, which also assembles S sparsely via its
EEt6x6/Ev6x1 kernels) without ever materializing E:

  S[p1, p2] = H[p1, p2] - sum_k E[p1, k] Q_k E[p2, k]^T

where E[p, k] is nonzero only when an edge couples pose p to depth frame
k = ii(edge). The host enumerates the contribution pairs (two per edge —
Ei at pose ii, Ej at pose jj — interacting within each depth-frame group)
into static padded index arrays; the device gathers the per-edge blocks and
reduces 6x6 products with `segment_sum`. Peak memory is one pair-chunk of
[chunk, 6, HW] blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lie, projective
from .ba import BAProblem, DEPTH_PRIOR_ALPHA, RES_WEIGHT, _solve_psd


class SchurPairs(NamedTuple):
    """Host-built static contribution-pair table.

    Each edge contributes two blocks: slot 2e   = (pose ii[e], Ei),
                                      slot 2e+1 = (pose jj[e], Ej),
    both attached to depth frame ii[e]. For every depth frame, all ordered
    pairs of its contribution slots produce one 6x6 term of S.
    """

    a: jax.Array      # [P] contribution slot index (into 2E blocks)
    b: jax.Array      # [P]
    mask: jax.Array   # [P] 1.0 valid
    n_pairs: int


def build_pairs(ii: np.ndarray, jj: np.ndarray, valid: np.ndarray,
                capacity: Optional[int] = None) -> SchurPairs:
    """Enumerate contribution pairs grouped by depth frame (host, tiny)."""
    groups = {}
    for e, (i, ok) in enumerate(zip(np.asarray(ii), np.asarray(valid))):
        if not ok:
            continue
        groups.setdefault(int(i), []).extend([2 * e, 2 * e + 1])
    a, b = [], []
    for slots in groups.values():
        for x in slots:
            for y in slots:
                a.append(x)
                b.append(y)
    n = len(a)
    cap = capacity or max(n, 1)
    pa = np.zeros(cap, np.int32)
    pb = np.zeros(cap, np.int32)
    m = np.zeros(cap, np.float32)
    pa[:n] = a[:cap]
    pb[:n] = b[:cap]
    m[:n] = 1.0
    return SchurPairs(jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(m), n)


@partial(jax.jit, static_argnames=("iters", "motion_only", "pair_chunk"))
def bundle_adjust_sparse(
    poses: jax.Array,          # [N, 7]
    disps: jax.Array,          # [N, h, w]
    intrinsics: jax.Array,
    problem: BAProblem,
    pairs: SchurPairs,
    disps_sens: Optional[jax.Array] = None,
    t0: int | jax.Array = 1,
    t1: Optional[jax.Array] = None,
    iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    motion_only: bool = False,
    pair_chunk: int = 2048,
):
    """Same semantics as ba.bundle_adjust, full-history capable."""
    N = poses.shape[0]
    E, ht, wd = problem.target.shape[0], disps.shape[1], disps.shape[2]
    HW = ht * wd
    D = 6

    if t1 is None:
        t1 = N
    frame_idx = jnp.arange(N)
    opt_pose = ((frame_idx >= t0) & (frame_idx < t1)).astype(disps.dtype)

    ii, jj, emask = problem.ii, problem.jj, problem.mask

    # planes layout, pixel axis minor (see projective_transform_planes /
    # ops/ba.py) — transposed once per call, outside the GN loop
    target_pl = problem.target.reshape(E, HW, 2).transpose(0, 2, 1)
    weight_pl = problem.weight.reshape(E, HW, 2).transpose(0, 2, 1)

    def one_iteration(_, state):
        poses, disps = state

        coords, valid, (Ji, Jj, Jz) = projective.projective_transform_planes(
            poses, disps, intrinsics, ii, jj
        )
        r = target_pl - coords                               # [E, 2, HW]
        w = RES_WEIGHT * valid * weight_pl * emask[:, None, None]

        wJi = w[:, None] * Ji                                # [E, D, 2, HW]
        wJj = w[:, None] * Jj
        Ji_f = Ji.reshape(E, D, 2 * HW)
        Jj_f = Jj.reshape(E, D, 2 * HW)
        wJi_f = wJi.reshape(E, D, 2 * HW)
        wJj_f = wJj.reshape(E, D, 2 * HW)
        r_f = r.reshape(E, 2 * HW)

        Hii = jnp.einsum("eip,ejp->eij", wJi_f, Ji_f)
        Hij = jnp.einsum("eip,ejp->eij", wJi_f, Jj_f)
        Hji = jnp.einsum("eip,ejp->eij", wJj_f, Ji_f)
        Hjj = jnp.einsum("eip,ejp->eij", wJj_f, Jj_f)
        vi = jnp.einsum("eip,ep->ei", wJi_f, r_f)
        vj = jnp.einsum("eip,ep->ei", wJj_f, r_f)

        H = (
            jax.ops.segment_sum(Hii, ii * N + ii, num_segments=N * N)
            + jax.ops.segment_sum(Hij, ii * N + jj, num_segments=N * N)
            + jax.ops.segment_sum(Hji, jj * N + ii, num_segments=N * N)
            + jax.ops.segment_sum(Hjj, jj * N + jj, num_segments=N * N)
        ).reshape(N, N, D, D)
        v = (jax.ops.segment_sum(vi, ii, num_segments=N)
             + jax.ops.segment_sum(vj, jj, num_segments=N))

        H = H * opt_pose[:, None, None, None] * opt_pose[None, :, None, None]
        v = v * opt_pose[:, None]
        Hmat = H.transpose(0, 2, 1, 3).reshape(N * D, N * D)
        Hmat = Hmat + jnp.diag(ep + lm * jnp.diagonal(Hmat))
        Hmat = Hmat + jnp.diag(jnp.repeat(1.0 - opt_pose, D))
        vvec = v.reshape(N * D)

        if motion_only:
            dx = _solve_psd(Hmat, vvec).reshape(N, D) * opt_pose[:, None]
            return _retract(poses, dx, opt_pose), disps

        # per-edge pose-depth blocks, stacked as 2E contribution slots
        Ei = jnp.einsum("edcp,ecp->edp", wJi, Jz)          # [E, D, HW]
        Ej = jnp.einsum("edcp,ecp->edp", wJj, Jz)
        Eblk = jnp.stack([Ei, Ej], axis=1).reshape(2 * E, D, HW)
        blk_pose = jnp.stack([ii, jj], axis=1).reshape(2 * E)   # pose of slot
        blk_k = jnp.repeat(ii, 2)                                # depth frame
        # gauge: blocks of fixed/padded poses drop out of the reduced system
        slot_w = jnp.repeat(emask, 2) * opt_pose[blk_pose]
        Eblk = Eblk * slot_w[:, None, None]
        blk_pose = blk_pose * slot_w.astype(blk_pose.dtype)

        wJz = w * Jz                                       # [E, 2, HW]
        Ck = jnp.sum(wJz * Jz, axis=1)
        wk = jnp.sum(wJz * r, axis=1)
        C = jax.ops.segment_sum(Ck, ii, num_segments=N) + problem.eta.reshape(N, HW) + 1e-7
        wvec = jax.ops.segment_sum(wk, ii, num_segments=N)
        if disps_sens is not None:
            has = (disps_sens.reshape(N, HW) > 0).astype(C.dtype)
            C = C + DEPTH_PRIOR_ALPHA * has
            wvec = wvec + DEPTH_PRIOR_ALPHA * has * (
                disps_sens.reshape(N, HW) - disps.reshape(N, HW))
        Q = 1.0 / C                                             # [N, HW]

        # ---- S = H - sum over pairs, chunked gathers ----
        P = pairs.a.shape[0]
        pad = (pair_chunk - P % pair_chunk) % pair_chunk
        pa = jnp.concatenate([pairs.a, jnp.zeros(pad, pairs.a.dtype)])
        pb = jnp.concatenate([pairs.b, jnp.zeros(pad, pairs.b.dtype)])
        pm = jnp.concatenate([pairs.mask, jnp.zeros(pad, pairs.mask.dtype)])

        def pair_body(carry, args):
            S_acc = carry
            a_c, b_c, m_c = args
            A = Eblk[a_c]                                  # [c, D, HW]
            B = Eblk[b_c]
            Qk = Q[blk_k[a_c]]                             # [c, HW]
            M = jnp.einsum("cih,cjh->cij", A * Qk[:, None, :], B) * m_c[:, None, None]
            seg = blk_pose[a_c] * N + blk_pose[b_c]
            S_acc = S_acc + jax.ops.segment_sum(M, seg, num_segments=N * N)
            return S_acc, None

        S_blocks, _ = jax.lax.scan(
            pair_body, jnp.zeros((N * N, D, D)),
            (pa.reshape(-1, pair_chunk), pb.reshape(-1, pair_chunk),
             pm.reshape(-1, pair_chunk)),
        )
        EQEt = S_blocks.reshape(N, N, D, D).transpose(0, 2, 1, 3).reshape(N * D, N * D)
        S = Hmat - EQEt

        # rhs = v - sum_e Eblk_e (Q w)[k_e]
        Qw = (Q * wvec)                                     # [N, HW]
        contrib = jnp.einsum("sdh,sh->sd", Eblk, Qw[blk_k]) # [2E, D]
        contrib = contrib * jnp.repeat(emask, 2)[:, None]
        rhs = vvec - jax.ops.segment_sum(
            contrib, blk_pose, num_segments=N).reshape(N * D)

        dx = _solve_psd(S, rhs)
        # dz_k = Q_k (w_k - sum_{slots with k} Eblk^T dx[pose])
        dx_n = dx.reshape(N, D) * opt_pose[:, None]
        Etdx = jnp.einsum("sdh,sd->sh", Eblk, dx_n[blk_pose])  # [2E, HW]
        Etdx = Etdx * jnp.repeat(emask, 2)[:, None]
        Etdx_k = jax.ops.segment_sum(Etdx, blk_k, num_segments=N)
        dz = Q * (wvec - Etdx_k)

        new_poses = _retract(poses, dx_n, opt_pose)
        new_disps = disps + dz.reshape(N, ht, wd)
        new_disps = jnp.where(new_disps > 10.0, 0.0, new_disps)
        new_disps = jnp.maximum(new_disps, 0.0)
        return new_poses, new_disps

    # float32 matmul precision for the same reason as ba.bundle_adjust:
    # bf16-precision Hessian/Cholesky contractions diverge on
    # ill-conditioned windows (see the note there).
    with jax.default_matmul_precision("float32"):
        poses, disps = jax.lax.fori_loop(0, iters, one_iteration, (poses, disps))
    return poses, disps


def _retract(poses, dx, opt_pose):
    new_poses = lie.retr(poses, dx)
    return jnp.where(opt_pose[:, None] > 0, new_poses, poses)
