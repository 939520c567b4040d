"""Incremental frame-distance cache for BA edge proposal.

The reference recomputes the full t x t `frame_distance` grid on every
global/loop BA (`/root/reference/tracker/backend.py:25-123` — its CUDA
kernel is launched over all pairs each call). At ScanNet buffer scale
(t=512) that full-pair recompute costs ~200-260 ms per BA on one v5e
(BENCH_r03.json scannet_scale.proposal_ms) even though most keyframes'
poses and depths barely moved since the previous proposal. This cache is
the TPU rebuild's upgrade (VERDICT r3 next #6): persist the distance
matrix across proposals and recompute only pairs whose endpoints actually
changed.

Design:
  * d(i, j) depends only on (pose_i, disp_i, pose_j, disp_j, intrinsics,
    beta) and is exactly symmetric (`frame_distance` averages both
    directions; float addition is commutative), so the cache stores one
    [buffer, buffer] matrix and computes each unordered pair once —
    halving the pair count of the meshgrid proposal even on a cold call.
    The diagonal is analytic: d(i, i) = 0 (identity relative pose, zero
    flow, full validity).
  * Per-frame change detection runs on device in ONE fused reduction over
    the video buffer: a frame is dirty when its pose moved more than
    `pose_tol` (L-inf over the 7-vector) or any disparity pixel moved more
    than `disp_tol` since the snapshot taken at the last proposal. Version
    counters stamp every cached entry, so an entry is reused only when
    BOTH endpoints are still at the stamped versions — pairs outside a
    proposal's grid stay correctly stale-marked when their frames change.
  * Tolerances default to 0.0 (bitwise — any pose/disp change recomputes
    the row, matching the reference's always-fresh values exactly). A BA
    step rewrites every pose it touches, so exact mode only saves the
    never-reposed tail and the symmetric half. The production win comes
    from small tolerances (`tracking.backend.cache_pose_tol/…_disp_tol`):
    flow-distance sensitivity is ~f px per unit pose error (f ~ 40 at the
    1/8-resolution tracking grid, disp ~ 0.7), so pose_tol 1e-4 bounds the
    stale-entry error to ~0.01 px against proposal thresholds of 16-25 px.
    Frames that a converged BA did not materially move then stay clean.

Memory: float64 [buffer, buffer] distances + int32 stamps (512 -> 3 MB
host) plus one device-side snapshot of poses[buffer, 7] and
disps[buffer, h, w] (~2.5 MB at ScanNet scale).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import video as video_lib


@partial(jax.jit, static_argnames=())
def _dirty_flags(poses, disps, snap_poses, snap_disps, pose_tol, disp_tol):
    """Per-frame bool [buffer]: moved beyond tolerance since the snapshot.
    tol == 0 means bitwise inequality (NaN-safe: != catches NaN flips)."""
    dp = jnp.max(jnp.abs(poses - snap_poses), axis=1)
    dd = jnp.max(jnp.abs(disps - snap_disps).reshape(disps.shape[0], -1), axis=1)
    neq_p = jnp.any(poses != snap_poses, axis=1)
    neq_d = jnp.any((disps != snap_disps).reshape(disps.shape[0], -1), axis=1)
    pose_dirty = jnp.where(pose_tol > 0, dp > pose_tol, neq_p)
    disp_dirty = jnp.where(disp_tol > 0, dd > disp_tol, neq_d)
    return pose_dirty | disp_dirty


class FrameDistanceCache:
    """Host-side coordinator; all heavy compute stays on device."""

    def __init__(self, buffer: int, pose_tol: float = 0.0,
                 disp_tol: float = 0.0, beta: float = 0.3):
        self.buffer = int(buffer)
        self.pose_tol = float(pose_tol)
        self.disp_tol = float(disp_tol)
        self.beta = float(beta)
        self.d = np.full((buffer, buffer), np.nan, np.float64)
        # per-frame version at which each entry's endpoints were computed
        self.stamp_i = np.full((buffer, buffer), -1, np.int64)
        self.stamp_j = np.full((buffer, buffer), -1, np.int64)
        self.version = np.zeros(buffer, np.int64)
        self.seen = np.zeros(buffer, bool)      # frame ever snapshotted
        self._snap_poses = None                 # device arrays
        self._snap_disps = None

    # ------------------------------------------------------------------

    def _refresh_versions(self, state, t_end: int):
        """Detect frames whose pose/disp moved since the last snapshot,
        bump their versions, and take the new snapshot. One device
        reduction + one [buffer]-sized readback."""
        if self._snap_poses is None:
            dirty = np.ones(self.buffer, bool)
        else:
            flags = _dirty_flags(state.poses, state.disps,
                                 self._snap_poses, self._snap_disps,
                                 jnp.float32(self.pose_tol),
                                 jnp.float32(self.disp_tol))
            dirty = np.array(flags)
        dirty |= ~self.seen
        dirty[t_end:] = False                   # beyond-counter slots: unused
        self.version[dirty] += 1
        self.seen[:t_end] = True
        # tolerance semantics: the snapshot only moves for DIRTY frames, so
        # sub-tolerance drift cannot accumulate unboundedly between
        # snapshots of a clean frame
        if self._snap_poses is None:
            self._snap_poses = state.poses
            self._snap_disps = state.disps
        elif dirty.any():
            m = jnp.asarray(dirty)
            self._snap_poses = jnp.where(m[:, None], state.poses,
                                         self._snap_poses)
            self._snap_disps = jnp.where(m[:, None, None], state.disps,
                                         self._snap_disps)
        return dirty

    def distance_grid(self, state, intrinsics, ii: np.ndarray,
                      jj: np.ndarray, t_end: int) -> np.ndarray:
        """Distances for an arbitrary pair list (the proposal meshgrid),
        recomputing only pairs whose endpoints changed."""
        ii = np.asarray(ii, np.int64)
        jj = np.asarray(jj, np.int64)
        self._refresh_versions(state, t_end)

        vi, vj = self.version[ii], self.version[jj]
        lo, hi = np.minimum(ii, jj), np.maximum(ii, jj)
        fresh = ((self.stamp_i[lo, hi] == self.version[lo])
                 & (self.stamp_j[lo, hi] == self.version[hi]))
        need = ~fresh & (ii != jj)
        # unique unordered pairs among the stale ones
        key = lo[need] * self.buffer + hi[need]
        ukey = np.unique(key)
        ui, uj = ukey // self.buffer, ukey % self.buffer
        if len(ui):
            d_new = video_lib.frame_distance_padded(
                state, intrinsics, ui, uj, beta=self.beta).astype(np.float64)
            self.d[ui, uj] = d_new
            self.d[uj, ui] = d_new
            self.stamp_i[ui, uj] = self.version[ui]
            self.stamp_j[ui, uj] = self.version[uj]
            self.stamp_i[uj, ui] = self.version[uj]
            self.stamp_j[uj, ui] = self.version[ui]
        # diagonal is analytically zero; keep stamps coherent
        diag = ii == jj
        if diag.any():
            self.d[ii[diag], ii[diag]] = 0.0
        out = self.d[ii, jj].copy()
        self.recomputed_pairs = int(len(ui))     # introspection for tests/bench
        self.requested_pairs = int(len(ii))
        return out
