"""Incremental frame-distance cache (tracking/dist_cache.py) vs fresh
recompute — VERDICT r3 next #6."""

import jax.numpy as jnp
import numpy as np
import pytest

from mneslam_tpu.config import make_config
from mneslam_tpu.tracking import video as video_lib
from mneslam_tpu.tracking.backend import Backend
from mneslam_tpu.tracking.dist_cache import FrameDistanceCache

HT, WD = 12, 16
INTR = jnp.asarray([16.0, 16.0, 8.0, 6.0])


def make_state(buffer=16, t=12, seed=0):
    rng = np.random.default_rng(seed)
    state = video_lib.init_video(buffer, HT, WD)
    poses = np.zeros((buffer, 7), np.float32)
    poses[:, :3] = np.cumsum(0.05 * rng.standard_normal((buffer, 3)), 0)
    q = rng.standard_normal((buffer, 4)) * 0.05
    q[:, 3] += 1.0
    poses[:, 3:] = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    disps = 0.5 + 0.3 * rng.random((buffer, HT, WD)).astype(np.float32)
    return state._replace(poses=jnp.asarray(poses), disps=jnp.asarray(disps),
                          timestamps=jnp.arange(buffer, dtype=jnp.float32)), t


def full_grid(state, t):
    ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
    return ii.reshape(-1), jj.reshape(-1)


def fresh_distances(state, ii, jj):
    return video_lib.frame_distance_padded(
        state, INTR, ii, jj, beta=0.3).astype(np.float64)


def test_cold_grid_matches_fresh():
    """Cold cache == direct full computation, exactly (symmetric dedupe +
    analytic diagonal change nothing: frame_distance is exactly symmetric
    and d(i,i) = 0)."""
    state, t = make_state()
    ii, jj = full_grid(state, t)
    cache = FrameDistanceCache(16)
    d_inc = cache.distance_grid(state, INTR, ii, jj, t)
    d_ref = fresh_distances(state, ii, jj)
    np.testing.assert_allclose(d_inc, d_ref, rtol=1e-6, atol=1e-6)
    # only the upper triangle was computed
    assert cache.recomputed_pairs == t * (t - 1) // 2


def test_incremental_matches_fresh_after_reposing_subset():
    """Re-pose a subset of frames (others bitwise unchanged, tol=0):
    the incremental grid equals a fresh recompute exactly, touching only
    pairs with a dirty endpoint."""
    state, t = make_state()
    ii, jj = full_grid(state, t)
    cache = FrameDistanceCache(16)  # tol 0 = bitwise
    cache.distance_grid(state, INTR, ii, jj, t)

    poses2 = np.array(state.poses)
    dirty = [3, 7, 8]
    poses2[dirty, :3] += 0.11
    disps2 = np.array(state.disps)
    disps2[7] *= 1.3
    state2 = state._replace(poses=jnp.asarray(poses2), disps=jnp.asarray(disps2))

    d_inc = cache.distance_grid(state2, INTR, ii, jj, t)
    d_ref = fresh_distances(state2, ii, jj)
    np.testing.assert_allclose(d_inc, d_ref, rtol=1e-6, atol=1e-6)
    n_dirty_pairs = sum(1 for a in range(t) for b in range(a + 1, t)
                        if a in dirty or b in dirty)
    assert cache.recomputed_pairs == n_dirty_pairs
    assert cache.recomputed_pairs < t * (t - 1) // 2


def test_partial_grid_then_full_stays_coherent():
    """A loop-window grid (rows = recent frames only) followed by the full
    grid: entries outside the first grid must not be wrongly marked fresh
    when their frames changed in between (the per-frame version stamps)."""
    state, t = make_state()
    cache = FrameDistanceCache(16)
    # loop-style partial grid: rows 8..11 x cols 0..11
    ixs = np.repeat(np.arange(8, t), t)
    jxs = np.tile(np.arange(t), t - 8)
    cache.distance_grid(state, INTR, ixs, jxs, t)

    poses2 = np.array(state.poses)
    poses2[2, :3] += 0.2            # frame 2: only touched pairs in cols
    state2 = state._replace(poses=jnp.asarray(poses2))
    ii, jj = full_grid(state2, t)
    d_inc = cache.distance_grid(state2, INTR, ii, jj, t)
    d_ref = fresh_distances(state2, ii, jj)
    np.testing.assert_allclose(d_inc, d_ref, rtol=1e-6, atol=1e-6)


def test_tolerance_mode_bounds_error_and_skips_recompute():
    """Sub-tolerance pose drift: nothing recomputes, and the stale values
    stay within the flow-sensitivity bound of a fresh computation."""
    state, t = make_state()
    ii, jj = full_grid(state, t)
    cache = FrameDistanceCache(16, pose_tol=1e-3, disp_tol=1e-2)
    cache.distance_grid(state, INTR, ii, jj, t)

    poses2 = np.array(state.poses)
    poses2[:, :3] += 2e-4           # below pose_tol everywhere
    state2 = state._replace(poses=jnp.asarray(poses2))
    d_inc = cache.distance_grid(state2, INTR, ii, jj, t)
    assert cache.recomputed_pairs == 0
    d_ref = fresh_distances(state2, ii, jj)
    finite = np.isfinite(d_ref) & (d_ref < 999) & (d_inc < 999)
    # flow sensitivity ~ f * |dpose| * O(1): fx=16, |d|=2e-4 -> ~0.01 px
    assert np.abs(d_inc[finite] - d_ref[finite]).max() < 0.05
    # above-tolerance motion invalidates as usual
    poses2[5, :3] += 0.05
    state3 = state2._replace(poses=jnp.asarray(poses2))
    cache.distance_grid(state3, INTR, ii, jj, t)
    assert cache.recomputed_pairs == t - 1


def test_backend_proposal_equal_with_and_without_cache():
    """Backend._propose_edges: identical edge sets with the cache enabled
    (cold AND incrementally warm) and disabled — the cache is a pure
    memoization of the distance grid."""
    state, t = make_state(seed=3)

    def propose(enabled, st, backend=None):
        if backend is None:
            cfg = make_config({"tracking": {
                "buffer": 16,
                "backend": {"dist_cache": {"enabled": enabled}},
            }})
            backend = Backend(params=None, intrinsics=INTR, config=cfg,
                              buffer=16, ht=HT, wd=WD)
            assert (backend.dist_cache is not None) == enabled
        es = backend._propose_edges(st, 0, t, 0, backend.radius, backend.nms,
                                    backend.thresh, max_factors=128,
                                    loop=False)
        return es, backend

    es_off, _ = propose(False, state)
    es_on, backend_on = propose(True, state)
    np.testing.assert_array_equal(es_on, es_off)

    # warm incremental proposal after re-posing two frames == fresh
    poses2 = np.array(state.poses)
    poses2[[4, 9], :3] += 0.08
    state2 = state._replace(poses=jnp.asarray(poses2))
    es_off2, _ = propose(False, state2)
    es_on2, _ = propose(True, state2, backend=backend_on)
    assert backend_on.dist_cache.recomputed_pairs < t * (t - 1) // 2
    np.testing.assert_array_equal(es_on2, es_off2)
