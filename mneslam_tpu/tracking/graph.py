"""Factor graph: host-managed edge table + jitted GRU/DBA update megastep.

Rebuild of `/root/reference/tracker/factor_graph.py` per SURVEY.md §7.1:
edge bookkeeping (dedup, age-based eviction, NMS proximity selection,
keyframe index remapping) is tiny O(window^2) work and stays on the host in
numpy; everything per-pixel — reprojection, correlation lookup, ConvGRU,
damping aggregation, and the damped GN/Schur bundle adjustment — is ONE
compiled XLA program (`update_step`) over a fixed-capacity padded edge
table, so the TPU never recompiles as edges come and go.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import droid_net
from ..ops import correlation, projective
from . import video as video_lib



def _gather_feat_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row-gather of a [N, C, h, w] feature buffer through a 2D view.

    Gathering big rows on the 4D tiled layout lowers to a serialized
    per-row copy loop (~13 GB/s measured in the round-3 frontend trace:
    10.7 ms for 91 x 1.6 MB rows); the flat 2D row gather runs at
    HBM bandwidth and the reshape back is a cheap relayout."""
    N = table.shape[0]
    flat = table.reshape(N, -1)
    return flat[idx].reshape((idx.shape[0],) + table.shape[1:])


@jax.jit
def _add_factors_step(
    state: video_lib.VideoState,
    intrinsics: jax.Array,
    net_buf: jax.Array,     # [capacity, 128, h, w]
    target_buf: jax.Array,  # [capacity, h, w, 2]
    weight_buf: jax.Array,  # [capacity, h, w, 2]
    ii_p: jax.Array,        # [cap] new-edge sources, zero-padded
    jj_p: jax.Array,        # [cap]
    n0: jax.Array,          # scalar write offset (traced: no recompile per offset)
):
    """Device half of add_factors as ONE dispatch (factor_graph.py:110-133).

    The eager formulation paid ~6 remote dispatches per call (nets gather,
    cast, reproject, zeros, 3 buffer updates) — ~45 ms of the bench
    global-BA composite at buffer 512. The edge list is padded to the next
    power of two (same compile-variant bound as frame_distance_padded);
    pad rows compute the valid (0,0) edge and land in buffer slots beyond
    the active count, which every consumer masks or never reads. Caller
    guarantees n0 + cap <= capacity so the padded block write cannot clamp.
    """
    target, _ = video_lib.reproject(state, intrinsics, ii_p, jj_p)
    new_net = _gather_feat_rows(state.nets, ii_p).astype(net_buf.dtype)
    net_buf = jax.lax.dynamic_update_slice_in_dim(net_buf, new_net, n0, axis=0)
    target_buf = jax.lax.dynamic_update_slice_in_dim(target_buf, target, n0, axis=0)
    weight_buf = jax.lax.dynamic_update_slice_in_dim(
        weight_buf, jnp.zeros_like(target), n0, axis=0)
    return net_buf, target_buf, weight_buf


@partial(jax.jit, static_argnames=("update_fn", "agg_fn"))
def gru_chunk_step(
    state: video_lib.VideoState,
    params: Dict,
    intrinsics: jax.Array,
    ii: jax.Array,        # [chunk]
    jj: jax.Array,        # [chunk]
    mask: jax.Array,      # [chunk]
    net: jax.Array,       # [chunk, 128, h, w]
    target: jax.Array,    # [chunk, h, w, 2]
    update_fn=None,
    agg_fn=None,
):
    """The correlate -> ConvGRU half of `update_step` over ONE edge chunk.

    This is the reference's `update_lowmem` memory bound
    (factor_graph.py:280-346, s=13 source frames per pass): the [E, 196,
    h, w] correlation volume and GRU activations exist only at chunk size,
    so full-history/loop BA over hundreds of keyframes never materializes
    the whole-graph corr volume. Returns (new_net, new_target, weight,
    eta, upmask) for the chunk; the caller accumulates and runs the BA
    half once over all edges.
    """
    B = state.poses.shape[0]
    ht, wd = state.disps.shape[1:]
    coords0 = projective.coords_grid(ht, wd)

    coords1, _ = video_lib.reproject(state, intrinsics, ii, jj)
    motion = jnp.concatenate([coords1 - coords0, target - coords1], axis=-1)
    motion = jnp.clip(motion, -64.0, 64.0).transpose(0, 3, 1, 2)

    corr = correlation.alt_corr(state.fmaps, ii, jj, coords1,
                                mask=mask.astype(jnp.int32))

    if update_fn is None:
        new_net, delta, weight = droid_net.update_apply(
            params["update"], net, _gather_feat_rows(state.inps, ii), corr, motion
        )
    else:
        new_net, delta, weight = update_fn(params, state, ii, jj, net, corr,
                                           motion, coords1)
    if agg_fn is None:
        eta, upmask = droid_net.agg_apply(params["update"]["agg"], new_net, ii, mask, B)
    else:
        eta, upmask = agg_fn(params, new_net, ii, mask, B)

    # per-chunk damping scatter (the reference scatters per lowmem pass,
    # factor_graph.py:320-323); padded edges write to a trash row
    ii_scatter = jnp.where(mask > 0, ii, B)
    damping = jnp.concatenate([state.damping, jnp.zeros((1, ht, wd))], axis=0)
    damping = damping.at[ii_scatter].set(eta)[:B]
    state = state._replace(damping=damping)
    return state, new_net, coords1 + delta, weight, upmask


@partial(jax.jit, static_argnames=("window", "iters", "motion_only"))
def ba_step(
    state: video_lib.VideoState,
    intrinsics: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
    mask: jax.Array,
    target: jax.Array,
    weight: jax.Array,
    t0: jax.Array,
    t1: jax.Array,
    window: int,
    iters: int = 2,
    motion_only: bool = False,
    lm: float = 1e-4,
    ep: float = 0.1,
    pairs=None,
):
    """The BA half of `update_step` over the full (already GRU-updated)
    edge table; `state.damping` was scattered by the gru chunks."""
    if pairs is not None:
        state = video_lib.full_ba(
            state, intrinsics, target, weight, ii, jj, mask,
            pairs, t0=t0, t1=t1, iters=iters, lm=lm, ep=ep,
            motion_only=motion_only,
        )
    else:
        state = video_lib.windowed_ba(
            state, intrinsics, target, weight, ii, jj, mask,
            t0=t0, t1=t1, window=window, iters=iters, lm=lm, ep=ep,
            motion_only=motion_only,
        )
    return state


@partial(jax.jit, static_argnames=("window", "iters", "motion_only",
                                   "update_fn", "agg_fn", "chunk"))
def update_chunked_step(
    state: video_lib.VideoState,
    params: Dict,
    intrinsics: jax.Array,
    ii: jax.Array,        # [cap] — cap is a multiple of `chunk`
    jj: jax.Array,
    mask: jax.Array,
    net: jax.Array,       # [cap, 128, h, w]
    target: jax.Array,    # [cap, h, w, 2]
    ii_inac: jax.Array,
    jj_inac: jax.Array,
    mask_inac: jax.Array,
    target_inac: jax.Array,
    weight_inac: jax.Array,
    t0: jax.Array,
    t1: jax.Array,
    n_chunks: jax.Array,  # dynamic: ceil(n_active / chunk)
    window: int,
    chunk: int,
    iters: int = 2,
    motion_only: bool = False,
    lm: float = 1e-4,
    ep: float = 0.1,
    update_fn=None,
    agg_fn=None,
    pairs=None,
):
    """The memory-bounded tracker update (the reference's `update_lowmem`,
    factor_graph.py:280-346) as ONE compiled program: a fori_loop over
    fixed-size edge chunks (corr volume + GRU activations exist only at
    chunk size) followed by one BA over the full edge table.

    Semantics are identical to looping `gru_chunk_step` on the host and
    calling `ba_step` (the round-4 structure;
    tests/test_graph.py::test_update_chunked_megastep_matches_loop) — the
    win is structural: the host loop paid per-chunk eager dispatch plus
    three full-capacity `dynamic_update_slice` copies per chunk OUTSIDE
    jit (~400 MB of copy traffic per chunk at ScanNet scale), which XLA
    now keeps in-place inside the loop. Chunk 0 is traced inline (its
    upmask is the one the caller keeps — the reference keeps the LAST
    lowmem pass's upsample mask but only consumes it on the frontend path
    where chunking is off; chunk 0 preserves the round-4 behavior);
    chunks 1..n_chunks run under a dynamic-bound fori_loop so trailing
    all-padding chunks cost nothing and n_active changes don't recompile.
    """
    def run_chunk(c, st, net, target, weight):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk,
                                                    axis=0)
        st, net_c, tgt_c, w_c, up_c = gru_chunk_step(
            st, params, intrinsics, sl(ii), sl(jj), sl(mask), sl(net),
            sl(target), update_fn=update_fn, agg_fn=agg_fn)
        upd = lambda a, v: jax.lax.dynamic_update_slice_in_dim(
            a, v, c * chunk, axis=0)
        return st, upd(net, net_c), upd(target, tgt_c), upd(weight, w_c), up_c

    weight = jnp.zeros_like(target)
    st, net, target, weight, upmask = run_chunk(
        jnp.asarray(0, jnp.int32), state, net, target, weight)

    def body(c, carry):
        damping, net, target, weight = carry
        st_c, net, target, weight, _ = run_chunk(
            c, state._replace(damping=damping), net, target, weight)
        return st_c.damping, net, target, weight

    damping, net, target, weight = jax.lax.fori_loop(
        1, n_chunks, body, (st.damping, net, target, weight))
    state = state._replace(damping=damping)

    state = ba_step(
        state, intrinsics,
        jnp.concatenate([ii, ii_inac]), jnp.concatenate([jj, jj_inac]),
        jnp.concatenate([mask, mask_inac]),
        jnp.concatenate([target, target_inac]),
        jnp.concatenate([weight, weight_inac]),
        t0, t1, window=window, iters=iters, motion_only=motion_only,
        lm=lm, ep=ep, pairs=pairs,
    )
    return state, net, target, weight, upmask


@partial(jax.jit, static_argnames=("window", "iters", "motion_only", "update_fn", "agg_fn"))
def update_step(
    state: video_lib.VideoState,
    params: Dict,
    intrinsics: jax.Array,
    ii: jax.Array,        # [cap]
    jj: jax.Array,        # [cap]
    mask: jax.Array,      # [cap]
    net: jax.Array,       # [cap, 128, h, w]
    target: jax.Array,    # [cap, h, w, 2]
    ii_inac: jax.Array,   # [cap_i]
    jj_inac: jax.Array,
    mask_inac: jax.Array,
    target_inac: jax.Array,
    weight_inac: jax.Array,
    t0: jax.Array,
    t1: jax.Array,
    window: int,
    iters: int = 2,
    motion_only: bool = False,
    lm: float = 1e-4,
    ep: float = 0.1,
    update_fn=None,
    agg_fn=None,
    pairs=None,
):
    """One tracker update (factor_graph.py:224-277): reproject -> correlate
    -> ConvGRU -> new targets/weights/damping -> windowed dense BA.

    `update_fn`/`agg_fn` default to the DROID nets; tests inject oracles to
    exercise the graph/BA machinery without learned weights.

    Returns (new_state, net, target, weight, upmask).
    """
    B = state.poses.shape[0]
    ht, wd = state.disps.shape[1:]
    coords0 = projective.coords_grid(ht, wd)

    coords1, _ = video_lib.reproject(state, intrinsics, ii, jj)
    motion = jnp.concatenate([coords1 - coords0, target - coords1], axis=-1)
    motion = jnp.clip(motion, -64.0, 64.0).transpose(0, 3, 1, 2)

    corr = correlation.alt_corr(state.fmaps, ii, jj, coords1,
                                mask=mask.astype(jnp.int32))

    if update_fn is None:
        new_net, delta, weight = droid_net.update_apply(
            params["update"], net, _gather_feat_rows(state.inps, ii), corr, motion
        )
    else:
        new_net, delta, weight = update_fn(params, state, ii, jj, net, corr, motion, coords1)
    if agg_fn is None:
        eta, upmask = droid_net.agg_apply(params["update"]["agg"], new_net, ii, mask, B)
    else:
        eta, upmask = agg_fn(params, new_net, ii, mask, B)

    new_target = coords1 + delta
    # scatter per-frame damping; padded edges write to a trash row
    ii_scatter = jnp.where(mask > 0, ii, B)
    damping = state.damping
    damping = jnp.concatenate([damping, jnp.zeros((1, ht, wd))], axis=0)
    damping = damping.at[ii_scatter].set(eta)[:B]
    state = state._replace(damping=damping)

    # combine active + (optionally) inactive edges for BA
    ba_ii = jnp.concatenate([ii, ii_inac])
    ba_jj = jnp.concatenate([jj, jj_inac])
    ba_mask = jnp.concatenate([mask, mask_inac])
    ba_target = jnp.concatenate([new_target, target_inac])
    ba_weight = jnp.concatenate([weight, weight_inac])

    if pairs is not None:
        # full-history path: sparse Schur assembly over the whole buffer
        state = video_lib.full_ba(
            state, intrinsics, ba_target, ba_weight, ba_ii, ba_jj, ba_mask,
            pairs, t0=t0, t1=t1, iters=iters, lm=lm, ep=ep,
            motion_only=motion_only,
        )
    else:
        state = video_lib.windowed_ba(
            state, intrinsics, ba_target, ba_weight, ba_ii, ba_jj, ba_mask,
            t0=t0, t1=t1, window=window, iters=iters, lm=lm, ep=ep,
            motion_only=motion_only,
        )
    return state, new_net, new_target, weight, upmask


class FactorGraph:
    """Host wrapper owning the padded edge table."""

    def __init__(
        self,
        buffer: int,
        ht: int,
        wd: int,
        capacity: int,
        params: Dict,
        intrinsics: jax.Array,
        window: int = 32,
        max_factors: int = -1,
        inac_capacity: Optional[int] = None,
        update_fn=None,
        agg_fn=None,
        sparse_ba: bool = False,
        corr_chunk: Optional[int] = None,
    ):
        self.update_fn = update_fn
        self.agg_fn = agg_fn
        # full-history BA via sparse Schur assembly instead of the windowed
        # dense-E solver (used when the optimization spans the whole buffer)
        self.sparse_ba = sparse_ba
        # memory bound: when set, `update` runs the correlate/GRU half in
        # fixed-size edge chunks (the reference's update_lowmem s=13 pass,
        # factor_graph.py:280-346) so the [E, 196, h, w] corr volume never
        # materializes at full graph size
        self.corr_chunk = corr_chunk
        if corr_chunk is not None:
            capacity = (capacity + corr_chunk - 1) // corr_chunk * corr_chunk
        self.buffer = buffer
        self.ht, self.wd = ht, wd
        self.capacity = capacity
        self.params = params
        self.intrinsics = intrinsics
        self.window = window
        self.max_factors = max_factors if max_factors > 0 else capacity

        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)

        # sparse-Schur pair cache: `Backend._run` calls `update` `steps`
        # times over an UNCHANGED edge set, and the host-side pair
        # enumeration (ba_sparse.build_pairs, a Python loop) was rebuilt
        # twice per call. Keyed on an edge-set version bumped by every
        # index mutation (add_factors / rm_factors / rm_keyframe).
        self._edges_version = 0
        self._pairs_key = None
        self._pairs = None

        # hidden-state table matches the tracker nets' dtype (bf16 on TPU)
        # so update writes don't up/down-cast [cap, 128, h, w] every call
        leaves = jax.tree.leaves(params)
        feat_dtype = leaves[0].dtype if leaves else jnp.float32
        self.net = jnp.zeros((capacity, 128, ht, wd), feat_dtype)
        self.target = jnp.zeros((capacity, ht, wd, 2))
        self.weight = jnp.zeros((capacity, ht, wd, 2))

        cap_i = inac_capacity if inac_capacity is not None else 2 * capacity
        self.cap_inac = cap_i
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.target_inac = jnp.zeros((cap_i, ht, wd, 2))
        self.weight_inac = jnp.zeros((cap_i, ht, wd, 2))

        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

    # ------------------------------------------------------------------

    @property
    def n_active(self) -> int:
        return len(self.ii)

    def _padded_indices_np(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host copies of the padded active edge indices. `update` keeps
        these for the sparse-pairs build: fetching a just-uploaded device
        array back with np.asarray pays a full tunnel RTT per array on the
        remote backend (~99 ms of the ScanNet-scale update was six such
        fetches)."""
        ii = np.zeros(self.capacity, np.int32)
        jj = np.zeros(self.capacity, np.int32)
        m = np.zeros(self.capacity, np.float32)
        n = self.n_active
        ii[:n] = self.ii
        jj[:n] = self.jj
        m[:n] = 1.0
        return ii, jj, m

    def _padded_indices(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        ii, jj, m = self._padded_indices_np()
        return jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(m)

    def _padded_inactive_np(self, t0: int):
        """Host (ii, jj, mask) for the retained inactive edges plus the
        device-gathered stored targets/weights."""
        ii = np.zeros(self.cap_inac, np.int32)
        jj = np.zeros(self.cap_inac, np.int32)
        m = np.zeros(self.cap_inac, np.float32)
        if len(self.ii_inac):
            sel = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            k = min(int(sel.sum()), self.cap_inac)
            idx = np.nonzero(sel)[0][:k]
            ii[:k] = self.ii_inac[idx]
            jj[:k] = self.jj_inac[idx]
            m[:k] = 1.0
            # gather the matching stored targets/weights into the front slots
            gather = np.zeros(self.cap_inac, np.int64)
            gather[:k] = idx
            target = self.target_inac[jnp.asarray(gather)]
            weight = self.weight_inac[jnp.asarray(gather)]
        else:
            target, weight = self.target_inac, self.weight_inac
        return ii, jj, m, target, weight

    # ------------------------------------------------------------------

    def add_factors(self, state: video_lib.VideoState, ii, jj, remove: bool = False):
        """Add deduplicated edges (factor_graph.py:88-133)."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)

        existing = set(zip(self.ii.tolist(), self.jj.tolist())) | set(
            zip(self.ii_inac.tolist(), self.jj_inac.tolist())
        )
        keep = np.asarray([(i, j) not in existing for i, j in zip(ii, jj)], bool)
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return

        # capacity limit: evict oldest (factor_graph.py:103-106)
        if self.n_active + len(ii) > min(self.max_factors, self.capacity) and remove:
            n_evict = self.n_active + len(ii) - min(self.max_factors, self.capacity)
            order = np.argsort(-self.age)  # oldest first
            evict_mask = np.zeros(self.n_active, bool)
            evict_mask[order[:n_evict]] = True
            self.rm_factors(evict_mask, store=True)
        n_new = min(len(ii), self.capacity - self.n_active)
        ii, jj = ii[:n_new], jj[:n_new]
        if n_new == 0:
            return

        n0 = self.n_active
        cap = 1 << max(int(np.ceil(np.log2(max(n_new, 1)))), 4)
        if n0 + cap <= self.capacity:
            # fused single-dispatch path (padded; see _add_factors_step)
            ii_p = np.zeros(cap, np.int32)
            jj_p = np.zeros(cap, np.int32)
            ii_p[:n_new] = ii
            jj_p[:n_new] = jj
            self.net, self.target, self.weight = _add_factors_step(
                state, self.intrinsics, self.net, self.target, self.weight,
                jnp.asarray(ii_p), jnp.asarray(jj_p),
                jnp.asarray(n0, jnp.int32))
        else:
            # exact-size eager fallback when the padded block would clamp
            # against the buffer end (dynamic_update_slice shifts the start
            # to fit, which would corrupt live slots)
            ii_j = jnp.asarray(ii)
            jj_j = jnp.asarray(jj)
            target, _ = video_lib.reproject(state, self.intrinsics, ii_j, jj_j)
            self.net = jax.lax.dynamic_update_slice_in_dim(
                self.net, state.nets[ii_j].astype(self.net.dtype), n0, axis=0
            )
            self.target = jax.lax.dynamic_update_slice_in_dim(
                self.target, target, n0, axis=0)
            self.weight = jax.lax.dynamic_update_slice_in_dim(
                self.weight, jnp.zeros_like(target), n0, axis=0
            )
        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(n_new, np.int64)])
        self._edges_version += 1

    def rm_factors(self, mask: np.ndarray, store: bool = False):
        """Drop active edges; optionally archive them (factor_graph.py:136-160)."""
        mask = np.asarray(mask, bool)
        if mask.sum() == 0:
            return
        self._edges_version += 1
        drop = np.nonzero(mask)[0]
        keep = np.nonzero(~mask)[0]

        if store:
            n_i = len(self.ii_inac)
            k = min(len(drop), self.cap_inac - n_i)
            if k > 0:
                sel = jnp.asarray(drop[:k])
                self.target_inac = jax.lax.dynamic_update_slice_in_dim(
                    self.target_inac, self.target[sel], n_i, axis=0
                )
                self.weight_inac = jax.lax.dynamic_update_slice_in_dim(
                    self.weight_inac, self.weight[sel], n_i, axis=0
                )
                self.ii_inac = np.concatenate([self.ii_inac, self.ii[drop[:k]]])
                self.jj_inac = np.concatenate([self.jj_inac, self.jj[drop[:k]]])

        # compact device arrays (keepers to the front). When the permutation
        # is the identity — e.g. clear_edges drops ALL actives, so
        # keep=[], drop=arange(n) — the gather is a semantic no-op over
        # slots that are garbage beyond len(self.ii) anyway: skip the three
        # full-capacity device gathers (~640 MB net buffer at ScanNet scale).
        perm = np.concatenate([keep, drop])
        if not np.array_equal(perm, np.arange(len(perm))):
            perm_j = jnp.asarray(np.concatenate([perm, np.arange(len(self.ii), self.capacity)]))
            self.net = self.net[perm_j]
            self.target = self.target[perm_j]
            self.weight = self.weight[perm_j]
        self.ii = self.ii[keep]
        self.jj = self.jj[keep]
        self.age = self.age[keep]

    def rm_keyframe(self, state: video_lib.VideoState, ix: int) -> video_lib.VideoState:
        """Remove keyframe ix: compact the video buffer and remap edge
        indices (factor_graph.py:163-221)."""
        state = video_lib.remove_keyframe(state, jnp.asarray(ix))
        self._edges_version += 1  # indices renumber even when none drop

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac = np.where(self.ii_inac >= ix, self.ii_inac - 1, self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix, self.jj_inac - 1, self.jj_inac)
        if m.any():
            keep = np.nonzero(~m)[0]
            pad = np.arange(len(m), self.cap_inac)
            perm = jnp.asarray(np.concatenate([keep, np.nonzero(m)[0], pad]))
            self.target_inac = self.target_inac[perm]
            self.weight_inac = self.weight_inac[perm]
            self.ii_inac = self.ii_inac[keep]
            self.jj_inac = self.jj_inac[keep]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.rm_factors(m, store=False)
        return state

    def clear_edges(self):
        self.rm_factors(np.ones(self.n_active, bool), store=False)

    # ------------------------------------------------------------------

    def update(
        self,
        state: video_lib.VideoState,
        t0: Optional[int] = None,
        t1: Optional[int] = None,
        iters: int = 2,
        use_inactive: bool = False,
        motion_only: bool = False,
        lm: float = 1e-4,
        ep: float = 0.1,
    ) -> video_lib.VideoState:
        if self.n_active == 0:
            return state
        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        t0 = max(1, t0)
        if t1 is None:
            t1 = int(max(self.ii.max(), self.jj.max())) + 1

        ii_np, jj_np, m_np = self._padded_indices_np()
        ii, jj, mask = jnp.asarray(ii_np), jnp.asarray(jj_np), jnp.asarray(m_np)
        if use_inactive:
            ii_i_np, jj_i_np, m_i_np, tgt_i, w_i = self._padded_inactive_np(t0)
        else:
            ii_i_np = np.zeros(self.cap_inac, np.int32)
            jj_i_np = np.zeros(self.cap_inac, np.int32)
            m_i_np = np.zeros(self.cap_inac, np.float32)
            tgt_i, w_i = self.target_inac, self.weight_inac
        ii_i = jnp.asarray(ii_i_np)
        jj_i = jnp.asarray(jj_i_np)
        m_i = jnp.asarray(m_i_np)

        pairs = None
        if self.sparse_ba:
            key = (self._edges_version, use_inactive,
                   t0 if use_inactive else None)
            if self._pairs_key == key:
                pairs = self._pairs
            else:
                from ..ops import ba_sparse

                # host copies only — np.asarray on the device arrays would
                # pay one tunnel RTT EACH on the remote backend
                comb_ii = np.concatenate([ii_np, ii_i_np])
                comb_jj = np.concatenate([jj_np, jj_i_np])
                comb_m = np.concatenate([m_np, m_i_np]) > 0
                raw = ba_sparse.build_pairs(comb_ii, comb_jj, comb_m)
                cap = 1 << max(int(np.ceil(np.log2(max(raw.n_pairs, 1)))), 6)
                pairs = ba_sparse.build_pairs(comb_ii, comb_jj, comb_m,
                                              capacity=cap)
                self._pairs_key, self._pairs = key, pairs

        if self.corr_chunk is not None and self.capacity > self.corr_chunk:
            # ---- memory-bounded path: GRU in chunks, one BA over all,
            # as ONE compiled program (round 5, VERDICT r4 next #6) ----
            S = self.corr_chunk
            n_chunks = max((self.n_active + S - 1) // S, 1)
            state, self.net, self.target, self.weight, self._upmask = (
                update_chunked_step(
                    state, self.params, self.intrinsics,
                    ii, jj, mask, self.net, self.target,
                    ii_i, jj_i, m_i, tgt_i, w_i,
                    jnp.asarray(t0), jnp.asarray(t1),
                    jnp.asarray(n_chunks, jnp.int32),
                    window=self.window, chunk=S, iters=iters,
                    motion_only=motion_only, lm=lm, ep=ep,
                    update_fn=self.update_fn, agg_fn=self.agg_fn,
                    pairs=pairs,
                ))
        else:
            state, self.net, self.target, self.weight, self._upmask = update_step(
                state, self.params, self.intrinsics,
                ii, jj, mask, self.net, self.target,
                ii_i, jj_i, m_i, tgt_i, w_i,
                jnp.asarray(t0), jnp.asarray(t1),
                window=self.window, iters=iters, motion_only=motion_only,
                lm=lm, ep=ep, update_fn=self.update_fn, agg_fn=self.agg_fn,
                pairs=pairs,
            )
        self.age += 1
        return state

    # ------------------------------------------------------------------
    # edge proposal (host-side, O(window^2) — SURVEY.md §7.3)
    # ------------------------------------------------------------------

    def add_neighborhood_factors(self, state, t0: int, t1: int, r: int = 3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1), indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(state, ii[keep], jj[keep])

    def add_proximity_factors(
        self, state, t: int, t0: int = 0, t1: int = 0,
        rad: int = 2, nms: int = 2, beta: float = 0.25,
        thresh: float = 16.0, remove: bool = False,
    ):
        """Greedy distance-sorted edge proposal with NMS
        (factor_graph.py:409-471). `t` = current keyframe count."""
        ilen, jlen = t - t0, t - t1
        if ilen <= 0 or jlen <= 0:
            return
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)

        d = video_lib.frame_distance_padded(
            state, self.intrinsics, ii, jj, beta=beta)
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf
        d = d.reshape(ilen, jlen)

        # suppress around existing edges
        ii1 = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        jj1 = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
        for i, j in zip(ii1, jj1):
            if (t0 <= i < t) and (t1 <= j < t):
                di, dj = int(i) - t0, int(j) - t1
                d[max(0, di - nms):di + nms + 1, max(0, dj - nms):dj + nms + 1] = np.inf

        es = []
        for i in range(t0, t):
            for j in range(max(i - rad, 0), i):
                es.append((i, j))
                es.append((j, i))
                di, dj = i - t0, j - t1
                if 0 <= dj < jlen:
                    d[max(0, di - nms):di + nms + 1, max(0, dj - nms):dj + nms + 1] = np.inf

        order = np.argsort(d.reshape(-1))
        for k in order:
            if not np.isfinite(d.reshape(-1)[k]) or d.reshape(-1)[k] > thresh:
                break
            if len(es) > self.max_factors:
                break
            di, dj = k // jlen, k % jlen
            if d[di, dj] > thresh:
                continue
            i, j = int(ii[k]), int(jj[k])
            es += [(i, j), (j, i)]
            d[max(0, di - nms):di + nms + 1, max(0, dj - nms):dj + nms + 1] = np.inf

        if es:
            es = np.asarray(es)
            self.add_factors(state, es[:, 0], es[:, 1], remove)
