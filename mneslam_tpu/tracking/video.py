"""Keyframe video buffer: static-shape device state + host counter.

Rebuild of the reference `DepthVideo` (`/root/reference/tracker/depth_video.py`)
as an explicit pytree: fixed-capacity ring buffer of keyframe state
(timestamps, w2c poses, 1/8-res inverse depths, sensor disparities, feature/
context maps, GT poses) with functional updates. The reference's thread
locks and `mp.Value` counters disappear — SURVEY.md §7.1: super-steps are
deterministic, so the host-side `counter` int is the only bookkeeping.

Pose convention: world-to-camera [tx ty tz qx qy qz qw], same layout the
reference stores (`depth_video.py:51,65`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import ba as ba_lib
from ..ops import lie, projective


class VideoState(NamedTuple):
    timestamps: jax.Array   # [B]
    poses: jax.Array        # [B, 7] w2c
    poses_gt: jax.Array     # [B, 4, 4] c2w
    disps: jax.Array        # [B, h, w] inverse depth (1/8 res)
    disps_sens: jax.Array   # [B, h, w] sensor inverse depth (0 = none)
    fmaps: jax.Array        # [B, 128, h, w]
    nets: jax.Array         # [B, 128, h, w]
    inps: jax.Array         # [B, 128, h, w]
    damping: jax.Array      # [B, h, w] per-frame BA damping (graph state)


def init_video(buffer: int, ht8: int, wd8: int, dtype=jnp.float32,
               feat_dtype=None) -> VideoState:
    """`feat_dtype` (default = dtype): storage dtype of the fmaps/nets/inps
    feature buffers. The bf16 tracker stores them bf16 (the reference keeps
    half-precision fmaps under autocast, motion_filter.py:26) — geometry
    (poses/disps/damping) always stays fp32. Halves the feature-buffer
    footprint AND kills the per-update [E,128,h,w] f32<->bf16 converts that
    the round-3 frontend trace showed (~5 ms/update of casts + relayout
    copies)."""
    fd = dtype if feat_dtype is None else feat_dtype
    return VideoState(
        timestamps=jnp.zeros((buffer,), dtype),
        poses=lie.identity((buffer,), dtype),
        poses_gt=jnp.tile(jnp.eye(4, dtype=dtype), (buffer, 1, 1)),
        disps=jnp.ones((buffer, ht8, wd8), dtype),
        disps_sens=jnp.zeros((buffer, ht8, wd8), dtype),
        fmaps=jnp.zeros((buffer, 128, ht8, wd8), fd),
        nets=jnp.zeros((buffer, 128, ht8, wd8), fd),
        inps=jnp.zeros((buffer, 128, ht8, wd8), fd),
        damping=1e-6 * jnp.ones((buffer, ht8, wd8), dtype),
    )


@jax.jit
def append_frame(
    state: VideoState,
    index: jax.Array,
    timestamp: jax.Array,
    pose: Optional[jax.Array],
    depth: Optional[jax.Array],     # full-res depth or None
    fmap: jax.Array,
    net: jax.Array,
    inp: jax.Array,
    gt_pose: jax.Array,
) -> VideoState:
    """Write one keyframe at `index` (depth_video.py:92-127): the sensor
    disparity is subsampled at pixel centers (3::8) and seeds disps."""
    upd = {
        "timestamps": state.timestamps.at[index].set(timestamp),
        "fmaps": state.fmaps.at[index].set(fmap),
        "nets": state.nets.at[index].set(net),
        "inps": state.inps.at[index].set(inp),
        "poses_gt": state.poses_gt.at[index].set(gt_pose),
    }
    if pose is not None:
        upd["poses"] = state.poses.at[index].set(pose)
    if depth is not None:
        d8 = depth[3::8, 3::8]
        disp_sens = jnp.where(d8 > 0, 1.0 / jnp.maximum(d8, 1e-8), 0.0)
        upd["disps_sens"] = state.disps_sens.at[index].set(disp_sens)
        upd["disps"] = state.disps.at[index].set(
            jnp.where(disp_sens > 0, disp_sens, jnp.ones_like(disp_sens))
        )
    return state._replace(**upd)


@jax.jit
def remove_keyframe(state: VideoState, ix: jax.Array) -> VideoState:
    """Compact the buffer by dropping slot ix (factor_graph.py:163-206):
    every buffer shifts down by one from ix."""
    B = state.timestamps.shape[0]
    idx = jnp.arange(B)
    src = jnp.where(idx >= ix, jnp.minimum(idx + 1, B - 1), idx)
    return jax.tree.map(lambda a: a[src], state)


@jax.jit
def seed_next_frame(state: VideoState, t1: jax.Array) -> VideoState:
    """Initialize pose/disp of the next slot from the previous one
    (frontend.py:100-101)."""
    poses = state.poses.at[t1].set(state.poses[t1 - 1])
    disps = state.disps.at[t1].set(jnp.mean(state.disps[t1 - 1]))
    return state._replace(poses=poses, disps=disps)


@jax.jit
def reproject(state: VideoState, intrinsics: jax.Array, ii: jax.Array, jj: jax.Array):
    return projective.projective_transform(state.poses, state.disps, intrinsics, ii, jj)


def frame_distance_padded(state, intrinsics, ii, jj, beta=0.3):
    """Host-friendly wrapper: pads the edge list to the next power of two so
    the jitted kernel compiles O(log E) variants instead of one per distinct
    proposal size (edge grids grow every keyframe)."""
    import numpy as np2

    E = len(ii)
    cap = 1 << max(int(np2.ceil(np2.log2(max(E, 1)))), 4)
    iip = np2.zeros(cap, np2.int32)
    jjp = np2.zeros(cap, np2.int32)
    iip[:E] = np2.asarray(ii)
    jjp[:E] = np2.asarray(jj)
    d = frame_distance(state, intrinsics, jnp.asarray(iip), jnp.asarray(jjp), beta=beta)
    return np2.array(d[:E])


@partial(jax.jit, static_argnames=("chunk",))
def frame_distance(
    state: VideoState,
    intrinsics: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
    beta: float | jax.Array = 0.3,
    chunk: int = 2048,
) -> jax.Array:
    """Mean-flow distance metric (droid_kernels.cu frame_distance_kernel):
    beta-blend of full-reprojection flow and translation-only flow, averaged
    bidirectionally; 1000 where < 75% of pixels stay valid.

    Edge lists are processed in fixed-size chunks: proximity proposal feeds
    the full t x t pair grid (up to buffer^2 = 62k pairs), whose per-pair
    point clouds would otherwise materialize gigabytes at once."""

    def one_direction(a, b):
        X0 = projective.iproj(state.disps[a], intrinsics)
        Gij = lie.mul(state.poses[b], lie.inv(state.poses[a]))
        X1 = lie.act4(Gij[:, None, None, :], X0)
        coords_full, _ = projective.proj(X1, intrinsics)

        # translation-only variant
        X1t = X0.at[..., :3].add(X0[..., 3:4] * lie.translation(Gij)[:, None, None, :])
        coords_trans, _ = projective.proj(X1t, intrinsics)

        ht, wd = state.disps.shape[1:]
        grid = projective.coords_grid(ht, wd)
        d_full = jnp.linalg.norm(coords_full - grid, axis=-1)
        d_trans = jnp.linalg.norm(coords_trans - grid, axis=-1)
        v_full = (X1[..., 2] > projective.MIN_DEPTH).astype(d_full.dtype)
        v_trans = (X1t[..., 2] > projective.MIN_DEPTH).astype(d_full.dtype)

        accum = beta * jnp.sum(d_full * v_full, axis=(1, 2)) + \
            (1 - beta) * jnp.sum(d_trans * v_trans, axis=(1, 2))
        valid = beta * jnp.sum(v_full, axis=(1, 2)) + (1 - beta) * jnp.sum(v_trans, axis=(1, 2))
        total = ht * wd  # beta + (1-beta) per pixel
        frac = valid / (total + 1e-8)
        return jnp.where(frac < 0.75, 1000.0, accum / jnp.maximum(valid, 1e-8))

    E = ii.shape[0]
    if E <= chunk:
        return 0.5 * (one_direction(ii, jj) + one_direction(jj, ii))
    pad = (chunk - E % chunk) % chunk
    iip = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)]).reshape(-1, chunk)
    jjp = jnp.concatenate([jj, jnp.zeros(pad, jj.dtype)]).reshape(-1, chunk)
    d = jax.lax.map(
        lambda ab: 0.5 * (one_direction(ab[0], ab[1]) + one_direction(ab[1], ab[0])),
        (iip, jjp),
    )
    return d.reshape(-1)[:E]


@partial(jax.jit, static_argnames=("iters", "motion_only"))
def full_ba(
    state: VideoState,
    intrinsics: jax.Array,
    target: jax.Array,
    weight: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
    mask: jax.Array,
    pairs,
    t0: jax.Array,
    t1: jax.Array,
    iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    motion_only: bool = False,
    eps_damping: float = 1e-7,
) -> VideoState:
    """Full-buffer dense BA via sparse Schur assembly (`ops/ba_sparse`) —
    used when the optimization window spans more history than the dense-E
    formulation can hold (global/loop BA over hundreds of keyframes)."""
    from ..ops import ba_sparse

    problem = ba_lib.BAProblem(
        target=target, weight=weight,
        eta=0.2 * state.damping + eps_damping,
        ii=ii, jj=jj, mask=mask,
    )
    new_poses, new_disps = ba_sparse.bundle_adjust_sparse(
        state.poses, state.disps, intrinsics, problem, pairs,
        disps_sens=state.disps_sens,
        t0=t0, t1=t1, iters=iters, lm=lm, ep=ep, motion_only=motion_only,
    )
    new_disps = jnp.maximum(new_disps, 0.001)
    return state._replace(poses=new_poses, disps=new_disps)


@jax.jit
def depth_filter(
    state: VideoState,
    intrinsics: jax.Array,
    inds: jax.Array,      # [K] frame indices to filter
    thresh: jax.Array,    # [K] per-frame depth consistency threshold
) -> jax.Array:
    """Multi-view depth support count (droid_kernels.cu depth_filter_kernel).

    For each queried frame, reproject its inverse-depth map into 6 temporal
    neighbors (ix-3..ix-1, ix+3..ix+5) and count, per pixel, how many
    neighbors hold a disparity within `thresh` at any of the 4 bilinear
    corners. Returns counts [K, h, w]; the caller masks pixels with low
    support (the reference uses this to build disps_filtered/mask_filtered).
    """
    B = state.poses.shape[0]
    ht, wd = state.disps.shape[1:]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    grid = projective.coords_grid(ht, wd)

    neigh_off = jnp.asarray([-1, -2, -3, 3, 4, 5])

    def one_frame(ix, t):
        def one_neighbor(off):
            jx = ix + off
            valid_j = (jx >= 0) & (jx < B)
            jxc = jnp.clip(jx, 0, B - 1)
            Gij = lie.mul(state.poses[jxc], lie.inv(state.poses[ix]))
            X0 = projective.iproj(state.disps[ix], intrinsics)
            X1 = lie.act4(Gij[None, None], X0)
            u = fx * (X1[..., 0] / X1[..., 2]) + cx
            v = fy * (X1[..., 1] / X1[..., 2]) + cy
            dj = X1[..., 3] / X1[..., 2]

            u0 = jnp.floor(u).astype(jnp.int32)
            v0 = jnp.floor(v).astype(jnp.int32)
            inb = (u0 >= 0) & (v0 >= 0) & (u0 < wd - 1) & (v0 < ht - 1)
            u0c = jnp.clip(u0, 0, wd - 2)
            v0c = jnp.clip(v0, 0, ht - 2)
            dn = state.disps[jxc]
            support = jnp.zeros((ht, wd), bool)
            for dv in (0, 1):
                for du in (0, 1):
                    dcorner = dn[v0c + dv, u0c + du]
                    support |= jnp.abs(1.0 / jnp.maximum(dj, 1e-8)
                                       - 1.0 / jnp.maximum(dcorner, 1e-8)) < t
            return (support & inb & valid_j).astype(jnp.float32)

        return jnp.sum(jax.vmap(one_neighbor)(neigh_off), axis=0)

    return jax.vmap(one_frame)(inds, thresh)


@jax.jit
def upsample_disps(state: VideoState, inds: jax.Array, upmask: jax.Array) -> jax.Array:
    """Convex upsampling of 1/8-res disparities to full res
    (depth_video.py:274-276): disps [k, h, w] + mask [k, 576, h, w] ->
    [k, 8h, 8w]."""
    from ..models.droid_net import cvx_upsample

    d = state.disps[inds][..., None]          # [k, h, w, 1]
    return cvx_upsample(d, upmask)[..., 0]


def get_poses_c2w(
    state: VideoState,
    n: int,
    pose_compensate: Optional[jax.Array] = None,
    first_gt: Optional[jax.Array] = None,
) -> jax.Array:
    """w2c buffer poses -> c2w matrices with the reference's world alignment
    (depth_video.py:185-218): optional compensation pose, then alignment to
    the first GT pose with OpenGL column flips."""
    w2c = state.poses[:n]
    c2w = lie.inv(w2c)
    if pose_compensate is not None:
        c2w = lie.mul(pose_compensate[None], c2w)
    M = lie.matrix(c2w)
    if first_gt is not None:
        trans = first_gt.at[:3, 1].multiply(-1.0).at[:3, 2].multiply(-1.0)
        # float32 matmul precision: this 4x4 compose exports the evaluated
        # trajectory; bf16-rounded pose entries cost ~mm at meter scale
        with jax.default_matmul_precision("float32"):
            M = jnp.einsum("ij,njk->nik", trans, M)
        M = M.at[:, :3, 1].multiply(-1.0).at[:, :3, 2].multiply(-1.0)
    return M


# ---------------------------------------------------------------------------
# windowed dense BA over the buffer
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("window", "iters", "motion_only"))
def windowed_ba(
    state: VideoState,
    intrinsics: jax.Array,
    target: jax.Array,    # [E, h, w, 2]
    weight: jax.Array,    # [E, h, w, 2]
    ii: jax.Array,        # [E]
    jj: jax.Array,        # [E]
    mask: jax.Array,      # [E]
    t0: jax.Array,
    t1: jax.Array,
    window: int = 32,
    iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    motion_only: bool = False,
    eps_damping: float = 1e-7,
) -> VideoState:
    """Slice a static `window` around the active frames, run the dense GN/
    Schur BA (`ops/ba.bundle_adjust`), and write the slice back.

    This keeps the compiled BA shape fixed regardless of where the window
    sits in the buffer — the TPU answer to the CUDA kernel's dynamic [t0, t1)
    indexing (`depth_video.py:337-350`). Edges whose endpoints fall outside
    the slice are masked out.
    """
    B = state.poses.shape[0]
    window = min(window, B)  # static clamp: small scratch buffers
    # window start: place so that [t0, t1) fits; frames before t0 that anchor
    # edges (inactive factors reach t0-3) need slack, so back off a little.
    w0 = jnp.clip(t1 - window, 0, max(B - window, 0))

    sl_poses = jax.lax.dynamic_slice_in_dim(state.poses, w0, window, axis=0)
    sl_disps = jax.lax.dynamic_slice_in_dim(state.disps, w0, window, axis=0)
    sl_sens = jax.lax.dynamic_slice_in_dim(state.disps_sens, w0, window, axis=0)
    sl_damp = jax.lax.dynamic_slice_in_dim(state.damping, w0, window, axis=0)

    ii_w = ii - w0
    jj_w = jj - w0
    inb = (ii_w >= 0) & (ii_w < window) & (jj_w >= 0) & (jj_w < window)
    m = mask * inb.astype(mask.dtype)
    ii_w = jnp.clip(ii_w, 0, window - 1)
    jj_w = jnp.clip(jj_w, 0, window - 1)

    problem = ba_lib.BAProblem(
        target=target,
        weight=weight,
        eta=0.2 * sl_damp + eps_damping,
        ii=ii_w,
        jj=jj_w,
        mask=m,
    )
    new_poses, new_disps = ba_lib.bundle_adjust(
        sl_poses, sl_disps, intrinsics, problem,
        disps_sens=sl_sens,
        t0=t0 - w0, t1=t1 - w0,
        iters=iters, lm=lm, ep=ep, motion_only=motion_only,
    )
    new_disps = jnp.maximum(new_disps, 0.001)  # depth_video.py:350

    return state._replace(
        poses=jax.lax.dynamic_update_slice_in_dim(state.poses, new_poses, w0, axis=0),
        disps=jax.lax.dynamic_update_slice_in_dim(state.disps, new_disps, w0, axis=0),
    )
