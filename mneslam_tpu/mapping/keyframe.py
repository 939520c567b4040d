"""Static-shape keyframe ray database.

Rebuild of the reference `KeyFrameDatabase` (`/root/reference/model/keyframe.py`):
a fixed-capacity tensor of sampled rays per keyframe
`[num_kf, rays_per_kf, 7]` with layout (direction 3, rgb 3, depth 1), plus a
slot counter. All mutation is functional (`.at[].set`) so the DB lives on
device inside jitted super-steps; the TPU never sees a dynamic shape —
`sample_global_rays` draws uniform indices bounded by the *current* count
(a traced scalar), exactly reproducing the reference's uniform sampling over
all stored rays (keyframe.py:91-103).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KeyframeDB(NamedTuple):
    rays: jax.Array       # [num_kf, rays_per_kf, 7]
    frame_ids: jax.Array  # [num_kf] dataset frame id per slot (-1 = empty)
    count: jax.Array      # scalar int32 — number of filled slots


def init_db(num_kf: int, rays_per_kf: int) -> KeyframeDB:
    return KeyframeDB(
        rays=jnp.zeros((num_kf, rays_per_kf, 7)),
        frame_ids=-jnp.ones((num_kf,), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def sample_rays_from_frame(
    key: jax.Array,
    direction: jax.Array,  # [H, W, 3]
    rgb: jax.Array,        # [H, W, 3]
    depth: jax.Array,      # [H, W]
    n: int,
    filter_depth: bool = False,
    depth_trunc: float = 100.0,
) -> jax.Array:
    """Random pixel sample -> packed rays [n, 7] (keyframe.py:27-50).

    With `filter_depth` (mapping.filter_depth, reference
    keyframe.py:34-38): sample uniformly over pixels with valid depth
    (0 < d <= depth_trunc) only. Static-shape formulation: a weighted
    categorical draw over the pixel grid instead of the reference's
    `random.sample` over the compacted valid rows (uniform over the same
    support; with replacement, like the random path here). Falls back to
    unfiltered sampling if a frame has no valid depth at all.
    """
    H, W = depth.shape
    if filter_depth:
        z_flat = depth.reshape(-1)
        valid = ((z_flat > 0.0) & (z_flat <= depth_trunc)).astype(jnp.float32)
        any_valid = jnp.sum(valid) > 0
        logits = jnp.where(
            any_valid, jnp.log(jnp.maximum(valid, 1e-30)), jnp.zeros_like(valid))
        idx = jax.random.categorical(key, logits, shape=(n,))
    else:
        idx = jax.random.randint(key, (n,), 0, H * W)
    d = direction.reshape(-1, 3)[idx]
    c = rgb.reshape(-1, 3)[idx]
    z = depth.reshape(-1)[idx]
    return jnp.concatenate([d, c, z[:, None]], axis=-1)


def add_keyframe(
    db: KeyframeDB,
    key: jax.Array,
    frame_id: jax.Array,
    direction: jax.Array,
    rgb: jax.Array,
    depth: jax.Array,
    filter_depth: bool = False,
    depth_trunc: float = 100.0,
) -> KeyframeDB:
    """Append a keyframe's ray sample to the next slot (functional)."""
    n = db.rays.shape[1]
    packed = sample_rays_from_frame(key, direction, rgb, depth, n,
                                    filter_depth=filter_depth,
                                    depth_trunc=depth_trunc)
    slot = db.count
    return KeyframeDB(
        rays=jax.lax.dynamic_update_index_in_dim(db.rays, packed, slot, axis=0),
        frame_ids=db.frame_ids.at[slot].set(frame_id.astype(jnp.int32)),
        count=db.count + 1,
    )


# NOTE: there is deliberately no del_keyframe here. The reference deletes
# mapped keyframes when the tracker culls one (keyframe.py:52-62 via
# factor_graph.py:163-221) because its mapper races tracking. In this
# rebuild the mapper lags tracking by >= 1 keyframe
# (slam.pending_keyframe's map_counter < counter - 1 guard) and the
# frontend only ever culls the newest-but-one slot (frontend.py t1 - 2),
# which is therefore always still unmapped — a culled keyframe can never
# be in this DB. The invariant is executable:
# tests/test_slam_full.py::test_full_slam_with_culling_and_loop_ba.


def keyframe_selection_overlap(
    db_poses: jax.Array,       # [K, 4, 4] candidate keyframe c2w poses
    rays_o: jax.Array,         # [R, 3] current-frame sample rays (world)
    rays_d: jax.Array,         # [R, 3]
    target_d: jax.Array,       # [R] depths along the rays
    intrinsics: jax.Array,     # [4] fx fy cx cy
    H: int,
    W: int,
) -> jax.Array:
    """Fraction of the current frame's backprojected points visible in each
    candidate keyframe (NICE-SLAM-style selection, keyframe.py:128-195).

    Returns overlap ratios [K]; callers pick the top-k slots.
    """
    pts = rays_o + rays_d * target_d[:, None]              # [R, 3] world
    w2c = jnp.linalg.inv(db_poses)                          # [K, 4, 4]
    cam = jnp.einsum("kij,rj->kri", w2c[:, :3, :3], pts) + w2c[:, None, :3, 3]
    z = -cam[..., 2]                                        # OpenGL forward
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    u = fx * (cam[..., 0] / jnp.maximum(z, 1e-6)) + cx
    v = -fy * (cam[..., 1] / jnp.maximum(z, 1e-6)) + cy
    inb = (z > 0.01) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    return jnp.mean(inb.astype(jnp.float32), axis=1)        # [K]


def sample_global_rays(
    db: KeyframeDB, key: jax.Array, n: int
) -> Tuple[jax.Array, jax.Array]:
    """Uniform sample over all stored rays -> (rays [n, 7], slot_ids [n]).

    slot_ids index the keyframe slot (for per-ray pose lookup), matching the
    reference's frame-id return (keyframe.py:91-103).
    """
    num_kf, rays_per_kf, _ = db.rays.shape
    total = jnp.maximum(db.count * rays_per_kf, 1)
    idx = jax.random.randint(key, (n,), 0, total)
    rays = db.rays.reshape(-1, 7)[idx]
    slot_ids = idx // rays_per_kf
    return rays, slot_ids
