"""Inter-agent loop closure and map fusion.

Rebuild of `/root/reference/mp_slam/mapper.py:316-726`:

  * `align_pose_by_render` — the base agent's map renders teacher rgb/depth
    at the base pose; the target pose (axis-angle + translation params) is
    optimized by Adam to make the target map's renders match; the whole
    `loop_iters` optimization is ONE jitted `lax.scan` with best-pose
    tracking (mapper.py:371-414).
  * `deform_trajectory` — distance-decayed SLERP blending of the relative
    transform over the whole keyframe trajectory (mapper.py:417-489).
  * `compute_overlap_bound` / `keyframes_in_bound` — AABB overlap of agent
    bounds and keyframe membership (mapper.py:491-526).
  * `distill` — teacher renders along foreign keyframe rays supervise the
    student map for `distill_iters` steps (mapper.py:594-644), jitted.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.scene_rep import SceneRep
from ..ops import lie, rotations


@partial(jax.jit, static_argnames=("scene_base", "scene_target", "iters", "rot_rep"))
def align_pose_by_render(
    scene_base: SceneRep,
    params_base: Dict,
    scene_target: SceneRep,
    params_target: Dict,
    base_c2w: jax.Array,          # [4, 4]
    target_c2w_init: jax.Array,   # [4, 4]
    rays_d_cam: jax.Array,        # [S, 3] sampled camera-frame directions
    key: jax.Array,
    iters: int = 100,
    lr_rot: float = 0.001,
    lr_trans: float = 0.001,
    rgb_weight: float = 5.0,
    depth_weight: float = 0.1,
    rot_rep: str = "axis_angle",
):
    """Returns (best_target_c2w [4,4], best_loss, init_loss).

    `init_loss` is the render-consistency loss at `target_c2w_init` before
    any optimization — callers gate closure acceptance on how much the
    alignment actually improved the match (a spurious place-recognition hit
    leaves best_loss ~ init_loss)."""
    S = rays_d_cam.shape[0]

    # teacher render from the base model at the base pose (no grad)
    rays_o_b = jnp.broadcast_to(base_c2w[:3, 3], (S, 3))
    rays_d_b = rays_d_cam @ base_c2w[:3, :3].T
    teacher = scene_base.render_rays(params_base, rays_o_b, rays_d_b, target_d=None)
    t_rgb = jax.lax.stop_gradient(teacher["rgb"])
    t_depth = jax.lax.stop_gradient(teacher["depth"])

    rot0, trans0 = rotations.transform_to_rot_trans(target_c2w_init, rot_rep)
    opt = optax.chain(
        optax.masked(optax.adam(lr_rot), {"rot": True, "trans": False}),
        optax.masked(optax.adam(lr_trans), {"rot": False, "trans": True}),
    )
    params0 = {"rot": rot0, "trans": trans0}
    opt_state0 = opt.init(params0)

    def loss_fn(p):
        c2w = rotations.rot_trans_to_transform(p["rot"], p["trans"], rot_rep)
        rays_o = jnp.broadcast_to(c2w[:3, 3], (S, 3))
        rays_d = rays_d_cam @ c2w[:3, :3].T
        ret = scene_target.render_rays(params_target, rays_o, rays_d, target_d=None)
        loss = rgb_weight * jnp.mean(jnp.square(ret["rgb"] - t_rgb)) + \
            depth_weight * jnp.mean(jnp.square(ret["depth"] - t_depth))
        return loss, c2w

    def step(carry, _):
        p, o, best_loss, best_c2w = carry
        (loss, c2w), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        better = loss < best_loss
        best_loss = jnp.where(better, loss, best_loss)
        best_c2w = jnp.where(better, c2w, best_c2w)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o, best_loss, best_c2w), loss

    init = (params0, opt_state0, jnp.inf, target_c2w_init)
    (p, _, best_loss, best_c2w), losses = jax.lax.scan(step, init, None, length=iters)
    return best_c2w, best_loss, losses[0]


@jax.jit
def deform_trajectory(
    poses_c2w: jax.Array,          # [N, 4, 4]
    loop_kf_idx: jax.Array,        # scalar index of the loop keyframe
    relative_transform: jax.Array, # [4, 4] maps target -> base
    decay_sigma: float | jax.Array = 10.0,
    min_weight: float | jax.Array = 0.1,
) -> jax.Array:
    """Distance-decayed SLERP blend of the corrective transform over all
    keyframes (mapper.py:417-489)."""
    N = poses_c2w.shape[0]
    loop_pos = poses_c2w[loop_kf_idx, :3, 3]
    dist = jnp.linalg.norm(poses_c2w[:, :3, 3] - loop_pos, axis=1)
    decay = jnp.exp(-jnp.square(dist) / (2.0 * decay_sigma ** 2))
    w = min_weight + (1.0 - min_weight) * decay          # [N]

    q_rel = lie.matrix_to_quat(relative_transform[:3, :3])
    q_id = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    q_interp = lie.slerp(jnp.broadcast_to(q_id, (N, 4)),
                         jnp.broadcast_to(q_rel, (N, 4)), w[:, None])
    R_interp = lie.quat_to_matrix(q_interp)              # [N, 3, 3]
    t_interp = w[:, None] * relative_transform[:3, 3]

    inc = jnp.tile(jnp.eye(4), (N, 1, 1))
    inc = inc.at[:, :3, :3].set(R_interp).at[:, :3, 3].set(t_interp)
    return inc @ poses_c2w


def compute_overlap_bound(bound1: np.ndarray, bound2: np.ndarray) -> Optional[np.ndarray]:
    """AABB intersection [3,2] or None (mapper.py:491-509)."""
    overlap = np.empty_like(np.asarray(bound1, float))
    b1, b2 = np.asarray(bound1, float), np.asarray(bound2, float)
    overlap[:, 0] = np.maximum(b1[:, 0], b2[:, 0])
    overlap[:, 1] = np.minimum(b1[:, 1], b2[:, 1])
    if np.any(overlap[:, 0] > overlap[:, 1]):
        return None
    return overlap


def keyframes_in_bound(poses: np.ndarray, timestamps: np.ndarray,
                       bound: np.ndarray) -> List[Dict]:
    """Keyframes whose camera centers lie inside `bound` (mapper.py:511-526)."""
    out = []
    for i, pose in enumerate(np.asarray(poses)):
        p = pose[:3, 3]
        if np.all(p >= bound[:, 0]) and np.all(p <= bound[:, 1]):
            out.append({"kf_id": int(timestamps[i]), "pose": pose})
    return out


@partial(jax.jit, static_argnames=("scene_teacher", "scene_student", "mapper", "iters", "rays_per_kf"))
def distill(
    scene_teacher: SceneRep,
    params_teacher: Dict,
    scene_student: SceneRep,
    mapper,                      # Mapper (hashable static — holds optimizer)
    student_params: Dict,
    student_opt_state,
    foreign_poses: jax.Array,    # [K, 4, 4]
    rays_d_cam: jax.Array,       # [P, 3] full camera ray directions (flattened)
    key: jax.Array,
    iters: int = 100,
    rays_per_kf: int = 128,
):
    """Teacher->student distillation along foreign keyframe rays
    (mapper.py:594-644): each iteration samples rays_per_kf rays per foreign
    keyframe, renders the teacher (no grad), and trains the student on the
    rendered rgb/depth with the full mapping loss."""
    K = foreign_poses.shape[0]
    P = rays_d_cam.shape[0]

    def step(carry, it):
        params, opt_state = carry
        k = jax.random.fold_in(key, it)
        idx = jax.random.randint(k, (K, rays_per_kf), 0, P)
        d_cam = rays_d_cam[idx]                                   # [K, r, 3]
        rays_d = jnp.einsum("krc,knc->krn", d_cam, foreign_poses[:, :3, :3])
        rays_o = jnp.broadcast_to(foreign_poses[:, None, :3, 3], rays_d.shape)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)

        teacher = scene_teacher.render_rays(params_teacher, rays_o, rays_d, target_d=None)
        t_rgb = jax.lax.stop_gradient(teacher["rgb"])
        t_depth = jax.lax.stop_gradient(teacher["depth"])[:, None]

        def loss_fn(p):
            ret = scene_student.forward(p, rays_o, rays_d, t_rgb, t_depth,
                                        key=jax.random.fold_in(k, 1))
            return scene_student.get_loss_from_ret(ret), ret["psnr"]

        (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = mapper.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (student_params, student_opt_state), jnp.arange(iters)
    )
    return params, opt_state, losses[-1]
