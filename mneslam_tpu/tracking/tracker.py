"""Tracker facade: per-frame motion filtering + frontend updates.

Rebuild of `/root/reference/mp_slam/tracker.py`: `run(timestamp, image,
depth, gt_pose)` feeds one input frame through the motion filter and, when
admitted, the frontend. Owns the keyframe video buffer and the host-side
counter (the reference's `DepthVideo.counter` mp.Value).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import video as video_lib
from .backend import Backend
from .frontend import Frontend
from .motion_filter import MotionFilter


class Tracker:
    def __init__(self, config, params: Dict, intrinsics_full: np.ndarray,
                 update_fn=None, agg_fn=None):
        """intrinsics_full: (fx, fy, cx, cy) at the tracking resolution
        (cam.H_out x cam.W_out); stored internally at 1/8."""
        self.config = config
        tr = config["tracking"]
        # bf16 tracker nets by default on accelerators (the reference runs
        # under fp16 autocast); CPU emulates bf16 slowly, so stay fp32 there
        precision = tr.get("precision")
        if precision is None:
            precision = "float32" if jax.default_backend() == "cpu" else "bfloat16"
        if precision == "bfloat16":
            from ..models.droid_net import cast_params

            params = cast_params(params, jnp.bfloat16)
        self.params = params
        self.buffer = tr["buffer"]
        H_out, W_out = config["cam"]["H_out"], config["cam"]["W_out"]
        self.ht, self.wd = H_out // 8, W_out // 8
        self.intrinsics = jnp.asarray(np.asarray(intrinsics_full) / 8.0)

        feat_dtype = (jax.tree.leaves(params)[0].dtype
                      if jax.tree.leaves(params) else jnp.float32)
        self.state = video_lib.init_video(self.buffer, self.ht, self.wd,
                                          feat_dtype=feat_dtype)
        self.counter = 0

        self.motion_filter = MotionFilter(params, thresh=tr["motion_filter"]["thresh"])
        self.backend = Backend(params, self.intrinsics, config, self.buffer,
                               self.ht, self.wd, update_fn=update_fn, agg_fn=agg_fn)
        self.frontend = Frontend(params, self.intrinsics, config, self.buffer,
                                 self.ht, self.wd, update_fn=update_fn, agg_fn=agg_fn,
                                 backend=self.backend)

    def run(
        self,
        timestamp: float,
        image: jax.Array,                # [3, H_out, W_out] in [0, 1]
        depth: Optional[jax.Array] = None,   # [H_out, W_out]
        gt_pose: Optional[jax.Array] = None, # [4, 4] c2w
    ) -> bool:
        """Track one frame (mp_slam/tracker.py:51-65); returns admitted?"""
        self.state, self.counter, admitted = self.motion_filter.track(
            self.state, self.counter, timestamp, image, depth, gt_pose
        )
        if admitted or self.frontend.is_initialized:
            self.state, self.counter = self.frontend(self.state, self.counter)
        return admitted

    def run_batch(
        self,
        timestamps,
        images,
        depths,
        gt_poses=None,
    ):
        """Track a batch of frames with one motion-filter dispatch/readback
        (see motion_filter.track_batch), then replay the frontend exactly as
        the sequential loop would. Returns the per-frame admitted flags."""
        if self.counter + len(timestamps) > self.buffer:
            raise ValueError(
                f"keyframe buffer too small: {self.counter}+{len(timestamps)} "
                f"> {self.buffer}")
        self.state, batch_counter, admitted = self.motion_filter.track_batch(
            self.state, self.counter, timestamps, images, depths, gt_poses)
        # frontend replay: same call sequence as per-frame Tracker.run —
        # counter advances by one per admitted frame; the frontend may cull
        # (counter -= 1), which compacts the buffer consistently under the
        # batch-written keyframes (remove_keyframe shifts all slots >= ix).
        cnt = self.counter
        for adm in admitted:
            if adm:
                cnt += 1
            if adm or self.frontend.is_initialized:
                self.state, cnt = self.frontend(self.state, cnt)
        self.counter = cnt
        return admitted

    def global_ba(self, steps: int = 6):
        """Full dense BA over tracked history (mneslam_mp.py:51-87)."""
        self.state, n, n_edges = self.backend.dense_ba(
            self.state, self.counter, steps=steps
        )
        return n, n_edges

    def poses_c2w(self, pose_compensate=None, first_gt=None) -> jax.Array:
        return video_lib.get_poses_c2w(
            self.state, self.counter, pose_compensate, first_gt
        )

    def keyframe_timestamps(self) -> np.ndarray:
        return np.asarray(self.state.timestamps[: self.counter])
