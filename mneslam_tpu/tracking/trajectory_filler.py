"""Pose trajectory filler: per-frame poses for non-keyframes.

Rebuild of `/root/reference/tracker/trajectory_filler.py`: non-keyframes are
seeded by SE(3) geodesic interpolation between their bracketing keyframes,
then refined by motion-only dense BA against those keyframes (6 iterations),
in chunks of 16.

TPU design: instead of temporarily appending into the main buffer
(trajectory_filler.py:63-76), each chunk optimizes inside a small
static-shape scratch buffer [anchor keyframes | chunk frames], so the BA
window always covers every edge regardless of where the chunk's bracketing
keyframes live in the full history.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models import droid_net
from ..ops import lie
from . import video as video_lib
from .graph import FactorGraph

CHUNK = 16


class PoseTrajectoryFiller:
    def __init__(self, params: Dict, intrinsics: jax.Array, update_fn=None, agg_fn=None):
        self.params = params
        self.intrinsics = intrinsics
        self.update_fn = update_fn
        self.agg_fn = agg_fn

    def _fill_chunk(
        self,
        state: video_lib.VideoState,
        counter: int,
        timestamps: np.ndarray,       # [M] frame times
        images: jax.Array,            # [M, 3, H, W]
    ) -> jax.Array:
        """Returns w2c poses [M, 7] for the chunk."""
        M = len(timestamps)
        kf_ts = np.asarray(state.timestamps[:counter])

        # bracketing keyframes (trajectory_filler.py:48-57)
        t0 = np.asarray([max(int((kf_ts <= t).sum()) - 1, 0) for t in timestamps])
        t1 = np.where(t0 < counter - 1, t0 + 1, t0)

        Ps = state.poses[:counter]
        dt = kf_ts[t1] - kf_ts[t0] + 1e-3
        dP = lie.mul(Ps[t1], lie.inv(Ps[t0]))
        v = lie.log(dP) / jnp.asarray(dt)[:, None]
        w = v * jnp.asarray(timestamps - kf_ts[t0])[:, None]
        seeds = lie.mul(lie.exp(w), Ps[t0])   # [M, 7]

        fmaps = droid_net.feature_encoder(
            self.params, droid_net.normalize_images(images)
        )

        # scratch buffer: [unique anchors | chunk frames]
        anchors = np.unique(np.concatenate([t0, t1]))
        A = len(anchors)
        size = A + M
        ht, wd = state.disps.shape[1:]
        mini = video_lib.init_video(size, ht, wd)
        a_idx = jnp.asarray(anchors)
        mini = mini._replace(
            poses=jnp.concatenate([state.poses[a_idx], seeds]),
            disps=jnp.concatenate([state.disps[a_idx], jnp.ones((M, ht, wd))]),
            disps_sens=jnp.concatenate([state.disps_sens[a_idx], jnp.zeros((M, ht, wd))]),
            fmaps=jnp.concatenate([state.fmaps[a_idx], fmaps]),
            nets=jnp.concatenate([state.nets[a_idx], jnp.zeros_like(fmaps)]),
            inps=jnp.concatenate([state.inps[a_idx], jnp.zeros_like(fmaps)]),
            timestamps=jnp.concatenate([state.timestamps[a_idx], jnp.asarray(timestamps, jnp.float32)]),
        )

        remap = {int(a): k for k, a in enumerate(anchors)}
        ii = np.asarray([remap[int(a)] for a in np.concatenate([t0, t1])])
        jj = np.concatenate([np.arange(A, A + M), np.arange(A, A + M)])

        window = int(2 ** np.ceil(np.log2(size + 1)))
        graph = FactorGraph(
            size, ht, wd, capacity=2 * M + 8, params=self.params,
            intrinsics=self.intrinsics, window=window,
            update_fn=self.update_fn, agg_fn=self.agg_fn,
        )
        graph.add_factors(mini, ii, jj)
        for _ in range(6):
            mini = graph.update(mini, t0=A, t1=size, iters=2, motion_only=True)

        return mini.poses[A : A + M]

    def __call__(
        self,
        state: video_lib.VideoState,
        counter: int,
        frame_stream,                 # iterable of (timestamp, image [3,H,W])
    ) -> jax.Array:
        """Fill every streamed frame -> w2c poses [n_frames, 7]."""
        poses: List[jax.Array] = []
        ts_buf, img_buf = [], []
        for timestamp, image in frame_stream:
            ts_buf.append(float(timestamp))
            img_buf.append(image)
            if len(ts_buf) == CHUNK:
                poses.append(self._fill_chunk(state, counter, np.asarray(ts_buf),
                                              jnp.stack(img_buf)))
                ts_buf, img_buf = [], []
        if ts_buf:
            poses.append(self._fill_chunk(state, counter, np.asarray(ts_buf),
                                          jnp.stack(img_buf)))
        return jnp.concatenate(poses, axis=0)
