"""Motion filter: keyframe admission by learned flow magnitude.

Rebuild of `/root/reference/tracker/motion_filter.py`: every input frame is
feature-encoded; a single GRU update over the self-correlation volume
estimates mean flow to the last keyframe, and the frame is admitted iff the
flow exceeds `tracking.motion_filter.thresh`. The whole per-frame compute is
one jitted function; the host only reads back one scalar + a bool.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import droid_net
from ..ops import correlation, lie
from . import video as video_lib


@partial(jax.jit, static_argnames=())
def encode_frame(params: Dict, image: jax.Array) -> jax.Array:
    """image [3, H, W] in [0,1] -> fmap [128, H/8, W/8]."""
    x = droid_net.normalize_images(image[None])
    return droid_net.feature_encoder(params, x)[0]


@partial(jax.jit, static_argnames=())
def encode_context(params: Dict, image: jax.Array) -> Tuple[jax.Array, jax.Array]:
    x = droid_net.normalize_images(image[None])
    net, inp = droid_net.context_encoder(params, x)
    return net[0], inp[0]


@partial(jax.jit, static_argnames=())
def flow_magnitude(params: Dict, fmap_prev: jax.Array, fmap_new: jax.Array,
                   net: jax.Array, inp: jax.Array) -> jax.Array:
    """Mean |delta| of one update iteration on the self-correlation volume
    (motion_filter.py:70-74)."""
    corr = correlation.self_corr(fmap_prev, fmap_new)
    _, delta, _ = droid_net.update_apply(params["update"], net[None], inp[None], corr)
    return jnp.mean(jnp.linalg.norm(delta, axis=-1))


@partial(jax.jit, static_argnames=())
def encode_and_flow(params: Dict, fmap_prev: jax.Array,
                    net: jax.Array, inp: jax.Array, image: jax.Array):
    """Fused per-frame step: feature-encode the new frame AND estimate flow
    to the last keyframe in ONE dispatch (per-call latency over the remote
    TPU link is comparable to the compute itself)."""
    gmap = encode_frame(params, image)
    corr = correlation.self_corr(fmap_prev, gmap)
    _, delta, _ = droid_net.update_apply(params["update"], net[None], inp[None], corr)
    return gmap, jnp.mean(jnp.linalg.norm(delta, axis=-1))


class MotionFilter:
    def __init__(self, params: Dict, thresh: float = 4.0):
        self.params = params
        self.thresh = thresh
        self.fmap = None  # features of the last admitted keyframe
        self.net = None
        self.inp = None
        self.count = 0

    def track(
        self,
        state: video_lib.VideoState,
        counter: int,
        timestamp: float,
        image: jax.Array,                 # [3, H, W] in [0, 1]
        depth: Optional[jax.Array],       # [H, W] or None
        gt_pose: Optional[jax.Array],
    ) -> Tuple[video_lib.VideoState, int, bool]:
        """Process one input frame; returns (state, counter, admitted)."""
        gt = gt_pose if gt_pose is not None else jnp.eye(4)

        if counter == 0:
            gmap = encode_frame(self.params, image)
            net, inp = encode_context(self.params, image)
            self.fmap, self.net, self.inp = gmap, net, inp
            state = video_lib.append_frame(
                state, jnp.asarray(0), jnp.asarray(timestamp, jnp.float32),
                lie.identity(), depth, gmap, net, inp, gt,
            )
            return state, 1, True

        gmap, delta_arr = encode_and_flow(self.params, self.fmap, self.net,
                                          self.inp, image)
        delta = float(delta_arr)
        if delta > self.thresh:
            self.count = 0
            net, inp = encode_context(self.params, image)
            self.fmap, self.net, self.inp = gmap, net, inp
            state = video_lib.append_frame(
                state, jnp.asarray(counter), jnp.asarray(timestamp, jnp.float32),
                None, depth, gmap, net, inp, gt,
            )
            return state, counter + 1, True

        self.count += 1
        return state, counter, False
