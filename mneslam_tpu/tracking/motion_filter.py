"""Motion filter: keyframe admission by learned flow magnitude.

Rebuild of `/root/reference/tracker/motion_filter.py`: every input frame is
feature-encoded; a single GRU update over the self-correlation volume
estimates mean flow to the last keyframe, and the frame is admitted iff the
flow exceeds `tracking.motion_filter.thresh`. The whole per-frame compute is
one jitted function; the host only reads back one scalar + a bool.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


@jax.jit
def track_batch_step(
    params: Dict,
    state: video_lib.VideoState,
    counter: jax.Array,        # int32 scalar: next free keyframe slot
    fmap_kf: jax.Array,        # features of the last admitted keyframe
    net_kf: jax.Array,
    inp_kf: jax.Array,
    images: jax.Array,         # [B, 3, H, W] in [0, 1]
    depths: jax.Array,         # [B, H, W]
    timestamps: jax.Array,     # [B]
    gts: jax.Array,            # [B, 4, 4]
    thresh: jax.Array,
):
    """Batched motion filter: admit/append B frames in ONE dispatch.

    TPU-first replacement for the reference's per-frame loop
    (motion_filter.py:48-92): the admission decision for frame i depends on
    which earlier frames were admitted (the flow reference is the last
    admitted keyframe), so the host normally reads back one scalar per
    frame. Over the remote-TPU link a device->host readback costs ~30 ms
    regardless of size (measured; device compute is ~4.5 ms/frame), so the
    whole decide-and-append loop runs on device as a `lax.scan` carrying
    (video state, counter, reference features) and the host reads back one
    flags vector per batch. Encoders run batched outside the scan (B-sized
    convs use the MXU far better than B single-image calls). Semantics are
    exactly the sequential filter's; see tests/test_tracking.py.
    """
    x = droid_net.normalize_images(images)
    gmaps = droid_net.feature_encoder(params, x)
    nets, inps = droid_net.context_encoder(params, x)

    def body(carry, xs):
        state, counter, fmap_kf, net_kf, inp_kf = carry
        gmap, net_i, inp_i, depth, ts, gt = xs
        corr = correlation.self_corr(fmap_kf, gmap)
        _, delta, _ = droid_net.update_apply(
            params["update"], net_kf[None], inp_kf[None], corr)
        d = jnp.mean(jnp.linalg.norm(delta, axis=-1))
        admit = d > thresh

        # conditional append_frame without copying whole buffers: write
        # where-selected values at slot `counter` (a same-value
        # dynamic_update_slice when not admitted). Mirrors
        # video.append_frame with pose=None.
        def put(buf, new):
            old = buf[counter]
            return buf.at[counter].set(jnp.where(admit, new.astype(old.dtype), old))

        d8 = depth[3::8, 3::8]
        disp_sens = jnp.where(d8 > 0, 1.0 / jnp.maximum(d8, 1e-8), 0.0)
        state = state._replace(
            timestamps=put(state.timestamps, ts),
            fmaps=put(state.fmaps, gmap),
            nets=put(state.nets, net_i),
            inps=put(state.inps, inp_i),
            poses_gt=put(state.poses_gt, gt),
            disps_sens=put(state.disps_sens, disp_sens),
            disps=put(state.disps,
                      jnp.where(disp_sens > 0, disp_sens,
                                jnp.ones_like(disp_sens))),
        )
        counter = counter + admit.astype(counter.dtype)
        fmap_kf = jnp.where(admit, gmap, fmap_kf)
        net_kf = jnp.where(admit, net_i, net_kf)
        inp_kf = jnp.where(admit, inp_i, inp_kf)
        return (state, counter, fmap_kf, net_kf, inp_kf), (admit, d)

    carry = (state, counter, fmap_kf, net_kf, inp_kf)
    carry, (admits, deltas) = jax.lax.scan(
        body, carry, (gmaps, nets, inps, depths, timestamps, gts))
    state, counter, fmap_kf, net_kf, inp_kf = carry
    return state, counter, fmap_kf, net_kf, inp_kf, admits, deltas


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

    def track_batch(
        self,
        state: video_lib.VideoState,
        counter: int,
        timestamps: Sequence[float],
        images: Sequence[jax.Array],
        depths: Sequence[jax.Array],
        gt_poses: Optional[Sequence[Optional[jax.Array]]] = None,
    ) -> Tuple[video_lib.VideoState, int, List[bool]]:
        """Process a batch of frames with ONE device dispatch + readback.

        Exactly equivalent to calling `track` per frame (the first-ever
        frame still routes through `track`); batching exists to amortize
        the per-readback latency of the device link."""
        n = len(timestamps)
        admitted: List[bool] = []
        i = 0
        if counter == 0:
            gt0 = gt_poses[0] if gt_poses is not None else None
            state, counter, adm = self.track(
                state, 0, timestamps[0], images[0], depths[0], gt0)
            admitted.append(adm)
            i = 1
        if i < n:
            gts = [
                (gt_poses[k] if gt_poses is not None and gt_poses[k] is not None
                 else jnp.eye(4))
                for k in range(i, n)
            ]
            (state, counter_arr, fmap, net, inp, admits, _) = track_batch_step(
                self.params, state, jnp.asarray(counter, jnp.int32),
                self.fmap, self.net, self.inp,
                jnp.stack(images[i:]), jnp.stack(depths[i:]),
                jnp.asarray(timestamps[i:], jnp.float32), jnp.stack(gts),
                jnp.asarray(self.thresh, jnp.float32),
            )
            flags = np.asarray(admits)          # the one readback
            self.fmap, self.net, self.inp = fmap, net, inp
            counter = int(counter_arr)
            admitted.extend(bool(a) for a in flags)
            # skipped-frame counter: trailing run of non-admitted frames
            run = 0
            for a in reversed(admitted):
                if a:
                    break
                run += 1
            self.count = run if any(admitted) else self.count + run
        return state, counter, admitted
