"""DROID tracker networks in pure JAX (feature/context encoders + ConvGRU update).

Functional rebuild of `/root/reference/tracker/droid_net.py`,
`tracker/modules/extractor.py`, and `tracker/modules/gru.py`: the parameter
tree mirrors the torch module paths exactly so the published `droid.pth`
checkpoint loads via a pure rename (`load_droid_weights`), including the
reference's 2-channel head slicing (`mneslam_mp.py:145-152`).

All applies are batched over a leading edge/frame axis and jit/vmap-clean;
the GraphAgg scatter-mean uses `segment_sum` with an explicit edge mask so
padded factor tables stay inert.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .nn import clip_grad_custom, conv2d, init_conv, instance_norm

DIM = 32
CORR_PLANES = 4 * (2 * 3 + 1) ** 2  # 4 levels x 7x7 window = 196


# ---------------------------------------------------------------------------
# BasicEncoder
# ---------------------------------------------------------------------------

def _res_block(p: Dict, x: jax.Array, norm: str, stride: int) -> jax.Array:
    def n(v):
        return instance_norm(v) if norm == "instance" else v

    y = jax.nn.relu(n(conv2d(p["conv1"], x, stride=stride, padding=1)))
    y = jax.nn.relu(n(conv2d(p["conv2"], y, padding=1)))
    if stride > 1:
        x = n(conv2d(p["downsample"], x, stride=stride))
    return jax.nn.relu(x + y)


def encoder_apply(p: Dict, x: jax.Array, norm: str) -> jax.Array:
    """[N, 3, H, W] -> [N, out_dim, H/8, W/8] (extractor.py:110-126)."""
    def n(v):
        return instance_norm(v) if norm == "instance" else v

    x = jax.nn.relu(n(conv2d(p["conv1"], x, stride=2, padding=3)))
    for layer, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        x = _res_block(p[layer][0], x, norm, stride)
        x = _res_block(p[layer][1], x, norm, 1)
    return conv2d(p["conv2"], x)


def init_encoder(key, out_dim: int) -> Dict:
    keys = iter(jax.random.split(key, 32))

    def block(in_ch, ch, stride):
        p = {
            "conv1": init_conv(next(keys), in_ch, ch, 3),
            "conv2": init_conv(next(keys), ch, ch, 3),
        }
        if stride > 1:
            p["downsample"] = init_conv(next(keys), in_ch, ch, 1)
        return p

    return {
        "conv1": init_conv(next(keys), 3, DIM, 7),
        "layer1": [block(DIM, DIM, 1), block(DIM, DIM, 1)],
        "layer2": [block(DIM, 2 * DIM, 2), block(2 * DIM, 2 * DIM, 1)],
        "layer3": [block(2 * DIM, 4 * DIM, 2), block(4 * DIM, 4 * DIM, 1)],
        "conv2": init_conv(next(keys), 4 * DIM, out_dim, 1),
    }


# ---------------------------------------------------------------------------
# ConvGRU with global context gating (gru.py:5-33)
# ---------------------------------------------------------------------------

def gru_apply(p: Dict, net: jax.Array, inp: jax.Array) -> jax.Array:
    import os

    if os.environ.get("MNESLAM_GRU_IMPL", "ref") == "fused":
        return gru_apply_fused(p, net, inp)
    net_inp = jnp.concatenate([net, inp], axis=1)
    glo = jax.nn.sigmoid(conv2d(p["w"], net)) * net
    glo = jnp.mean(glo, axis=(2, 3), keepdims=True)

    z = jax.nn.sigmoid(conv2d(p["convz"], net_inp, padding=1) + conv2d(p["convz_glo"], glo))
    r = jax.nn.sigmoid(conv2d(p["convr"], net_inp, padding=1) + conv2d(p["convr_glo"], glo))
    q = jnp.tanh(
        conv2d(p["convq"], jnp.concatenate([r * net, inp], axis=1), padding=1)
        + conv2d(p["convq_glo"], glo)
    )
    return (1 - z) * net + z * q


def gru_apply_fused(p: Dict, net: jax.Array, inp: jax.Array) -> jax.Array:
    """Gate-conv fusion of `gru_apply` — identical math, fewer fatter GEMMs.

    conv([net, inp], W) == conv(net, W[:, :h]) + conv(inp, W[:, h:]), so the
    z/r/q gates' inp-halves merge into ONE 3x3 conv over `inp` (3h out) and
    the z/r net-halves into one conv over `net` (2h out); only q's net-half
    stays separate (it consumes r*net).  Avoids materializing the two
    448-channel lane-dim concats of COMPUTED operands per step (the relayout
    cost class documented in CLAUDE.md perf rules).  Selected with
    MNESLAM_GRU_IMPL=fused; equivalence-tested vs the reference formulation
    (tests/test_tracking.py)."""
    h = net.shape[1]
    wz, wr, wq = p["convz"]["weight"], p["convr"]["weight"], p["convq"]["weight"]
    w_inp = jnp.concatenate([wz[:, h:], wr[:, h:], wq[:, h:]], axis=0)
    w_net = jnp.concatenate([wz[:, :h], wr[:, :h]], axis=0)

    glo = jax.nn.sigmoid(conv2d(p["w"], net)) * net
    glo = jnp.mean(glo, axis=(2, 3), keepdims=True)

    i3 = conv2d({"weight": w_inp}, inp, padding=1)
    n2 = conv2d({"weight": w_net}, net, padding=1)
    zi, ri, qi = jnp.split(i3, 3, axis=1)
    zn, rn = jnp.split(n2, 2, axis=1)

    z = jax.nn.sigmoid(zi + zn + p["convz"]["bias"][None, :, None, None]
                       + conv2d(p["convz_glo"], glo))
    r = jax.nn.sigmoid(ri + rn + p["convr"]["bias"][None, :, None, None]
                       + conv2d(p["convr_glo"], glo))
    qn = conv2d({"weight": wq[:, :h]}, r * net, padding=1)
    q = jnp.tanh(qi + qn + p["convq"]["bias"][None, :, None, None]
                 + conv2d(p["convq_glo"], glo))
    return (1 - z) * net + z * q


def init_gru(key, h: int = 128, i: int = 320) -> Dict:
    keys = iter(jax.random.split(key, 8))
    return {
        "convz": init_conv(next(keys), h + i, h, 3),
        "convr": init_conv(next(keys), h + i, h, 3),
        "convq": init_conv(next(keys), h + i, h, 3),
        "w": init_conv(next(keys), h, h, 1),
        "convz_glo": init_conv(next(keys), h, h, 1),
        "convr_glo": init_conv(next(keys), h, h, 1),
        "convq_glo": init_conv(next(keys), h, h, 1),
    }


# ---------------------------------------------------------------------------
# UpdateModule (droid_net.py:70-140)
# ---------------------------------------------------------------------------

def update_apply(
    p: Dict,
    net: jax.Array,    # [E, 128, h, w]
    inp: jax.Array,    # [E, 128, h, w]
    corr: jax.Array,   # [E, 196, h, w]
    flow: jax.Array | None = None,  # [E, 4, h, w]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One GRU update -> (net, delta [E,h,w,2], weight [E,h,w,2])."""
    if flow is None:
        flow = jnp.zeros((net.shape[0], 4) + net.shape[2:], net.dtype)

    c = jax.nn.relu(conv2d(p["corr_encoder"][0], corr))
    c = jax.nn.relu(conv2d(p["corr_encoder"][1], c, padding=1))
    f = jax.nn.relu(conv2d(p["flow_encoder"][0], flow, padding=3))
    f = jax.nn.relu(conv2d(p["flow_encoder"][1], f, padding=1))

    net = gru_apply(p["gru"], net, jnp.concatenate([inp, c, f], axis=1))

    d = jax.nn.relu(conv2d(p["delta"][0], net, padding=1))
    delta = clip_grad_custom(conv2d(p["delta"][1], d, padding=1))
    w = jax.nn.relu(conv2d(p["weight"][0], net, padding=1))
    weight = jax.nn.sigmoid(clip_grad_custom(conv2d(p["weight"][1], w, padding=1)))

    # downstream geometry (reprojection targets, BA) runs fp32
    delta = delta.transpose(0, 2, 3, 1).astype(jnp.float32)
    weight = weight.transpose(0, 2, 3, 1).astype(jnp.float32)
    return net, delta, weight


def agg_apply(
    p: Dict,
    net: jax.Array,      # [E, 128, h, w]
    ii: jax.Array,       # [E] frame index per edge
    mask: jax.Array,     # [E] 1.0 real / 0.0 padded
    num_frames: int,
) -> Tuple[jax.Array, jax.Array]:
    """GraphAgg (droid_net.py:34-67): per-source-frame mean of hidden state
    -> damping eta [E, h, w] (per edge, fp32 for the BA) and upsample mask
    per FRAME [num_frames, 576, h, w] in the net dtype.

    The reference gathers the mask per edge ([E, 576, h, w]) but consumes
    it per unique frame (depth_video.upsample); the per-edge gather + fp32
    cast materialized ~670 MB per update (2.7 ms measured in the round-3
    frontend trace) for values nothing reads per-edge — so the mask stays
    per-frame here. `tracking/video.upsample_disps` indexes it by frame."""
    h1 = jax.nn.relu(conv2d(p["conv1"], net, padding=1))
    # masked segment mean over source frame
    summed = jax.ops.segment_sum(h1 * mask[:, None, None, None], ii, num_segments=num_frames)
    count = jax.ops.segment_sum(mask, ii, num_segments=num_frames)
    mean = summed / jnp.maximum(count, 1.0)[:, None, None, None]
    # conv(mean[ii]) == conv(mean)[ii] (pointwise over the batch axis): run
    # the head convs on the N frame means, gather per edge afterwards —
    # the edge table is bigger than the frame count (E ~ 1.4-3x N).
    # Backward-path divergence from the reference: clip_grad_custom here
    # clips the per-FRAME aggregated cotangent (duplicate-edge cotangents
    # sum before clipping) instead of per-edge.  Forward is identical and
    # the tracker is inference-only, so this only matters if someone ever
    # differentiates through agg_apply.
    h2 = jax.nn.relu(conv2d(p["conv2"], mean, padding=1))
    eta_n = jax.nn.softplus(clip_grad_custom(conv2d(p["eta"][0], h2, padding=1)))
    upmask_n = conv2d(p["upmask"][0], h2)
    return (0.01 * eta_n[ii, 0]).astype(jnp.float32), upmask_n


def init_update(key) -> Dict:
    keys = iter(jax.random.split(key, 16))
    return {
        "corr_encoder": [init_conv(next(keys), CORR_PLANES, 128, 1),
                         init_conv(next(keys), 128, 128, 3)],
        "flow_encoder": [init_conv(next(keys), 4, 128, 7),
                         init_conv(next(keys), 128, 64, 3)],
        "weight": [init_conv(next(keys), 128, 128, 3), init_conv(next(keys), 128, 2, 3)],
        "delta": [init_conv(next(keys), 128, 128, 3), init_conv(next(keys), 128, 2, 3)],
        "gru": init_gru(next(keys)),
        "agg": {
            "conv1": init_conv(next(keys), 128, 128, 3),
            "conv2": init_conv(next(keys), 128, 128, 3),
            "eta": [init_conv(next(keys), 128, 1, 3)],
            "upmask": [init_conv(next(keys), 128, 8 * 8 * 9, 1)],
        },
    }


def init_droid_net(key) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fnet": init_encoder(k1, 128),
        "cnet": init_encoder(k2, 256),
        "update": init_update(k3),
    }


# ---------------------------------------------------------------------------
# convex upsampling (droid_net.py:9-31)
# ---------------------------------------------------------------------------

def cvx_upsample(data: jax.Array, mask: jax.Array) -> jax.Array:
    """data [B, ht, wd, dim], mask [B, 576, ht, wd] -> [B, 8ht, 8wd, dim]."""
    B, ht, wd, dim = data.shape
    x = data.transpose(0, 3, 1, 2)  # [B, dim, ht, wd]
    m = jax.nn.softmax(mask.reshape(B, 9, 8, 8, ht, wd), axis=1)

    # 3x3 neighborhoods (unfold): pad then shift
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    patches = jnp.stack(
        [xp[:, :, dy : dy + ht, dx : dx + wd] for dy in range(3) for dx in range(3)],
        axis=2,
    )  # [B, dim, 9, ht, wd]

    up = jnp.einsum("bdkhw,bkijhw->bdijhw", patches, m)  # [B, dim, 8, 8, ht, wd]
    up = up.transpose(0, 4, 2, 5, 3, 1)                   # [B, ht, 8, wd, 8, dim]
    return up.reshape(B, 8 * ht, 8 * wd, dim)


# ---------------------------------------------------------------------------
# image feature helpers (motion_filter.py:22-37)
# ---------------------------------------------------------------------------

IMAGE_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGE_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_images(images: jax.Array) -> jax.Array:
    """[N, 3, H, W] in [0, 1] -> ImageNet-normalized."""
    return (images - IMAGE_MEAN[:, None, None]) / IMAGE_STD[:, None, None]


def feature_encoder(params: Dict, images: jax.Array) -> jax.Array:
    """fnet: normalized images -> [N, 128, H/8, W/8]."""
    return encoder_apply(params["fnet"], images, norm="instance")


def context_encoder(params: Dict, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cnet -> (net tanh [N,128,h,w], inp relu [N,128,h,w])."""
    out = encoder_apply(params["cnet"], images, norm="none")
    net, inp = jnp.split(out, 2, axis=1)
    return jnp.tanh(net), jax.nn.relu(inp)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

def cast_params(params: Dict, dtype) -> Dict:
    """Cast tracker weights (activations follow via conv2d) — bf16 is the
    parity default, mirroring the reference's fp16 autocast."""
    return jax.tree.map(lambda x: x.astype(dtype), params)


def load_droid_weights(path: str) -> Dict:
    """Convert the published droid.pth torch state_dict into our pytree.

    Applies the same surgery as the reference loader
    (`mneslam_mp.py:142-154`): strip 'module.', slice the delta/weight output
    heads to 2 channels.
    """
    import torch

    sd = {k.replace("module.", ""): v for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    for name in ("update.weight.2", "update.delta.2"):
        sd[name + ".weight"] = sd[name + ".weight"][:2]
        sd[name + ".bias"] = sd[name + ".bias"][:2]

    def arr(name):
        return jnp.asarray(sd[name].float().numpy())

    def conv(prefix):
        p = {"weight": arr(prefix + ".weight")}
        if prefix + ".bias" in sd:
            p["bias"] = arr(prefix + ".bias")
        return p

    def block(prefix, stride):
        p = {"conv1": conv(prefix + ".conv1"), "conv2": conv(prefix + ".conv2")}
        if stride > 1:
            p["downsample"] = conv(prefix + ".downsample.0")
        return p

    def encoder(prefix):
        return {
            "conv1": conv(prefix + ".conv1"),
            "layer1": [block(f"{prefix}.layer1.{i}", 1) for i in range(2)],
            "layer2": [block(f"{prefix}.layer2.{i}", s) for i, s in ((0, 2), (1, 1))],
            "layer3": [block(f"{prefix}.layer3.{i}", s) for i, s in ((0, 2), (1, 1))],
            "conv2": conv(prefix + ".conv2"),
        }

    return {
        "fnet": encoder("fnet"),
        "cnet": encoder("cnet"),
        "update": {
            "corr_encoder": [conv("update.corr_encoder.0"), conv("update.corr_encoder.2")],
            "flow_encoder": [conv("update.flow_encoder.0"), conv("update.flow_encoder.2")],
            "weight": [conv("update.weight.0"), conv("update.weight.2")],
            "delta": [conv("update.delta.0"), conv("update.delta.2")],
            "gru": {k: conv("update.gru." + k) for k in
                    ("convz", "convr", "convq", "w", "convz_glo", "convr_glo", "convq_glo")},
            "agg": {
                "conv1": conv("update.agg.conv1"),
                "conv2": conv("update.agg.conv2"),
                "eta": [conv("update.agg.eta.0")],
                "upmask": [conv("update.agg.upmask.0")],
            },
        },
    }
