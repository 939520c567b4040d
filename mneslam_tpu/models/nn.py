"""Minimal NCHW conv-net primitives with torch-compatible weight layout.

The tracker networks must load the published DROID-SLAM checkpoint
(`droid.pth`, torch state_dict), so params keep torch's layout: conv weights
[out_ch, in_ch, kh, kw], biases [out_ch], and tensors flow as NCHW. XLA
handles layout assignment on TPU; keeping the logical layout torch-shaped
makes the weight converter a pure rename.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def conv2d(p: Dict, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """NCHW conv with torch-layout weights. p = {"weight": [O,I,kh,kw], "bias": [O]?}.

    Activations follow the parameter dtype: storing the tracker weights in
    bf16 runs the whole conv stack in bf16 (the reference runs its tracker
    under fp16 autocast, motion_filter.py:26).
    """
    w = p["weight"]
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"][None, :, None, None]
    return out


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d defaults: no affine, per-(sample, channel) over HW."""
    mean = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.var(x, axis=(2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def init_conv(key, in_ch: int, out_ch: int, k: int, bias: bool = True) -> Dict:
    """Kaiming-normal init (matches extractor.py:92-94)."""
    fan_out = out_ch * k * k
    std = jnp.sqrt(2.0 / fan_out)
    p = {"weight": std * jax.random.normal(key, (out_ch, in_ch, k, k))}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def clip_grad_custom(x: jax.Array, clip: float = 0.01) -> jax.Array:
    """GradientClip (tracker/modules/clipping.py): identity forward; backward
    zeroes gradient entries with |g| > clip or NaN."""
    @jax.custom_vjp
    def _f(x):
        return x

    def _fwd(x):
        return x, None

    def _bwd(_, g):
        g = jnp.where(jnp.isnan(g), 0.0, g)
        g = jnp.where(jnp.abs(g) > clip, 0.0, g)
        return (g,)

    _f.defvjp(_fwd, _bwd)
    return _f(x)
