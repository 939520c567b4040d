"""SDF / color MLP decoders as pure-function pytrees.

Behavioral equivalent of `/root/reference/model/decoder.py`: tiny bias-free
ReLU MLPs (default 2 layers x 32 hidden) mapping plane features (+ OneBlob
positional encoding) to SDF + geometric feature, and positional encoding
(+ optional color-plane features) + geometric feature to RGB. At this size a
plain `jnp.dot` chain is already a single fused XLA kernel on TPU — the MXU
equivalent of tinycudann's FullyFusedMLP that the reference optionally uses.

Params are dicts of weight lists so optax treats them uniformly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp


def _init_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32) -> jax.Array:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -bound, bound)


def init_mlp(key, dims: Sequence[int]) -> List[jax.Array]:
    """Bias-free MLP weights for layer sizes dims[0] -> ... -> dims[-1]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [_init_linear(k, i, o) for k, i, o in zip(keys, dims[:-1], dims[1:])]


def mlp_apply(weights: List[jax.Array], x: jax.Array) -> jax.Array:
    """ReLU MLP, no bias, linear output (reference decoder.py:39-55)."""
    for w in weights[:-1]:
        x = jax.nn.relu(x @ w)
    return x @ weights[-1]


def init_decoder(key, config) -> Dict[str, List[jax.Array]]:
    """Initialize {sdf, color} decoder params from the config surface.

    oneGrid=True (default, ColorSDFNet_v2): color net sees pos-encoding +
    geo features only; oneGrid=False (ColorSDFNet): plus color-plane
    features.
    """
    dec = config["decoder"]
    input_ch = config["model"]["input_ch"]
    input_ch_pos = config["model"]["input_ch_pos"]
    geo = dec["geo_feat_dim"]
    one_grid = config["grid"]["oneGrid"]

    k_sdf, k_color = jax.random.split(key)
    sdf_dims = [input_ch + input_ch_pos] + [dec["hidden_dim"]] * (dec["num_layers"] - 1) + [1 + geo]
    color_in = (input_ch_pos + geo) if one_grid else (input_ch + input_ch_pos + geo)
    color_dims = [color_in] + [dec["hidden_dim_color"]] * (dec["num_layers_color"] - 1) + [3]

    return {
        "sdf": init_mlp(k_sdf, sdf_dims),
        "color": init_mlp(k_color, color_dims),
    }


def decoder_apply(
    params: Dict[str, List[jax.Array]],
    embed: jax.Array,
    embed_pos: jax.Array,
    embed_color: jax.Array | None = None,
) -> jax.Array:
    """(plane feat, pos enc[, color feat]) -> raw [N, 4] = (rgb logits, sdf).

    Mirrors ColorSDFNet_v2.forward / ColorSDFNet.forward
    (decoder.py:128-175): SDF net on [embed, embed_pos]; color net on
    [embed_pos, (embed_color,) geo_feat].
    """
    h = mlp_apply(params["sdf"], jnp.concatenate([embed, embed_pos], axis=-1))
    sdf, geo_feat = h[..., :1], h[..., 1:]
    if embed_color is None:
        color_in = jnp.concatenate([embed_pos, geo_feat], axis=-1)
    else:
        color_in = jnp.concatenate([embed_pos, embed_color, geo_feat], axis=-1)
    rgb = mlp_apply(params["color"], color_in)
    return jnp.concatenate([rgb, sdf], axis=-1)
