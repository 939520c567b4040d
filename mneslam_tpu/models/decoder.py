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


def mlp_apply_blocks(weights: List[jax.Array], xs: Sequence[jax.Array]) -> jax.Array:
    """`mlp_apply(weights, concat(xs, -1))` without the concat.

    TPU note: concatenating activations along the minor (lane) dimension
    forces lane-offset relayouts of every [N, C] block in BOTH the forward
    and the backward slice — measured ~11 ms per mapping step at 92k points
    (tools/prof_mapping10.py). Splitting the first layer's weight by rows
    (concat(xs) @ W == sum_i xs[i] @ W_i) keeps every block lane-aligned;
    the row slices of the small [in, hidden] weight are free.
    """
    w0 = weights[0]
    h, off = None, 0
    for x in xs:
        part = x @ w0[off:off + x.shape[-1]]
        h = part if h is None else h + part
        off += x.shape[-1]
    assert off == w0.shape[0], (off, w0.shape)
    h = jax.nn.relu(h) if len(weights) > 1 else h
    for w in weights[1:-1]:
        h = jax.nn.relu(h @ w)
    return h @ weights[-1] if len(weights) > 1 else h


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
    embed: jax.Array | Sequence[jax.Array],
    embed_pos: jax.Array,
    embed_color: jax.Array | Sequence[jax.Array] | None = None,
) -> jax.Array:
    """(plane feat, pos enc[, color feat]) -> raw [N, 4] = (rgb logits, sdf).

    Mirrors ColorSDFNet_v2.forward / ColorSDFNet.forward
    (decoder.py:128-175): SDF net on [embed, embed_pos]; color net on
    [embed_pos, (embed_color,) geo_feat]. `embed`/`embed_color` may be a
    sequence of per-level feature blocks — they feed the first layer as
    block matmuls instead of a lane-dim concat (see mlp_apply_blocks).
    """
    embed = list(embed) if isinstance(embed, (list, tuple)) else [embed]
    h = mlp_apply_blocks(params["sdf"], [*embed, embed_pos])
    sdf, geo_feat = h[..., :1], h[..., 1:]
    if embed_color is None:
        color_blocks = [embed_pos, geo_feat]
    else:
        emc = (list(embed_color) if isinstance(embed_color, (list, tuple))
               else [embed_color])
        color_blocks = [embed_pos, *emc, geo_feat]
    rgb = mlp_apply_blocks(params["color"], color_blocks)
    return jnp.concatenate([rgb, sdf], axis=-1)
