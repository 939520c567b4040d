"""NetVLAD place-recognition descriptors (pure JAX) + deterministic stub.

Rebuild of `/root/reference/mp_slam/netvlad.py`: VGG16 conv backbone
(classification head and the final ReLU+MaxPool removed), NetVLAD layer
(K=64 clusters, intra-normalization), 4096-d whitening, with the MATLAB
`.mat` checkpoint importer (MatConvNet layout, netvlad.py:76-121).

For CI and environments without the checkpoint, `stub_descriptor` provides
a deterministic handcrafted global descriptor (downsampled color + gradient
statistics, L2-normalized) exposing the same cosine-similarity interface —
SURVEY.md §7.3 "NetVLAD/VGG16: ... gate behind a deterministic stub for CI".
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nn import conv2d

# VGG16 conv config up to conv5_3 (no final ReLU/pool): channel sizes with
# 'M' = 2x2 maxpool (torchvision vgg16 features[:-2]).
VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]


def vgg_backbone_apply(params: Dict, x: jax.Array) -> jax.Array:
    """x [B, 3, H, W] (0-255, mean-subtracted) -> [B, 512, H/16, W/16]."""
    conv_i = 0
    n_convs = sum(1 for c in VGG_CFG if c != "M")
    for spec in VGG_CFG:
        if spec == "M":
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
        else:
            x = conv2d(params["convs"][conv_i], x, padding=1)
            conv_i += 1
            if conv_i < n_convs:  # last conv has no ReLU (head removed)
                x = jax.nn.relu(x)
    return x


def netvlad_layer_apply(params: Dict, x: jax.Array) -> jax.Array:
    """x [B, C, N] -> [B, C*K] (netvlad.py:28-39)."""
    scores = jnp.einsum("kc,bcn->bkn", params["score_w"], x)  # [B, K, N]
    scores = jax.nn.softmax(scores, axis=1)
    # residuals to cluster centers [C, K]
    diff = x[:, :, None, :] - params["centers"][None, :, :, None]  # [B, C, K, N]
    desc = jnp.sum(scores[:, None] * diff, axis=-1)               # [B, C, K]
    # intra-normalization over feature dim
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
    desc = desc.reshape(desc.shape[0], -1)
    return desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)


def netvlad_apply(params: Dict, image: jax.Array) -> jax.Array:
    """image [B, 3, H, W] in [0, 1] -> descriptor [B, 4096] (netvlad.py:123-150)."""
    x = jnp.clip(image * 255.0, 0.0, 255.0)
    x = x - params["mean"][None, :, None, None]
    feat = vgg_backbone_apply(params, x)
    B, C = feat.shape[:2]
    feat = feat.reshape(B, C, -1)
    feat = feat / jnp.maximum(jnp.linalg.norm(feat, axis=1, keepdims=True), 1e-12)
    desc = netvlad_layer_apply(params, feat)
    if "whiten_w" in params:
        desc = desc @ params["whiten_w"].T + params["whiten_b"]
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
    return desc


def load_netvlad_mat(path: str) -> Dict:
    """Parse the MatConvNet struct checkpoint (netvlad.py:76-121)."""
    from scipy.io import loadmat

    mat = loadmat(path, struct_as_record=False, squeeze_me=True)
    layers = mat["net"].layers

    convs = []
    for lyr in layers:
        if getattr(lyr, "type", "") == "conv" and len(convs) < 13:
            w = np.asarray(lyr.weights[0], np.float32)  # S x S x IN x OUT
            b = np.asarray(lyr.weights[1], np.float32)
            convs.append({
                "weight": jnp.asarray(w.transpose(3, 2, 0, 1)),
                "bias": jnp.asarray(b.reshape(-1)),
            })

    score_w = np.asarray(layers[30].weights[0], np.float32)   # D x K
    centers = -np.asarray(layers[30].weights[1], np.float32)  # D x K
    params = {
        "convs": convs,
        "score_w": jnp.asarray(score_w.T),     # K x D
        "centers": jnp.asarray(centers),       # D x K
        # averageImage may arrive as [H, W, 3], [1, 1, 3] or squeezed — the
        # reference reads pixel [0, 0]'s channel means, i.e. the first three
        # flat values
        "mean": jnp.asarray(np.asarray(
            mat["net"].meta.normalization.averageImage, np.float32
        ).reshape(-1)[:3]),
    }
    w = np.asarray(layers[33].weights[0], np.float32).squeeze()  # IN x OUT
    b = np.asarray(layers[33].weights[1], np.float32).squeeze()
    params["whiten_w"] = jnp.asarray(w.T)  # OUT x IN
    params["whiten_b"] = jnp.asarray(b)
    return params


def init_netvlad_random(key, whiten: bool = True) -> Dict:
    """Random-weight NetVLAD (for shape tests; descriptors are meaningless)."""
    keys = iter(jax.random.split(key, 20))
    convs = []
    in_ch = 3
    for spec in VGG_CFG:
        if spec == "M":
            continue
        k = next(keys)
        convs.append({
            "weight": 0.05 * jax.random.normal(k, (spec, in_ch, 3, 3)),
            "bias": jnp.zeros((spec,)),
        })
        in_ch = spec
    params = {
        "convs": convs,
        "score_w": 0.1 * jax.random.normal(next(keys), (64, 512)),
        "centers": 0.1 * jax.random.normal(next(keys), (512, 64)),
        "mean": jnp.asarray([123.68, 116.779, 103.939]),
    }
    if whiten:
        params["whiten_w"] = 0.02 * jax.random.normal(next(keys), (4096, 512 * 64))
        params["whiten_b"] = jnp.zeros((4096,))
    return params


@jax.jit
def stub_descriptor(image: jax.Array, dim: int = 256) -> jax.Array:
    """Deterministic handcrafted descriptor [dim] for an image [H, W, 3].

    Tiling statistics of color and gradients — viewpoint-sensitive enough
    that nearby views correlate strongly and distant views don't, which is
    all the loop-closure logic needs in tests.
    """
    H, W, _ = image.shape
    g = 4
    hs, ws = H // g, W // g
    img = image[: hs * g, : ws * g]
    tiles = img.reshape(g, hs, g, ws, 3).mean(axis=(1, 3))          # [4, 4, 3]
    gx = jnp.abs(jnp.diff(image.mean(-1), axis=1))[: hs * g, : ws * g - 1]
    gy = jnp.abs(jnp.diff(image.mean(-1), axis=0))[: hs * g - 1, : ws * g]
    gxt = gx[: hs * g, : (ws - 1) * g].reshape(g, hs, g, -1).mean(axis=(1, 3))
    gyt = gy[: (hs - 1) * g, : ws * g].reshape(g, -1, g, ws).mean(axis=(1, 3))
    feat = jnp.concatenate([tiles.reshape(-1), gxt.reshape(-1), gyt.reshape(-1)])
    feat = jnp.pad(feat, (0, max(0, dim - feat.shape[0])))[:dim]
    return feat / jnp.maximum(jnp.linalg.norm(feat), 1e-12)


def make_descriptor_fn(config, key: Optional[jax.Array] = None):
    """Descriptor extractor factory: NetVLAD from checkpoint if configured
    and present, else the deterministic stub."""
    import os

    name = config.get("model_name", "VGG16-NetVLAD-Pitts30K")
    ckpts = config.get("checkpoints", {}) or {}
    path = ckpts.get(name)
    if path and os.path.exists(str(path)):
        if str(path).endswith(".npz"):
            # pre-converted via tools/import_weights.py
            from ..utils.params_io import load_pytree_npz
            params = load_pytree_npz(str(path))
        else:
            params = load_netvlad_mat(str(path))

        def fn(image_hw3):
            img = jnp.clip(image_hw3, 0.0, 1.0).transpose(2, 0, 1)[None]
            return netvlad_apply(params, img)[0]

        return fn
    return lambda image_hw3: stub_descriptor(image_hw3)
