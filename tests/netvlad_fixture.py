"""Shared synthetic MatConvNet NetVLAD checkpoint builder (reference layout,
/root/reference/mp_slam/netvlad.py:76-121): conv layers as S x S x IN x OUT,
layer 30 = NetVLAD (score D x K, centers stored negated), layer 33 =
whitening 1 x 1 x IN x OUT."""

import numpy as np


def make_fake_netvlad_mat(path: str, seed: int = 0):
    """Write a synthetic .mat; returns (conv_ws, score, centers)."""
    from scipy.io import savemat

    from mneslam_tpu.agents import netvlad as nv

    rng = np.random.default_rng(seed)
    layers = []
    in_ch = 3
    conv_ws = []
    for spec in nv.VGG_CFG:
        if spec == "M":
            layers.append({"type": "pool", "weights": np.empty(0, object)})
            continue
        w = rng.standard_normal((3, 3, in_ch, spec)).astype(np.float32) * 0.01
        b = rng.standard_normal(spec).astype(np.float32) * 0.01
        conv_ws.append((w, b))
        wb = np.empty(2, object)
        wb[0], wb[1] = w, b
        layers.append({"type": "conv", "weights": wb})
        layers.append({"type": "relu", "weights": np.empty(0, object)})
        in_ch = spec
    while len(layers) < 30:
        layers.append({"type": "relu", "weights": np.empty(0, object)})
    layers = layers[:30]
    score = rng.standard_normal((512, 64)).astype(np.float32) * 0.01
    centers = rng.standard_normal((512, 64)).astype(np.float32) * 0.01
    wb = np.empty(2, object)
    wb[0], wb[1] = score, -centers  # stored negated
    layers.append({"type": "netvlad", "weights": wb})
    while len(layers) < 33:
        layers.append({"type": "relu", "weights": np.empty(0, object)})
    ww = rng.standard_normal((1, 1, 512 * 64, 4096)).astype(np.float32) * 0.001
    wbias = rng.standard_normal((4096, 1)).astype(np.float32) * 0.01
    wb2 = np.empty(2, object)
    wb2[0], wb2[1] = ww, wbias
    layers.append({"type": "conv", "weights": wb2})

    mat = {
        "net": {
            "layers": np.asarray(layers, object),
            "meta": {"normalization": {
                "averageImage": np.asarray(
                    [[np.asarray([123.68, 116.779, 103.939], np.float32)]],
                    object)}},
        }
    }
    savemat(path, mat)
    return conv_ws, score, centers
