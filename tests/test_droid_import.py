"""droid.pth importer test against a golden key manifest.

`tests/fixtures/droid_state_dict_manifest.json` records the exact key names
and tensor shapes of the published DROID-SLAM checkpoint's state_dict
(including the 'module.' prefixes and the 4-channel delta/weight heads the
reference loader slices to 2 — mneslam_mp.py:142-154). The test fabricates
a checkpoint with that layout and verifies `load_droid_weights`' key
surgery end-to-end: structure/shape parity with `init_droid_net`, the head
slicing, prefix stripping, and full consumption of every weight.
"""

import json
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mneslam_tpu.models import droid_net  # noqa: E402

MANIFEST = os.path.join(os.path.dirname(__file__), "fixtures",
                        "droid_state_dict_manifest.json")


def make_fake_checkpoint(path: str) -> dict:
    with open(MANIFEST) as f:
        manifest = json.load(f)
    rng = np.random.default_rng(0)
    sd = {k: torch.from_numpy(
        rng.standard_normal(shape).astype(np.float32) * 0.02)
        for k, shape in manifest.items()}
    torch.save(sd, path)
    return sd


@pytest.mark.slow
def test_load_droid_weights_layout(tmp_path):
    path = str(tmp_path / "droid.pth")
    sd = make_fake_checkpoint(path)

    params = droid_net.load_droid_weights(path)

    # structure and shapes match the randomly-initialized net exactly
    ref = droid_net.init_droid_net(jax.random.PRNGKey(0))
    ts, rs = jax.tree.structure(params), jax.tree.structure(ref)
    assert ts == rs, f"pytree structure mismatch:\n{ts}\n!=\n{rs}"
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(ref)[0]):
        assert a.shape == b.shape, (jax.tree_util.keystr(pa), a.shape, b.shape)

    # 'module.' prefix stripped: spot-check exact value round-trips
    np.testing.assert_array_equal(
        np.asarray(params["fnet"]["conv1"]["weight"]),
        sd["module.fnet.conv1.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["update"]["gru"]["convz"]["weight"]),
        sd["module.update.gru.convz.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["fnet"]["layer2"][0]["downsample"]["weight"]),
        sd["module.fnet.layer2.0.downsample.0.weight"].numpy())

    # head slicing: published 4-channel delta/weight heads -> first 2
    for head in ("weight", "delta"):
        w = sd[f"module.update.{head}.2.weight"].numpy()
        b = sd[f"module.update.{head}.2.bias"].numpy()
        assert w.shape[0] == 4, "manifest must ship the 4-ch heads"
        np.testing.assert_array_equal(
            np.asarray(params["update"][head][1]["weight"]), w[:2])
        np.testing.assert_array_equal(
            np.asarray(params["update"][head][1]["bias"]), b[:2])

    # every checkpoint weight is consumed (element-count bookkeeping:
    # total imported == total shipped minus the 2x2 sliced-away head rows)
    shipped = sum(v.numel() for v in sd.values())
    sliced_away = sum(
        sd[f"module.update.{h}.2.{p}"][2:].numel()
        for h in ("weight", "delta") for p in ("weight", "bias"))
    imported = sum(x.size for x in jax.tree.leaves(params))
    assert imported == shipped - sliced_away, (imported, shipped, sliced_away)
