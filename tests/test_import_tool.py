"""Turnkey weight-import path: tools/import_weights.py end-to-end.

VERDICT r2 next #4: the import path must be exercised beyond parsing — a
manifest-shaped droid state dict goes through the REAL pipeline (validate ->
key surgery -> npz -> runtime loader -> full frontend on synthetic frames),
so dropping in the real droid.pth is zero-risk.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mneslam_tpu.config import make_config
from mneslam_tpu.utils.params_io import load_pytree_npz, save_pytree_npz

REPO = os.path.join(os.path.dirname(__file__), "..")
TOOL = os.path.join(REPO, "tools", "import_weights.py")


def run_tool(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, TOOL, *args], env=env,
                          capture_output=True, text=True, timeout=600)


def test_params_io_roundtrip(tmp_path):
    tree = {
        "a": [jnp.arange(3.0), {"b": jnp.ones((2, 2))}],
        "c": {"d": [jnp.zeros(1), jnp.full((4,), 7.0)]},
    }
    p = str(tmp_path / "t.npz")
    save_pytree_npz(p, tree)
    back = load_pytree_npz(p)
    assert jax.tree.structure(back) == jax.tree.structure(tree)
    for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_import_droid_tool_and_frontend(tmp_path):
    """Fake droid.pth (golden-manifest shapes) -> import tool -> npz ->
    MNESLAM tracking.pretrained -> real frontend on synthetic frames."""
    torch = pytest.importorskip("torch")
    from tests.test_droid_import import make_fake_checkpoint

    pth = str(tmp_path / "droid.pth")
    sd = make_fake_checkpoint(pth)
    out = str(tmp_path / "droid.npz")

    r = run_tool(pth, "--out", out)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "smoke OK" in r.stdout, r.stdout
    assert os.path.exists(out)

    # runtime loader consumes the npz; weights really came from the file
    params = load_pytree_npz(out)
    np.testing.assert_array_equal(
        np.asarray(params["fnet"]["conv1"]["weight"]),
        sd["module.fnet.conv1.weight"].numpy())

    # drive the WHOLE frontend (random weights, real GRU/BA) for a few
    # frames — no quality claim, but every compiled path must run finite
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.slam import MNESLAM

    H, W = 64, 96
    cfg = make_config({
        "mode": "slam",
        "data": {"output": str(tmp_path), "exp_name": "imp"},
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3, "marching_cubes_bound": [[-2.1, 2.1]] * 3,
            "sample": 128, "min_pixels_cur": 32, "first_iters": 5, "iters": 2,
            "keyframe_every": 4, "global_ba_every": 1000,
        },
        "planes_res": {"coarse": 0.44, "fine": 0.22, "bound_dividable": 0.22},
        "cam": {"H": H, "W": W, "fx": 60.0, "fy": 60.0, "cx": 47.5, "cy": 31.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 8.0},
        "training": {"n_range_d": 5, "n_samples_d": 4, "range_d": 0.25,
                     "trunc": 0.15},
        "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48,
                  "truncation": 0.15},
        "tracking": {
            "buffer": 16, "warmup": 3, "upsample": False,
            "pretrained": out,
            "motion_filter": {"thresh": -1.0, "batch": 1},  # admit all
            "frontend": {"enable_loop": False, "keyframe_thresh": -1.0,
                         "window": 6, "radius": 1, "max_factors": 16,
                         "nms": 0, "thresh": 25.0},
            "backend": {"thresh": 25.0, "radius": 1, "nms": 1,
                        "loop_window": 6, "loop_thresh": 25.0,
                        "loop_radius": 1, "loop_nms": 1},
        },
        "loop_detection": {"enabled": False},
    })
    ds = SyntheticBoxDataset(cfg, num_frames=8)
    slam = MNESLAM(cfg, ds)  # droid_params come from the npz

    # the tracker's weights are the imported ones (bf16 casting is off on cpu)
    np.testing.assert_allclose(
        np.asarray(slam.tracker.params["update"]["gru"]["convz"]["weight"],
                   dtype=np.float32),
        sd["module.update.gru.convz.weight"].numpy(), atol=1e-2)

    for _ in range(6):
        if not slam.slam_step():
            break
    assert slam.tracker.counter >= 4  # past warmup: frontend initialized ran
    assert slam.tracker.frontend.is_initialized
    poses = np.asarray(slam.tracker.state.poses[: slam.tracker.counter])
    assert np.isfinite(poses).all()


@pytest.mark.slow
def test_import_netvlad_tool(tmp_path):
    pytest.importorskip("scipy")
    from tests.netvlad_fixture import make_fake_netvlad_mat

    mat = str(tmp_path / "vlad.mat")
    conv_ws, score, centers = make_fake_netvlad_mat(mat)
    out = str(tmp_path / "vlad.npz")

    r = run_tool(mat, "--out", out)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "smoke OK" in r.stdout, r.stdout

    # factory consumes the npz directly
    from mneslam_tpu.agents import netvlad as nv

    params = load_pytree_npz(out)
    np.testing.assert_allclose(np.asarray(params["score_w"]), score.T,
                               atol=1e-7)
    fn = nv.make_descriptor_fn(
        {"model_name": "X", "checkpoints": {"X": out}})
    desc = fn(jnp.ones((48, 64, 3)) * 0.5)
    assert desc.shape == (4096,)
    assert np.isfinite(np.asarray(desc)).all()


def test_import_droid_tool_rejects_bad_checkpoint(tmp_path):
    """Validation fails loudly on wrong keys/shapes."""
    torch = pytest.importorskip("torch")
    from tests.test_droid_import import MANIFEST

    with open(MANIFEST) as f:
        manifest = json.load(f)
    rng = np.random.default_rng(0)
    sd = {k: torch.from_numpy(rng.standard_normal(s).astype(np.float32))
          for k, s in manifest.items()}
    # corrupt: drop a key, add a stray one, break a shape
    sd.pop("module.fnet.conv1.bias")
    sd["module.something.else"] = torch.zeros(3)
    sd["module.cnet.conv1.weight"] = torch.zeros(1, 2, 3)
    pth = str(tmp_path / "bad.pth")
    torch.save(sd, pth)

    r = run_tool(pth, "--out", str(tmp_path / "bad.npz"))
    assert r.returncode != 0
    assert "missing keys" in r.stderr
    assert "unexpected keys" in r.stderr
    assert "shape mismatches" in r.stderr
