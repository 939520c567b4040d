"""Dataset loader tests against generated on-disk fixtures.

Each loader reads a synthetic directory in the real dataset's layout
(Replica results/ + traj.txt, ScanNet color/depth/pose, TUM rgb.txt/
depth.txt/groundtruth.txt) so file discovery, depth scaling, pose
conventions, and index windows are exercised without the actual data."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mneslam_tpu.config import make_config  # noqa: E402
from mneslam_tpu.data import datasets  # noqa: E402


def base_cfg(**over):
    cfg = make_config({
        "cam": {"H": 32, "W": 40, "fx": 30.0, "fy": 30.0, "cx": 19.5, "cy": 15.5,
                "png_depth_scale": 1000.0, "crop_edge": 0},
        "mapping": {"n_pixels": 0.05},
        "data": {"downsample": 1},
    })
    cfg.update(over)
    return cfg


def write_frame(rgb_path, depth_path, H=32, W=40, depth_mm=2000):
    rgb = np.random.default_rng(0).integers(0, 255, (H, W, 3), np.uint8)
    cv2.imwrite(rgb_path, rgb)
    depth = np.full((H, W), depth_mm, np.uint16)
    cv2.imwrite(depth_path, depth)


def make_pose_line(tx):
    c2w = np.eye(4)
    c2w[0, 3] = tx
    return " ".join(str(v) for v in c2w.reshape(-1))


def test_replica_loader(tmp_path):
    d = tmp_path / "replica"
    (d / "results").mkdir(parents=True)
    for i in range(4):
        write_frame(str(d / "results" / f"frame{i:06d}.jpg"),
                    str(d / "results" / f"depth{i:06d}.png"))
    with open(d / "traj.txt", "w") as f:
        for i in range(4):
            f.write(make_pose_line(0.1 * i) + "\n")

    cfg = base_cfg()
    cfg["dataset"] = "replica"
    cfg["data"]["datadir"] = str(d)
    cfg["start_index"] = 1
    cfg["end_index"] = 3
    ds = datasets.get_dataset(cfg)
    assert len(ds) == 2  # index window applied
    item = ds[0]
    assert item["rgb"].shape == (32, 40, 3) and item["rgb"].max() <= 1.0
    # depth: 2000 / png_depth_scale(1000) = 2.0 m
    np.testing.assert_allclose(item["depth"], 2.0, atol=1e-3)
    # pose convention: translation preserved, Y/Z columns flipped
    assert abs(item["c2w"][0, 3] - 0.1) < 1e-6
    np.testing.assert_allclose(item["c2w"][:3, 1], [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(item["c2w"][:3, 2], [0, 0, -1], atol=1e-6)
    assert item["direction"].shape == (32, 40, 3)


def test_scannet_loader(tmp_path):
    d = tmp_path / "scannet"
    for sub in ("color", "depth", "pose"):
        (d / sub).mkdir(parents=True)
    for i in range(3):
        write_frame(str(d / "color" / f"{i}.jpg"), str(d / "depth" / f"{i}.png"))
        np.savetxt(str(d / "pose" / f"{i}.txt"),
                   np.eye(4) + 0.0)
    cfg = base_cfg()
    cfg["dataset"] = "scannet"
    cfg["data"]["datadir"] = str(d)
    cfg["cam"]["crop_edge"] = 2
    ds = datasets.get_dataset(cfg)
    assert len(ds) == 3
    item = ds[1]
    # crop applied
    assert item["rgb"].shape == (28, 36, 3)
    assert item["depth"].shape == (28, 36)


def test_tum_loader(tmp_path):
    d = tmp_path / "tum"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(3):
        t = 100.0 + 0.1 * i
        write_frame(str(d / "rgb" / f"{t:.3f}.png"), str(d / "depth" / f"{t:.3f}.png"))
        rgb_lines.append(f"{t:.4f} rgb/{t:.3f}.png")
        depth_lines.append(f"{t + 0.01:.4f} depth/{t:.3f}.png")
        gt_lines.append(f"{t - 0.005:.4f} {0.1 * i} 0 0 0 0 0 1")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(d / name, "w") as f:
            f.write("# header\n" + "\n".join(lines) + "\n")

    cfg = base_cfg()
    cfg["dataset"] = "tum"
    cfg["data"]["datadir"] = str(d)
    cfg["cam"]["png_depth_scale"] = 5000.0
    ds = datasets.get_dataset(cfg)
    assert len(ds) == 3  # all frames associated
    item = ds[2]
    assert abs(item["c2w"][0, 3] - 0.2) < 1e-5
    np.testing.assert_allclose(item["depth"], 2000 / 5000.0, atol=1e-3)


def test_config_inherit_chain(tmp_path):
    """YAML inherit_from layering (config.py semantics)."""
    base = tmp_path / "base.yaml"
    child = tmp_path / "child.yaml"
    base.write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    child.write_text(f"inherit_from: {base}\nnested:\n  y: 3\nb: 4\n")
    from mneslam_tpu.config import load_config

    cfg = load_config(str(child))
    assert cfg["a"] == 1 and cfg["b"] == 4
    assert cfg["nested"] == {"x": 1, "y": 3}


def test_repo_configs_load():
    """Every shipped config resolves through its inherit chain."""
    import glob

    from mneslam_tpu.config import default_config, deep_update, load_config

    paths = glob.glob("configs/**/*.yaml", recursive=True)
    # full per-scene tree: all Replica rooms/offices + apartment splits,
    # 8 ScanNet scenes, Indoor 4-agent overlays, Outdoor (reference
    # configs/**, ~45 files)
    assert len(paths) >= 45, sorted(paths)
    for path in paths:
        cfg = deep_update(default_config(), load_config(path))
        assert "cam" in cfg and "mapping" in cfg, path
        assert cfg["tracking"]["buffer"] > 0, path
        bound = np.asarray(cfg["mapping"]["bound"], float)
        mc = np.asarray(cfg["mapping"]["marching_cubes_bound"], float)
        assert bound.shape == (3, 2) and mc.shape == (3, 2), path
        assert (bound[:, 1] > bound[:, 0]).all(), path
        if "_agent" in path:
            assert int(cfg["end_index"]) > int(cfg["start_index"]) >= 0, path
        for key, b in (cfg.get("loop_bound") or {}).items():
            assert np.asarray(b, float).shape == (3, 2), (path, key)


def test_v5e8_deployment_knobs():
    """The v5e-8 deployment profiles pin the measured-optimal sharding
    knobs (BASELINE.md round-5 k-stale table): the single-agent 8-shard
    profile runs the k-stale seam (gather_every 8 — quality-neutral,
    divides the all-gather by 8), while the 2-agent fleet's 4-shard row
    groups override back to the sync seam (g8 COSTS compute at 4 shards:
    4.71 vs 4.46 bf16 ms/iter; the measured 192.5 ms/kf headline is sync)."""
    from mneslam_tpu.config import default_config, deep_update, load_config

    v5e8 = deep_update(default_config(),
                       load_config("configs/Replica/room0_v5e8.yaml"))
    assert v5e8["mapping"]["shard_plane_rows"] is True
    assert int(v5e8["mapping"]["shard_gather_every"]) == 8
    assert v5e8["training"]["render_dtype"] == "bfloat16"

    fleet = deep_update(default_config(),
                        load_config("configs/Replica/room0_v5e8_fleet.yaml"))
    assert fleet["mapping"]["shard_plane_rows"] is True  # inherited
    assert int(fleet["mapping"]["shard_gather_every"]) == 1  # overridden
    assert fleet["training"]["render_dtype"] == "bfloat16"


def test_replica_loader_undistortion(tmp_path):
    """cam.distortion triggers cv2.undistort on color only (dataset.py:99),
    applied at raw resolution with the raw intrinsics; depth untouched."""
    d = tmp_path / "replica_dist"
    (d / "results").mkdir(parents=True)
    write_frame(str(d / "results" / "frame000000.jpg"),
                str(d / "results" / "depth000000.png"))
    with open(d / "traj.txt", "w") as f:
        f.write(make_pose_line(0.0) + "\n")

    dist = [0.2, -0.05, 0.001, 0.001, 0.0]
    cfg = base_cfg()
    cfg["dataset"] = "replica"
    cfg["data"]["datadir"] = str(d)
    cfg["cam"]["distortion"] = dist
    ds = datasets.get_dataset(cfg)
    got = ds[0]

    cfg2 = base_cfg()
    cfg2["dataset"] = "replica"
    cfg2["data"]["datadir"] = str(d)
    ds2 = datasets.get_dataset(cfg2)
    plain = ds2[0]

    K = np.eye(3)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 30.0, 19.5, 30.0, 15.5
    want = cv2.undistort(plain["rgb"], K, np.asarray(dist))
    np.testing.assert_allclose(got["rgb"], want, atol=1e-6)
    assert np.abs(got["rgb"] - plain["rgb"]).max() > 1e-3  # it did something
    np.testing.assert_allclose(got["depth"], plain["depth"], atol=1e-7)
