"""Dataset onboarding tool (tools/validate_dataset.py) against generated
fixtures for every loader layout — the data-side analogue of
tests/test_import_tool.py: structure checks, convention checks, failure
reporting, and (slow tier) the few-frame track+map smoke."""

import importlib
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
vd = importlib.import_module("validate_dataset")


def write_frame(rgb_path, depth_path, H=48, W=64, depth_mm=2000, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 255, (H, W, 3), np.uint8)
    cv2.imwrite(str(rgb_path), rgb)
    depth = np.full((H, W), depth_mm, np.uint16)
    # mild slope so backprojection spans a volume, not a plane
    depth += (np.arange(W, dtype=np.uint16)[None, :] * 8)
    cv2.imwrite(str(depth_path), depth)


def pose_line(tx, ry=0.0):
    c, s = np.cos(ry), np.sin(ry)
    c2w = np.eye(4)
    c2w[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    c2w[0, 3] = tx
    return " ".join(str(v) for v in c2w.reshape(-1))


def make_replica(tmp_path, n=6, bad_pose=False):
    d = tmp_path / "replica"
    (d / "results").mkdir(parents=True)
    for i in range(n):
        write_frame(d / "results" / f"frame{i:06d}.jpg",
                    d / "results" / f"depth{i:06d}.png", seed=i)
    with open(d / "traj.txt", "w") as f:
        for i in range(n):
            line = pose_line(0.02 * i, ry=0.01 * i)
            if bad_pose and i == 2:
                line = " ".join(["2.0"] * 16)   # not a rigid transform
            f.write(line + "\n")
    return d


def run_main(argv):
    old = sys.argv
    sys.argv = ["validate_dataset.py"] + argv
    try:
        vd.main()
        return 0
    except SystemExit as e:
        return int(e.code or 0)
    finally:
        sys.argv = old


def cam_cfg_yaml(tmp_path, H=48, W=64, scale=1000.0, extra=""):
    p = tmp_path / "scene.yaml"
    p.write_text(
        f"cam:\n  H: {H}\n  W: {W}\n  fx: 40.0\n  fy: 40.0\n"
        f"  cx: {W / 2 - 0.5}\n  cy: {H / 2 - 0.5}\n"
        f"  png_depth_scale: {scale}\n  crop_edge: 0\n" + extra)
    return str(p)


def test_replica_checks_pass(tmp_path):
    d = make_replica(tmp_path)
    cfg = cam_cfg_yaml(tmp_path)
    rc = run_main([str(d), "--kind", "replica", "--config", cfg,
                   "--no-smoke"])
    assert rc == 0


def test_replica_missing_depth_fails(tmp_path):
    d = make_replica(tmp_path)
    os.remove(d / "results" / "depth000003.png")
    cfg = cam_cfg_yaml(tmp_path)
    rc = run_main([str(d), "--kind", "replica", "--config", cfg,
                   "--no-smoke"])
    assert rc == 1


def test_replica_bad_pose_fails(tmp_path):
    d = make_replica(tmp_path, bad_pose=True)
    cfg = cam_cfg_yaml(tmp_path)
    rc = run_main([str(d), "--kind", "replica", "--config", cfg,
                   "--no-smoke"])
    assert rc == 1


def test_replica_wrong_depth_scale_fails(tmp_path):
    """png_depth_scale 1.0 decodes the 16-bit depth to km — must FAIL."""
    d = make_replica(tmp_path)
    cfg = cam_cfg_yaml(tmp_path, scale=1.0)
    rc = run_main([str(d), "--kind", "replica", "--config", cfg,
                   "--no-smoke"])
    assert rc == 1


def test_replica_resolution_mismatch_fails(tmp_path):
    """cam.H/W disagreeing with the files corrupts every ray — must FAIL."""
    d = make_replica(tmp_path)
    cfg = cam_cfg_yaml(tmp_path, H=96, W=128)
    rc = run_main([str(d), "--kind", "replica", "--config", cfg,
                   "--no-smoke"])
    assert rc == 1


def test_scannet_layout_and_inf_pose_warn(tmp_path):
    d = tmp_path / "scannet"
    for sub in ("color", "depth", "pose"):
        (d / sub).mkdir(parents=True)
    for i in range(5):
        write_frame(d / "color" / f"{i}.jpg", d / "depth" / f"{i}.png",
                    seed=i)
        c2w = np.eye(4)
        c2w[0, 3] = 0.02 * i
        if i == 3:   # ScanNet ships inf-pose frames; must WARN, not FAIL
            c2w[:3, 3] = np.inf
        np.savetxt(str(d / "pose" / f"{i}.txt"), c2w)
    cfg = cam_cfg_yaml(tmp_path)
    rc = run_main([str(d), "--kind", "scannet", "--config", cfg,
                   "--no-smoke"])
    assert rc == 0


def test_indoor_layout(tmp_path):
    d = tmp_path / "indoor"
    (d / "color").mkdir(parents=True)
    (d / "depth_holefilling").mkdir()
    for i in range(4):
        # indoor decodes depth/65535*100: 2000 -> ~3.05 m
        write_frame(d / "color" / f"{i:04d}.jpg",
                    d / "depth_holefilling" / f"{i:04d}.png", seed=i)
    with open(d / "traj.txt", "w") as f:
        for i in range(4):
            f.write(pose_line(0.02 * i) + "\n")
    cfg = cam_cfg_yaml(tmp_path)
    rc = run_main([str(d), "--kind", "indoor", "--config", cfg,
                   "--no-smoke"])
    assert rc == 0


def test_tum_layout_and_association(tmp_path):
    d = tmp_path / "tum"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(5):
        t = 100.0 + 0.1 * i
        write_frame(d / "rgb" / f"{t:.3f}.png", d / "depth" / f"{t:.3f}.png",
                    seed=i)
        rgb_lines.append(f"{t:.4f} rgb/{t:.3f}.png")
        depth_lines.append(f"{t + 0.01:.4f} depth/{t:.3f}.png")
        gt_lines.append(f"{t - 0.005:.4f} {0.02 * i} 0 0 0 0 0 1")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        (d / name).write_text("# header\n" + "\n".join(lines) + "\n")
    cfg = cam_cfg_yaml(tmp_path, scale=5000.0)
    rc = run_main([str(d), "--kind", "tum", "--config", cfg, "--no-smoke"])
    assert rc == 0

    # break association: shift groundtruth timestamps far away
    (d / "groundtruth.txt").write_text(
        "# header\n" + "\n".join(
            f"{900.0 + 0.1 * i:.4f} {0.02 * i} 0 0 0 0 0 1"
            for i in range(5)) + "\n")
    rc = run_main([str(d), "--kind", "tum", "--config", cfg, "--no-smoke"])
    assert rc == 1


@pytest.mark.slow
def test_replica_full_smoke(tmp_path):
    """The complete command incl. the downsampled track+map smoke."""
    d = make_replica(tmp_path, n=6)
    cfg = cam_cfg_yaml(tmp_path)
    rc = run_main([str(d), "--kind", "replica", "--config", cfg,
                   "--smoke-frames", "5", "--out",
                   str(tmp_path / "smoke_out")])
    assert rc == 0
