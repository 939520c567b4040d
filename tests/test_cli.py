import pytest
"""CLI smoke test: config file -> mapping-only run -> output contract."""

import os
import subprocess
import sys


@pytest.mark.slow
def test_cli_mapping_only(tmp_path):
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(f"""
dataset: 'synthetic'
mode: 'mapping'
data:
  output: '{tmp_path}/out'
  exp_name: 'cli'
  num_frames: 6
mapping:
  bound: [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]]
  marching_cubes_bound: [[-2.1, 2.1], [-2.1, 2.1], [-2.1, 2.1]]
  sample: 256
  min_pixels_cur: 48
  first_iters: 40
  iters: 8
  keyframe_every: 3
planes_res:
  coarse: 0.44
  fine: 0.22
  bound_dividable: 0.22
cam:
  H: 40
  W: 56
  fx: 35.0
  fy: 35.0
  cx: 27.5
  cy: 19.5
  near: 0.0
  far: 8.0
training:
  n_range_d: 9
  n_samples_d: 8
  range_d: 0.25
  trunc: 0.15
model:
  c_dim: 16
  input_ch: 32
  input_ch_pos: 48
  truncation: 0.15
meshing:
  resolution: 0.25
loop_detection:
  enabled: false
""")
    env = dict(os.environ, PYTHONPATH=".", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "mneslam_tpu.cli", "--config", str(cfg_path)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out_dir = tmp_path / "out" / "cli" / "agent_0"
    assert (out_dir / "mesh" / "final_mesh.ply").exists()
    assert (out_dir / "metrics.jsonl").exists()
    assert (out_dir / "final_checkpoint.npz").exists()


@pytest.mark.slow
def test_cli_multiprocess_spawn(tmp_path):
    """--spawn launches one OS process per agent over FileComms
    (reference multi_agents.py:44-49): both children complete, publish
    keyframes/checkpoints/descriptors into the shared output tree, and
    produce the per-agent output contract."""
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(f"""
dataset: 'synthetic'
mode: 'mapping'
data:
  output: '{tmp_path}/out'
  exp_name: 'mp'
  num_frames: 6
mapping:
  bound: [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]]
  marching_cubes_bound: [[-2.1, 2.1], [-2.1, 2.1], [-2.1, 2.1]]
  sample: 256
  min_pixels_cur: 48
  first_iters: 40
  iters: 8
  keyframe_every: 3
planes_res:
  coarse: 0.44
  fine: 0.22
  bound_dividable: 0.22
cam:
  H: 40
  W: 56
  fx: 35.0
  fy: 35.0
  cx: 27.5
  cy: 19.5
  near: 0.0
  far: 8.0
training:
  n_range_d: 9
  n_samples_d: 8
  range_d: 0.25
  trunc: 0.15
model:
  c_dim: 16
  input_ch: 32
  input_ch_pos: 48
  truncation: 0.15
meshing:
  resolution: 0.25
loop_detection:
  enabled: true
  sim_threshold: 0.95
  min_time_diff: 100
""")
    env = dict(os.environ, PYTHONPATH=".", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "mneslam_tpu.cli", "--config", str(cfg_path),
         "--num_agents", "2", "--spawn"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    root = tmp_path / "out" / "mp"
    for rank in (0, 1):
        d = root / f"agent_{rank}"
        # FileComms exchange surface (each child wrote its own slice)
        assert (d / "key_est_poses.npy").exists()
        assert (d / "key_timestamps.npy").exists()
        assert (d / "latest_checkpoint.npz").exists()
        descs = list((d / "descriptors").glob("*.npz"))
        assert descs, f"agent {rank} published no descriptors"
        # per-agent output contract (the mesh file itself is seed-marginal
        # at this tiny scale — 0-vertex maps skip the save; the mesh path
        # is covered by test_cli_mapping_only)
        assert (d / "metrics.jsonl").exists()
        assert (d / "final_checkpoint.npz").exists()


def test_vis_cameras_tool(tmp_path):
    """Frustum/trajectory visualizer renders a PNG headlessly."""
    import numpy as np

    poses = np.tile(np.eye(4), (9, 1, 1))
    poses[:, 0, 3] = np.linspace(0.0, 2.0, 9)
    p = tmp_path / "poses.npy"
    np.save(p, poses)
    out = tmp_path / "cams.png"
    env = dict(os.environ, PYTHONPATH=".", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/vis_cameras.py", "--poses", str(p),
         "--gt", str(p), "--bound", "[[-1,3],[-1,1],[-1,1]]",
         "--every", "2", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert out.exists() and out.stat().st_size > 10_000


@pytest.mark.slow
def test_bench_quick_smoke():
    """`bench.py --quick` must stay runnable: the driver records its one
    JSON line after every round, so bitrot here silently voids the bench."""
    import json

    env = dict(os.environ, PYTHONPATH=".", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "bench.py", "--quick", "--reps", "2"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] and out["value"] > 0
    assert "slam_fps" in out["extra"]
