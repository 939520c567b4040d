"""Eval tooling tests: alignment recovers known transforms; recon metrics."""

import numpy as np

from mneslam_tpu.eval import ate, recon
from mneslam_tpu.ops import mc


def random_trajectory(n=50, seed=0):
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, 3] = np.cumsum(0.1 * rng.standard_normal((n, 3)), axis=0)
    return poses


def apply_sim3(poses, s, R, t):
    out = poses.copy()
    out[:, :3, 3] = (s * R @ poses[:, :3, 3].T + t.reshape(3, 1)).T
    return out


def test_ate_zero_for_rigidly_transformed_trajectory():
    gt = random_trajectory()
    theta = 0.7
    R = np.asarray([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    est = apply_sim3(gt, 1.0, R, np.asarray([1.0, -2.0, 0.5]))
    m = ate.evaluate_ate(gt, est, alignment="se3")
    assert m["rmse"] < 1e-6


def test_sim3_alignment_absorbs_scale():
    gt = random_trajectory(seed=1)
    R = np.eye(3)
    est = apply_sim3(gt, 2.5, R, np.zeros(3))
    m_se3 = ate.evaluate_ate(gt, est, alignment="se3")
    m_sim3 = ate.evaluate_ate(gt, est, alignment="sim3")
    assert m_sim3["rmse"] < 1e-6
    assert m_se3["rmse"] > 0.01  # se3 cannot absorb scale


def test_ate_detects_noise_level():
    gt = random_trajectory(seed=2)
    rng = np.random.default_rng(3)
    est = gt.copy()
    est[:, :3, 3] += 0.05 * rng.standard_normal((len(gt), 3))
    m = ate.evaluate_ate(gt, est, alignment="se3")
    assert 0.02 < m["rmse"] < 0.15


def test_timestamp_association():
    ia, ib = ate.associate(np.asarray([0.0, 1.0, 2.0, 3.0]),
                           np.asarray([1.01, 2.99, 10.0]), max_difference=0.1)
    assert list(ia) == [1, 3] and list(ib) == [0, 1]


def sphere_mesh(r, n=40):
    ax = np.linspace(-1.2, 1.2, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = np.sqrt(gx**2 + gy**2 + gz**2) - r
    sp = np.full(3, ax[1] - ax[0], np.float32)
    org = np.full(3, ax[0], np.float32)
    return mc.marching_cubes(vol, 0.0, origin=org, spacing=sp)


def test_recon_metrics_identical_and_offset():
    v, f = sphere_mesh(0.6)
    m_same = recon.eval_mesh(v, f, v, f, n_samples=20000)
    # identical meshes: residual is pure sampling noise (~NN spacing at 20k pts)
    assert m_same["accuracy_cm"] < 1.0
    assert m_same["completion_ratio_pct"] > 99.0

    v2, f2 = sphere_mesh(0.7)  # 10 cm larger sphere
    m_off = recon.eval_mesh(v2, f2, v, f, n_samples=20000)
    assert 8.0 < m_off["accuracy_cm"] < 12.0
    assert m_off["completion_ratio_pct"] < 50.0


def test_recon_icp_alignment_recovers_rigid_offset():
    """A rigidly-misaligned reconstruction recovers its metrics with
    align=True (the reference's ICP pre-step, eval_recon.py:103-157).
    A non-symmetric two-sphere scene pins the rotation."""
    v1, f1 = sphere_mesh(0.6)
    v2, f2 = sphere_mesh(0.35)
    v2 = v2 + np.asarray([0.9, 0.0, 0.0], np.float32)
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])

    ang = 0.06
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    t = np.asarray([0.05, -0.04, 0.03], np.float32)
    v_mis = v @ R.T + t

    m_mis = recon.eval_mesh(v_mis, f, v, f, n_samples=20000)
    m_ali = recon.eval_mesh(v_mis, f, v, f, n_samples=20000, align=True)
    assert m_mis["accuracy_cm"] > 3.0
    assert m_ali["accuracy_cm"] < 0.5 * m_mis["accuracy_cm"]
    assert m_ali["completion_ratio_pct"] > 95.0

    # the estimated transform inverts the misalignment
    T = recon.icp_align(v_mis, v)
    got = v_mis @ T[:3, :3].T + T[:3, 3]
    assert np.abs(got - v).max() < 0.02


def test_depth_l1():
    gt = np.ones((10, 10))
    rend = np.ones((10, 10)) * 1.03
    assert abs(recon.depth_l1(rend, gt) - 3.0) < 1e-6
    gt2 = gt.copy()
    gt2[0] = 0  # invalid rows excluded
    assert abs(recon.depth_l1(rend, gt2) - 3.0) < 1e-6
