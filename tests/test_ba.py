"""Dense BA tests on synthetic multi-view problems with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from mneslam_tpu.ops import ba, lie, projective

HT, WD = 12, 16
INTR = jnp.asarray([12.0, 12.0, WD / 2 - 0.5, HT / 2 - 0.5])


def make_problem(key, n_frames=5, noise=0.05):
    """Ground-truth trajectory + structured disparity, perturbed initialization."""
    keys = jax.random.split(key, 6)
    phi = 0.03 * jax.random.normal(keys[0], (n_frames, 3))
    t = jnp.cumsum(0.08 * jax.random.normal(keys[1], (n_frames, 3)), axis=0)
    gt_poses = jnp.concatenate([t, lie.so3_exp(phi)], axis=-1)
    gt_poses = gt_poses.at[0].set(lie.identity())

    # smooth-ish disparity field in a sane range
    base = 0.4 + 0.2 * jax.random.uniform(keys[2], (1, HT, WD))
    gt_disps = jnp.broadcast_to(base, (n_frames, HT, WD))

    # fully-connected-ish edge list (all pairs within distance 2)
    ii, jj = [], []
    for a in range(n_frames):
        for b in range(n_frames):
            if a != b and abs(a - b) <= 2:
                ii.append(a)
                jj.append(b)
    ii = jnp.asarray(ii, dtype=jnp.int32)
    jj = jnp.asarray(jj, dtype=jnp.int32)

    target, valid = projective.projective_transform(gt_poses, gt_disps, INTR, ii, jj)

    problem = ba.BAProblem(
        target=target,
        weight=jnp.ones_like(target),
        eta=1e-4 * jnp.ones((n_frames, HT, WD)),
        ii=ii,
        jj=jj,
        mask=jnp.ones(ii.shape[0]),
    )

    # perturb all but the first (gauge) pose
    dxi = noise * jax.random.normal(keys[3], (n_frames, 6))
    dxi = dxi.at[0].set(0.0)
    init_poses = lie.retr(gt_poses, dxi)
    init_disps = gt_disps * (1.0 + 0.1 * jax.random.normal(keys[4], gt_disps.shape))
    return gt_poses, gt_disps, init_poses, init_disps, problem


def pose_error(a, b):
    """Max norm of log(a b^-1) over frames."""
    return float(jnp.max(jnp.linalg.norm(lie.log(lie.mul(a, lie.inv(b))), axis=-1)))


def test_ba_converges_to_ground_truth():
    gt_poses, gt_disps, init_poses, init_disps, problem = make_problem(jax.random.PRNGKey(0))
    err0 = pose_error(init_poses, gt_poses)
    poses, disps = ba.bundle_adjust(
        init_poses, init_disps, INTR, problem, t0=1, iters=12, ep=0.001, lm=1e-5
    )
    err1 = pose_error(poses, gt_poses)
    assert err1 < 0.05 * err0, f"BA did not converge: {err0} -> {err1}"
    # depth recovered where observed
    d_err = float(jnp.mean(jnp.abs(disps - gt_disps)))
    assert d_err < 0.01, f"depth error too high: {d_err}"


def test_ba_respects_gauge_fix():
    gt_poses, _, init_poses, init_disps, problem = make_problem(jax.random.PRNGKey(1))
    poses, _ = ba.bundle_adjust(init_poses, init_disps, INTR, problem, t0=2, iters=2)
    np.testing.assert_allclose(poses[:2], init_poses[:2], atol=1e-7)


def test_ba_padded_edges_are_inert():
    """Appending masked-out garbage edges must not change the result."""
    gt_poses, _, init_poses, init_disps, problem = make_problem(jax.random.PRNGKey(2))
    poses_a, disps_a = ba.bundle_adjust(init_poses, init_disps, INTR, problem, t0=1, iters=3)

    pad = 4
    problem_padded = ba.BAProblem(
        target=jnp.concatenate([problem.target, 777.0 * jnp.ones((pad, HT, WD, 2))]),
        weight=jnp.concatenate([problem.weight, jnp.ones((pad, HT, WD, 2))]),
        eta=problem.eta,
        ii=jnp.concatenate([problem.ii, jnp.zeros(pad, jnp.int32)]),
        jj=jnp.concatenate([problem.jj, jnp.ones(pad, jnp.int32)]),
        mask=jnp.concatenate([problem.mask, jnp.zeros(pad)]),
    )
    poses_b, disps_b = ba.bundle_adjust(
        init_poses, init_disps, INTR, problem_padded, t0=1, iters=3
    )
    np.testing.assert_allclose(poses_a, poses_b, atol=1e-5)
    np.testing.assert_allclose(disps_a, disps_b, atol=1e-5)


def test_ba_motion_only():
    """Motion-only BA recovers poses with depths held at ground truth."""
    gt_poses, gt_disps, init_poses, _, problem = make_problem(jax.random.PRNGKey(3))
    err0 = pose_error(init_poses, gt_poses)
    poses, disps = ba.bundle_adjust(
        init_poses, gt_disps, INTR, problem, t0=1, iters=10,
        ep=0.001, lm=1e-5, motion_only=True,
    )
    np.testing.assert_allclose(disps, gt_disps)  # untouched
    err1 = pose_error(poses, gt_poses)
    assert err1 < 0.05 * err0, f"motion-only BA did not converge: {err0} -> {err1}"


def test_ba_depth_sensor_prior():
    """With disps_sens given, unobserved-region disparities pull toward it."""
    gt_poses, gt_disps, init_poses, init_disps, problem = make_problem(jax.random.PRNGKey(4))
    poses, disps = ba.bundle_adjust(
        init_poses, init_disps, INTR, problem, disps_sens=gt_disps, t0=1, iters=8,
        ep=0.001, lm=1e-5,
    )
    d_err = float(jnp.mean(jnp.abs(disps - gt_disps)))
    assert d_err < 0.005, f"depth error with sensor prior: {d_err}"


def test_sparse_schur_matches_dense():
    """Full-history sparse-Schur BA == dense-E BA on the same problem."""
    from mneslam_tpu.ops import ba_sparse

    gt_poses, gt_disps, init_poses, init_disps, problem = make_problem(jax.random.PRNGKey(5))
    pairs = ba_sparse.build_pairs(np.asarray(problem.ii), np.asarray(problem.jj),
                                  np.asarray(problem.mask) > 0)

    p_d, d_d = ba.bundle_adjust(init_poses, init_disps, INTR, problem,
                                t0=1, iters=3, ep=1e-3, lm=1e-5)
    p_s, d_s = ba_sparse.bundle_adjust_sparse(init_poses, init_disps, INTR, problem,
                                              pairs, t0=1, iters=3, ep=1e-3, lm=1e-5,
                                              pair_chunk=64)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_d), atol=2e-3)


def test_sparse_schur_with_padding_and_sensor():
    from mneslam_tpu.ops import ba_sparse

    gt_poses, gt_disps, init_poses, init_disps, problem = make_problem(jax.random.PRNGKey(6))
    pad = 3
    problem_p = ba.BAProblem(
        target=jnp.concatenate([problem.target, jnp.ones((pad, HT, WD, 2))]),
        weight=jnp.concatenate([problem.weight, jnp.ones((pad, HT, WD, 2))]),
        eta=problem.eta,
        ii=jnp.concatenate([problem.ii, jnp.zeros(pad, jnp.int32)]),
        jj=jnp.concatenate([problem.jj, jnp.ones(pad, jnp.int32)]),
        mask=jnp.concatenate([problem.mask, jnp.zeros(pad)]),
    )
    pairs = ba_sparse.build_pairs(np.asarray(problem_p.ii), np.asarray(problem_p.jj),
                                  np.asarray(problem_p.mask) > 0, capacity=2048)
    p_d, d_d = ba.bundle_adjust(init_poses, init_disps, INTR, problem,
                                disps_sens=gt_disps, t0=1, iters=2)
    p_s, d_s = ba_sparse.bundle_adjust_sparse(init_poses, init_disps, INTR, problem_p,
                                              pairs, disps_sens=gt_disps, t0=1, iters=2)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_d), atol=2e-3)


def test_ba_matmul_precision_pinned():
    """Every dot in the jitted BA programs must carry HIGHEST (float32)
    precision: TPU's DEFAULT lowers fp32 dots to single-pass bf16, and a
    bf16-factored Cholesky on an ill-conditioned window returns a
    finite-but-WRONG GN step (trajectory exploded 1 mm -> 13 m on the real
    chip before the fix — BASELINE.md round 3). CPU ignores matmul
    precision, so this guards the jaxpr, not the numerics."""
    from mneslam_tpu.ops import ba_sparse

    gt_poses, _, init_poses, init_disps, problem = make_problem(jax.random.PRNGKey(7))
    pairs = ba_sparse.build_pairs(np.asarray(problem.ii), np.asarray(problem.jj),
                                  np.asarray(problem.mask) > 0)

    def collect(jaxpr, out):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                out.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    collect(v.jaxpr, out)
                elif hasattr(v, "eqns"):
                    collect(v, out)
        return out

    for fn in (
        lambda p, d: ba.bundle_adjust(p, d, INTR, problem, iters=1),
        lambda p, d: ba.bundle_adjust(p, d, INTR, problem, iters=1,
                                      motion_only=True),
        lambda p, d: ba_sparse.bundle_adjust_sparse(p, d, INTR, problem,
                                                    pairs, iters=1),
    ):
        precs = collect(jax.make_jaxpr(fn)(init_poses, init_disps).jaxpr, [])
        assert precs, "no dots found — jaxpr walk broke"
        bad = [p for p in precs
               if p != (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)]
        assert not bad, f"unpinned dot precisions in BA: {bad}"
