"""Tracker machinery tests.

The learned DROID weights aren't available offline, so the end-to-end test
injects an ORACLE update op (delta = ground-truth reprojection - current)
through the real graph/update/BA pipeline — exercising reprojection,
correlation lookup plumbing, damping aggregation, padded edge tables,
windowed BA, and keyframe removal, with known-correct supervision.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mneslam_tpu.models import droid_net
from mneslam_tpu.ops import correlation, lie, projective
from mneslam_tpu.tracking import graph as graph_lib
from mneslam_tpu.tracking import video as video_lib
from mneslam_tpu.tracking.graph import FactorGraph

HT, WD = 12, 16
INTR = jnp.asarray([12.0, 12.0, WD / 2 - 0.5, HT / 2 - 0.5])


# ---------------------------------------------------------------------------
# correlation
# ---------------------------------------------------------------------------

def brute_force_corr(f1, f2_pyr, coords, radius=3):
    """Numpy reference mirroring corr_index_forward_kernel semantics."""
    C, H, W = f1.shape
    out_levels = []
    for lvl, f2 in enumerate(f2_pyr):
        _, H2, W2 = f2.shape
        vol = np.einsum("cp,cq->pq", f1.reshape(C, -1), f2.reshape(C, -1)).reshape(H * W, H2, W2)
        c = coords.reshape(-1, 2) / (2 ** lvl)
        rd = 2 * radius + 1
        corr = np.zeros((H * W, rd, rd), np.float64)
        for p in range(H * W):
            x0, y0 = c[p]
            for i in range(rd):
                for j in range(rd):
                    x = x0 - radius + i
                    y = y0 - radius + j
                    xf, yf = int(np.floor(x)), int(np.floor(y))
                    dx, dy = x - xf, y - yf
                    v = 0.0
                    for (cx, cy, w) in [(xf, yf, (1 - dx) * (1 - dy)), (xf + 1, yf, dx * (1 - dy)),
                                        (xf, yf + 1, (1 - dx) * dy), (xf + 1, yf + 1, dx * dy)]:
                        if 0 <= cx < W2 and 0 <= cy < H2:
                            v += w * vol[p, cy, cx]
                    corr[p, i, j] = v
        out_levels.append(corr.reshape(H * W, rd * rd))
    return np.concatenate(out_levels, -1).T.reshape(-1, H, W)


def test_alt_corr_matches_brute_force():
    key = jax.random.PRNGKey(0)
    N, C = 3, 8
    fmaps = jax.random.normal(key, (N, C, HT, WD))
    coords = jnp.stack(
        [jax.random.uniform(jax.random.fold_in(key, 1), (HT, WD), minval=-2, maxval=WD + 1),
         jax.random.uniform(jax.random.fold_in(key, 2), (HT, WD), minval=-2, maxval=HT + 1)],
        axis=-1,
    )
    ii = jnp.asarray([0, 1])
    jj = jnp.asarray([1, 2])
    out = correlation.alt_corr(fmaps, ii, jj, jnp.stack([coords, coords]), radius=3, chunk=2)

    pyr = [np.asarray(p) for p in correlation.build_pyramid(fmaps)]
    for e, (i, j) in enumerate([(0, 1), (1, 2)]):
        ref = brute_force_corr(pyr[0][i], [p[j] for p in pyr], np.asarray(coords))
        np.testing.assert_allclose(np.asarray(out[e]), ref, atol=1e-3, rtol=1e-3)


def test_pyramid_pooling():
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    pyr = correlation.build_pyramid(x, num_levels=2)
    # level 0 = x/4; level 1 = avg pool of level 0
    np.testing.assert_allclose(np.asarray(pyr[0]), np.asarray(x) / 4)
    expected = np.asarray([[2.5, 4.5], [10.5, 12.5]]) / 4
    np.testing.assert_allclose(np.asarray(pyr[1][0, 0]), expected)


# ---------------------------------------------------------------------------
# droid nets: shapes + upsampling
# ---------------------------------------------------------------------------

def test_droid_net_shapes():
    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 96))
    fmap = droid_net.feature_encoder(params, droid_net.normalize_images(img))
    assert fmap.shape == (2, 128, 8, 12)
    net, inp = droid_net.context_encoder(params, droid_net.normalize_images(img))
    assert net.shape == (2, 128, 8, 12) and inp.shape == (2, 128, 8, 12)
    assert float(jnp.max(jnp.abs(net))) <= 1.0  # tanh
    assert float(jnp.min(inp)) >= 0.0           # relu

    E = 3
    corr = jax.random.normal(jax.random.PRNGKey(2), (E, 196, 8, 12))
    net_e = jnp.zeros((E, 128, 8, 12))
    inp_e = jnp.zeros((E, 128, 8, 12))
    new_net, delta, weight = droid_net.update_apply(params["update"], net_e, inp_e, corr)
    assert new_net.shape == (E, 128, 8, 12)
    assert delta.shape == (E, 8, 12, 2)
    assert weight.shape == (E, 8, 12, 2)
    assert float(weight.min()) >= 0.0 and float(weight.max()) <= 1.0

    ii = jnp.asarray([0, 0, 1])
    eta, upmask = droid_net.agg_apply(params["update"]["agg"], new_net, ii,
                                      jnp.ones(E), 4)
    assert eta.shape == (E, 8, 12) and float(eta.min()) >= 0.0
    # upmask is per FRAME (consumed by upsample_disps per unique frame;
    # the reference's per-edge gather was dead weight — round 3)
    assert upmask.shape == (4, 576, 8, 12)
    # edges of the same source frame share agg outputs
    np.testing.assert_allclose(np.asarray(eta[0]), np.asarray(eta[1]), atol=1e-6)


def test_cvx_upsample_constant_field():
    """Convex combination of a constant field is that constant (interior;
    borders see the zero padding, same as torch's unfold)."""
    data = 3.14 * jnp.ones((1, 4, 5, 2))
    mask = jax.random.normal(jax.random.PRNGKey(0), (1, 576, 4, 5))
    up = droid_net.cvx_upsample(data, mask)
    assert up.shape == (1, 32, 40, 2)
    np.testing.assert_allclose(np.asarray(up[:, 8:24, 8:32]), 3.14, atol=1e-5)


# ---------------------------------------------------------------------------
# oracle end-to-end: graph + BA recover poses
# ---------------------------------------------------------------------------

def make_oracle(gt_poses, gt_disps, intrinsics):
    def update_fn(params, state, ii, jj, net, corr, motion, coords1):
        gt_target, valid = projective.projective_transform(
            gt_poses, gt_disps, intrinsics, ii, jj
        )
        delta = gt_target - coords1
        weight = jnp.broadcast_to(valid, delta.shape)
        return net, delta, weight

    def agg_fn(params, net, ii, mask, B):
        ht, wd = net.shape[2], net.shape[3]
        return 1e-4 * jnp.ones((net.shape[0], ht, wd)), \
            jnp.zeros((net.shape[0], 576, ht, wd))

    return update_fn, agg_fn


def test_graph_update_recovers_poses_with_oracle():
    key = jax.random.PRNGKey(0)
    n = 6
    buffer = 8

    phi = 0.02 * jax.random.normal(key, (n, 3))
    t = jnp.cumsum(0.06 * jax.random.normal(jax.random.fold_in(key, 1), (n, 3)), axis=0)
    gt_poses_n = jnp.concatenate([t, lie.so3_exp(phi)], -1).at[0].set(lie.identity())
    gt_poses = jnp.concatenate([gt_poses_n, lie.identity((buffer - n,))])
    gt_disps = jnp.broadcast_to(
        0.4 + 0.2 * jax.random.uniform(jax.random.fold_in(key, 2), (1, HT, WD)),
        (buffer, HT, WD),
    )

    state = video_lib.init_video(buffer, HT, WD)
    state = state._replace(disps=gt_disps, disps_sens=gt_disps)
    # noisy initial poses (first fixed)
    dxi = 0.05 * jax.random.normal(jax.random.fold_in(key, 3), (buffer, 6)).at[0].set(0.0)
    state = state._replace(poses=lie.retr(gt_poses, dxi))

    update_fn, agg_fn = make_oracle(gt_poses, gt_disps, INTR)
    graph = FactorGraph(buffer, HT, WD, capacity=40, params={}, intrinsics=INTR,
                        window=8, update_fn=update_fn, agg_fn=agg_fn)
    graph.add_neighborhood_factors(state, 0, n, r=2)
    assert graph.n_active > 0

    err0 = float(jnp.max(jnp.linalg.norm(
        lie.log(lie.mul(state.poses[:n], lie.inv(gt_poses[:n]))), axis=-1)))
    for _ in range(6):
        state = graph.update(state, t0=1, t1=n, iters=2, ep=1e-3, lm=1e-5)
    err1 = float(jnp.max(jnp.linalg.norm(
        lie.log(lie.mul(state.poses[:n], lie.inv(gt_poses[:n]))), axis=-1)))
    assert err1 < 0.05 * err0, f"oracle tracking did not converge: {err0} -> {err1}"


def test_keyframe_removal_consistency():
    buffer = 6
    state = video_lib.init_video(buffer, HT, WD)
    state = state._replace(timestamps=jnp.arange(buffer, dtype=jnp.float32))
    graph = FactorGraph(buffer, HT, WD, capacity=20, params={}, intrinsics=INTR,
                        window=8,
                        update_fn=lambda *a: None, agg_fn=lambda *a: None)
    graph.add_factors(state, [0, 1, 2, 3], [1, 2, 3, 4])
    state = graph.rm_keyframe(state, 2)
    # edges touching removed frame dropped; higher indices shifted
    assert set(zip(graph.ii.tolist(), graph.jj.tolist())) == {(0, 1), (2, 3)}
    # buffer compacted: timestamps shift down
    np.testing.assert_allclose(np.asarray(state.timestamps[:4]), [0, 1, 3, 4])


def test_frame_distance_properties():
    state = video_lib.init_video(4, HT, WD)
    d_same = video_lib.frame_distance(state, INTR, jnp.asarray([0]), jnp.asarray([1]))
    assert float(d_same[0]) < 1e-4  # identical poses/disps -> zero flow
    # large translation -> large distance
    poses = state.poses.at[2].set(jnp.asarray([3.0, 0, 0, 0, 0, 0, 1]))
    state2 = state._replace(poses=poses)
    d_far = video_lib.frame_distance(state2, INTR, jnp.asarray([0]), jnp.asarray([2]))
    assert float(d_far[0]) > float(d_same[0]) + 1.0


def test_depth_filter_consistency():
    """Consistent multi-view depths get high support; an outlier frame low."""
    buffer = 10
    state = video_lib.init_video(buffer, HT, WD)
    # all frames identity pose, constant disparity -> perfectly consistent
    state = state._replace(disps=0.5 * jnp.ones((buffer, HT, WD)))
    counts = video_lib.depth_filter(
        state, INTR, jnp.asarray([4]), jnp.asarray([0.05]))
    assert counts.shape == (1, HT, WD)
    # 6 neighbors agree everywhere except border pixels (inb excludes the
    # last row/col, as in the CUDA kernel)
    assert float(counts.mean()) > 4.5
    assert float(counts[0, 2:-2, 2:-2].min()) == 6.0

    # corrupt the center frame's disparity -> support collapses
    state2 = state._replace(disps=state.disps.at[4].set(5.0))
    counts2 = video_lib.depth_filter(
        state2, INTR, jnp.asarray([4]), jnp.asarray([0.05]))
    assert float(counts2.mean()) < 0.5


@pytest.mark.slow
def test_importance_sampling():
    from mneslam_tpu.config import make_config
    from mneslam_tpu.models.scene_rep import SceneRep
    cfg = make_config({"training": {"n_importance": 8, "n_range_d": 9,
                                    "n_samples_d": 8}})
    scene = SceneRep(cfg)
    # sample_pdf concentrates samples where weights are big
    bins = jnp.broadcast_to(jnp.linspace(0, 4, 16), (4, 16))
    w = jnp.zeros((4, 16)).at[:, 8].set(1.0)  # peak at z=...
    s = scene.sample_pdf(bins, w, 16)
    assert s.shape == (4, 16)
    peak = bins[0, 8]
    assert float(jnp.mean(jnp.abs(s - peak))) < 0.3

    # render_rays with importance resampling returns coarse + fine outputs
    params = scene.init_params(jax.random.PRNGKey(0))
    rays_o = jnp.zeros((8, 3))
    rays_d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (8, 1))
    out = scene.render_rays(params, rays_o, rays_d,
                            target_d=jnp.ones((8, 1)), key=jax.random.PRNGKey(1))
    assert "rgb0" in out and out["z_vals"].shape[1] == 9 + 8 + 8
    ret = scene.forward(params, rays_o, rays_d, jnp.zeros((8, 3)),
                        jnp.ones((8, 1)), key=jax.random.PRNGKey(2))
    assert np.isfinite(float(ret["rgb_loss"]))


def test_graph_sparse_ba_matches_dense_path():
    """Same oracle problem through the sparse-Schur full-history BA path."""
    key = jax.random.PRNGKey(0)
    n, buffer = 6, 8
    phi = 0.02 * jax.random.normal(key, (n, 3))
    t = jnp.cumsum(0.06 * jax.random.normal(jax.random.fold_in(key, 1), (n, 3)), axis=0)
    gt_poses_n = jnp.concatenate([t, lie.so3_exp(phi)], -1).at[0].set(lie.identity())
    gt_poses = jnp.concatenate([gt_poses_n, lie.identity((buffer - n,))])
    gt_disps = jnp.broadcast_to(
        0.4 + 0.2 * jax.random.uniform(jax.random.fold_in(key, 2), (1, HT, WD)),
        (buffer, HT, WD))

    dxi = 0.05 * jax.random.normal(jax.random.fold_in(key, 3), (buffer, 6)).at[0].set(0.0)
    init_poses = lie.retr(gt_poses, dxi)
    update_fn, agg_fn = make_oracle(gt_poses, gt_disps, INTR)

    results = {}
    for sparse in (False, True):
        state = video_lib.init_video(buffer, HT, WD)
        state = state._replace(disps=gt_disps, disps_sens=gt_disps, poses=init_poses)
        graph = FactorGraph(buffer, HT, WD, capacity=40, params={}, intrinsics=INTR,
                            window=8, update_fn=update_fn, agg_fn=agg_fn,
                            sparse_ba=sparse)
        graph.add_neighborhood_factors(state, 0, n, r=2)
        for _ in range(4):
            state = graph.update(state, t0=1, t1=n, iters=2, ep=1e-3, lm=1e-5)
        results[sparse] = np.asarray(state.poses[:n])

    err = float(jnp.max(jnp.linalg.norm(
        lie.log(lie.mul(jnp.asarray(results[True]), lie.inv(gt_poses[:n]))), axis=-1)))
    assert err < 5e-3, f"sparse path did not converge: {err}"
    np.testing.assert_allclose(results[True], results[False], atol=1e-4)


def test_sparse_pairs_cache_invalidation():
    """The Schur-pair cache must hit across same-edge-set updates and
    rebuild after every index mutation (add_factors / rm_factors /
    rm_keyframe renumbering)."""
    key = jax.random.PRNGKey(0)
    n, buffer = 6, 8
    gt_poses = lie.identity((buffer,))
    gt_disps = jnp.ones((buffer, HT, WD)) * 0.5
    update_fn, agg_fn = make_oracle(gt_poses, gt_disps, INTR)
    state = video_lib.init_video(buffer, HT, WD)
    state = state._replace(disps=gt_disps, disps_sens=gt_disps, poses=gt_poses)
    graph = FactorGraph(buffer, HT, WD, capacity=40, params={}, intrinsics=INTR,
                        window=8, update_fn=update_fn, agg_fn=agg_fn,
                        sparse_ba=True)
    graph.add_neighborhood_factors(state, 0, n, r=2)

    state = graph.update(state, t0=1, t1=n)
    pairs0 = graph._pairs
    assert pairs0 is not None
    state = graph.update(state, t0=1, t1=n)
    assert graph._pairs is pairs0  # unchanged edges -> cache hit

    graph.add_factors(state, [0], [3])
    state = graph.update(state, t0=1, t1=n)
    pairs1 = graph._pairs
    assert pairs1 is not pairs0  # new edge -> rebuilt

    graph.rm_factors(np.arange(graph.n_active) == 0, store=False)
    state = graph.update(state, t0=1, t1=n)
    pairs2 = graph._pairs
    assert pairs2 is not pairs1

    state = graph.rm_keyframe(state, n - 1)
    state = graph.update(state, t0=1, t1=n - 1)
    assert graph._pairs is not pairs2  # renumbering invalidates too


# ---------------------------------------------------------------------------
# batched motion filter
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_motion_filter_batch_equivalence():
    """track_batch (on-device lax.scan admission loop) == per-frame track:
    same admitted flags, counter, buffer contents, and reference features."""
    from mneslam_tpu.tracking.motion_filter import MotionFilter, encode_and_flow, encode_frame

    params = droid_net.init_droid_net(jax.random.PRNGKey(7))
    H, W = 64, 96
    rng = np.random.default_rng(3)
    n = 9
    imgs = [jnp.asarray(rng.random((3, H, W), np.float32)) for _ in range(n)]
    deps = [jnp.asarray(0.5 + rng.random((H, W), np.float32)) for _ in range(n)]
    gts = [jnp.asarray(np.eye(4, dtype=np.float32)) for _ in range(n)]

    # pick a threshold in the middle of the observed deltas so the batch
    # exercises both admit and skip branches
    fm = encode_frame(params, imgs[0])
    net = jnp.zeros((128, H // 8, W // 8))
    inp = jnp.zeros((128, H // 8, W // 8))
    ds = [float(encode_and_flow(params, fm, net, inp, im)[1]) for im in imgs[1:4]]
    thresh = float(np.median(ds))

    def run(mode):
        mf = MotionFilter(params, thresh=thresh)
        state = video_lib.init_video(16, H // 8, W // 8)
        counter, flags = 0, []
        if mode == "seq":
            for i in range(n):
                state, counter, adm = mf.track(state, counter, float(i),
                                               imgs[i], deps[i], gts[i])
                flags.append(adm)
        else:
            for s in range(0, n, 4):
                e = min(s + 4, n)
                state, counter, f = mf.track_batch(
                    state, counter, [float(i) for i in range(s, e)],
                    imgs[s:e], deps[s:e], gts[s:e])
                flags.extend(f)
        return state, counter, flags, mf

    st_a, c_a, f_a, mf_a = run("seq")
    st_b, c_b, f_b, mf_b = run("batch")

    assert f_a == f_b, (f_a, f_b)
    assert c_a == c_b
    assert mf_a.count == mf_b.count
    np.testing.assert_allclose(np.asarray(st_a.timestamps[:c_a]),
                               np.asarray(st_b.timestamps[:c_a]))
    for name in ("fmaps", "nets", "inps", "disps_sens", "disps", "poses_gt"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_a, name)[:c_a]),
            np.asarray(getattr(st_b, name)[:c_a]), atol=1e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(mf_a.fmap), np.asarray(mf_b.fmap),
                               atol=1e-5)


def test_alt_corr_pallas_masked_skip_interpret():
    """The fused Pallas kernel (interpret mode on CPU) == brute force on
    real edges; masked (padded) edges come back all-zero, not stale."""
    key = jax.random.PRNGKey(7)
    N, C = 3, 8
    fmaps = jax.random.normal(key, (N, C, HT, WD))
    coords = jnp.stack(
        [jax.random.uniform(jax.random.fold_in(key, 1), (HT, WD),
                            minval=-2, maxval=WD + 1),
         jax.random.uniform(jax.random.fold_in(key, 2), (HT, WD),
                            minval=-2, maxval=HT + 1)],
        axis=-1,
    )
    ii = jnp.asarray([0, 1, 0])
    jj = jnp.asarray([1, 2, 2])
    mask = jnp.asarray([1, 0, 1], jnp.int32)
    out = correlation.alt_corr_pallas_ml(
        fmaps, ii, jj, jnp.stack([coords] * 3), radius=3,
        interpret=True, mask=mask)

    pyr = [np.asarray(p) for p in correlation.build_pyramid(fmaps)]
    for e, (i, j) in ((0, (0, 1)), (2, (0, 2))):
        ref = brute_force_corr(pyr[0][i], [p[j] for p in pyr],
                               np.asarray(coords))
        np.testing.assert_allclose(np.asarray(out[e]), ref,
                                   atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(out[1]),
                                  np.zeros_like(np.asarray(out[1])))


def test_graph_update_lowmem_matches_monolithic():
    """The chunked corr+GRU path (corr_chunk, the reference's update_lowmem
    memory bound) must produce bit-identical poses/targets/weights to the
    monolithic update_step when the update/agg fns are chunk-invariant
    (the oracle fns are; the real GraphAgg is chunk-LOCAL by design, in
    both the reference and here)."""
    key = jax.random.PRNGKey(3)
    n, buffer = 6, 8

    phi = 0.02 * jax.random.normal(key, (n, 3))
    t = jnp.cumsum(0.05 * jax.random.normal(jax.random.fold_in(key, 1), (n, 3)), axis=0)
    gt_poses_n = jnp.concatenate([t, lie.so3_exp(phi)], -1).at[0].set(lie.identity())
    gt_poses = jnp.concatenate([gt_poses_n, lie.identity((buffer - n,))])
    gt_disps = jnp.broadcast_to(
        0.4 + 0.2 * jax.random.uniform(jax.random.fold_in(key, 2), (1, HT, WD)),
        (buffer, HT, WD))

    def make_state():
        state = video_lib.init_video(buffer, HT, WD)
        state = state._replace(disps=gt_disps, disps_sens=gt_disps)
        dxi = 0.04 * jax.random.normal(jax.random.fold_in(key, 3), (buffer, 6)).at[0].set(0.0)
        return state._replace(poses=lie.retr(gt_poses, dxi))

    update_fn, agg_fn = make_oracle(gt_poses, gt_disps, INTR)

    results = {}
    for name, chunk in (("mono", None), ("chunked", 8)):
        graph = FactorGraph(buffer, HT, WD, capacity=40, params={},
                            intrinsics=INTR, window=8,
                            update_fn=update_fn, agg_fn=agg_fn,
                            corr_chunk=chunk)
        if chunk is not None:
            assert graph.capacity % chunk == 0  # rounded up
        state = make_state()
        graph.add_neighborhood_factors(state, 0, n, r=2)
        for _ in range(2):
            state = graph.update(state, t0=1, t1=n, iters=2, ep=1e-3, lm=1e-5)
        results[name] = (np.asarray(state.poses), np.asarray(state.disps),
                         np.asarray(graph.target[: graph.n_active]),
                         np.asarray(graph.weight[: graph.n_active]),
                         np.asarray(state.damping))

    for a, b in zip(results["mono"], results["chunked"]):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_update_chunked_megastep_matches_loop():
    """The single-program chunked update (graph.update_chunked_step, round
    5) == the round-4 host structure (gru_chunk_step loop + ba_step),
    including with a chunk-LOCAL agg fn (the real GraphAgg aggregates
    within a lowmem pass — reference factor_graph.py:280-346 — so the
    mono-vs-chunked test above cannot pin that grouping)."""
    key = jax.random.PRNGKey(9)
    n, buffer, chunk = 6, 8, 8

    phi = 0.02 * jax.random.normal(key, (n, 3))
    t = jnp.cumsum(0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                            (n, 3)), axis=0)
    gt_poses_n = jnp.concatenate([t, lie.so3_exp(phi)], -1).at[0].set(
        lie.identity())
    gt_poses = jnp.concatenate([gt_poses_n, lie.identity((buffer - n,))])
    gt_disps = jnp.broadcast_to(
        0.4 + 0.2 * jax.random.uniform(jax.random.fold_in(key, 2),
                                       (1, HT, WD)), (buffer, HT, WD))
    update_fn, _ = make_oracle(gt_poses, gt_disps, INTR)

    def agg_fn(params, net, ii, mask, B):
        # chunk-LOCAL: eta depends on the masked mean over THIS chunk's
        # edges, so any chunk-boundary difference changes the damping
        ht, wd = net.shape[2], net.shape[3]
        m = mask.astype(net.dtype)
        bias = (net.mean(axis=(1, 2, 3)) * m).sum() / (m.sum() + 1.0)
        eta = (1e-4 + 1e-5 * bias) * jnp.ones((net.shape[0], ht, wd))
        return eta, jnp.zeros((net.shape[0], 576, ht, wd))

    def make_state():
        state = video_lib.init_video(buffer, HT, WD)
        state = state._replace(disps=gt_disps, disps_sens=gt_disps)
        dxi = 0.04 * jax.random.normal(jax.random.fold_in(key, 3),
                                       (buffer, 6)).at[0].set(0.0)
        return state._replace(poses=lie.retr(gt_poses, dxi))

    graph = FactorGraph(buffer, HT, WD, capacity=40, params={},
                        intrinsics=INTR, window=8,
                        update_fn=update_fn, agg_fn=agg_fn,
                        corr_chunk=chunk)
    state0 = make_state()
    graph.add_neighborhood_factors(state0, 0, n, r=2)
    ii, jj, mask = graph._padded_indices()
    net0, target0 = graph.net, graph.target
    S = chunk
    n_chunks = (graph.n_active + S - 1) // S
    ii_i = jnp.zeros(graph.cap_inac, jnp.int32)
    jj_i = jnp.zeros(graph.cap_inac, jnp.int32)
    m_i = jnp.zeros(graph.cap_inac, jnp.float32)
    tgt_i, w_i = graph.target_inac, graph.weight_inac

    # round-4 structure: host loop over gru_chunk_step, then one ba_step
    state, net, target, weight = state0, net0, target0, jnp.zeros_like(
        graph.weight)
    upmask_loop = None
    for c in range(n_chunks):
        sl = slice(c * S, (c + 1) * S)
        state, net_c, tgt_c, w_c, up_c = graph_lib.gru_chunk_step(
            state, {}, INTR, ii[sl], jj[sl], mask[sl], net[sl], target[sl],
            update_fn=update_fn, agg_fn=agg_fn)
        net = net.at[sl].set(net_c)
        target = target.at[sl].set(tgt_c)
        weight = weight.at[sl].set(w_c)
        if c == 0:
            upmask_loop = up_c
    state_loop = graph_lib.ba_step(
        state, INTR, jnp.concatenate([ii, ii_i]), jnp.concatenate([jj, jj_i]),
        jnp.concatenate([mask, m_i]), jnp.concatenate([target, tgt_i]),
        jnp.concatenate([weight, w_i]), jnp.asarray(1), jnp.asarray(n),
        window=8, iters=2, lm=1e-5, ep=1e-3)

    state_mega, net_m, target_m, weight_m, upmask_m = (
        graph_lib.update_chunked_step(
            state0, {}, INTR, ii, jj, mask, net0, target0,
            ii_i, jj_i, m_i, tgt_i, w_i, jnp.asarray(1), jnp.asarray(n),
            jnp.asarray(n_chunks, jnp.int32), window=8, chunk=S, iters=2,
            lm=1e-5, ep=1e-3, update_fn=update_fn, agg_fn=agg_fn))

    np.testing.assert_allclose(np.asarray(state_mega.poses),
                               np.asarray(state_loop.poses), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_mega.damping),
                               np.asarray(state_loop.damping), atol=1e-6)
    np.testing.assert_allclose(np.asarray(net_m), np.asarray(net), atol=1e-6)
    np.testing.assert_allclose(np.asarray(target_m), np.asarray(target),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(weight_m), np.asarray(weight),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(upmask_m),
                               np.asarray(upmask_loop), atol=1e-6)


def test_alt_corr_pallas_mxu_variant_matches():
    """The MXU-batched window-dot variant (MNESLAM_CORR_IMPL=pallas_mxu)
    is numerically identical to the shipped VPU kernel up to matmul
    accumulation order. (Kept as a documented alternative: measured
    slightly SLOWER on v5e — 30.0 vs 28.0 ms at frontend shapes,
    tools/prof_corr_mxu.py — the kernel is slab-assembly-bound.)"""
    key = jax.random.PRNGKey(9)
    N, C = 3, 8
    fmaps = jax.random.normal(key, (N, C, HT, WD))
    coords = jnp.stack(
        [jax.random.uniform(jax.random.fold_in(key, 1), (HT, WD),
                            minval=-2, maxval=WD + 1),
         jax.random.uniform(jax.random.fold_in(key, 2), (HT, WD),
                            minval=-2, maxval=HT + 1)],
        axis=-1,
    )
    ii = jnp.asarray([0, 1, 0])
    jj = jnp.asarray([1, 2, 2])
    mask = jnp.asarray([1, 0, 1], jnp.int32)
    args = (fmaps, ii, jj, jnp.stack([coords] * 3))
    a = correlation.alt_corr_pallas_ml(*args, radius=3, interpret=True,
                                       mask=mask)
    b = correlation.alt_corr_pallas_ml(*args, radius=3, interpret=True,
                                       mask=mask, mxu=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_gru_fused_gates_match_reference_formulation():
    """MNESLAM_GRU_IMPL=fused decomposes the gate convs into fewer, fatter
    GEMMs (one conv over inp + one over net); the math is identical, so the
    two formulations must agree to float tolerance."""
    key = jax.random.PRNGKey(3)
    p = droid_net.init_gru(key)
    E, h, w = 3, 6, 10
    net = jax.random.normal(jax.random.fold_in(key, 1), (E, 128, h, w)) * 0.1
    inp = jax.random.normal(jax.random.fold_in(key, 2), (E, 320, h, w)) * 0.1
    ref = droid_net.gru_apply(p, net, inp)
    fused = droid_net.gru_apply_fused(p, net, inp)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               atol=2e-6, rtol=1e-5)
