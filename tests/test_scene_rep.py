"""Scene representation unit tests: interpolation vs scipy, weights, losses."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from mneslam_tpu.config import make_config
from mneslam_tpu.models.scene_rep import SceneRep
from mneslam_tpu.ops import encodings, interp


def small_config():
    return make_config({
        "mapping": {"bound": [[-2.4, 2.4], [-2.4, 2.4], [-2.4, 2.4]],
                    "marching_cubes_bound": [[-2.4, 2.4], [-2.4, 2.4], [-2.4, 2.4]]},
        "planes_res": {"coarse": 0.48, "fine": 0.24, "bound_dividable": 0.24},
        "cam": {"H": 32, "W": 48, "fx": 40.0, "fy": 40.0, "cx": 23.5, "cy": 15.5,
                "near": 0.0, "far": 6.0},
        "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.2},
    })


def test_grid_sample_matches_scipy():
    """Bilinear border-clamped sampling == map_coordinates(order=1, nearest)."""
    key = jax.random.PRNGKey(0)
    plane = jax.random.normal(key, (4, 9, 13))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (50, 2), minval=-1.2, maxval=1.2)
    out = interp.grid_sample_2d(plane, coords)

    # scipy comparison: x -> col coord, y -> row coord (align_corners=True)
    x = np.asarray((coords[:, 0] + 1) * 0.5 * (13 - 1))
    y = np.asarray((coords[:, 1] + 1) * 0.5 * (9 - 1))
    for c in range(4):
        ref = ndimage.map_coordinates(np.asarray(plane[c]), [y, x], order=1, mode="nearest")
        np.testing.assert_allclose(out[:, c], ref, atol=1e-5)


def test_packed_sampler_bitequal_and_grad():
    """pack_corners + grid_sample_2d_packed == grid_sample_2d bit-for-bit
    (the mapping hot path: one 4C-wide row gather instead of four)."""
    plane = jax.random.normal(jax.random.PRNGKey(4), (32, 37, 53))
    coords = jax.random.uniform(jax.random.PRNGKey(5), (500, 2), minval=-1.3, maxval=1.3)
    # include exact grid corners / edges
    coords = jnp.concatenate([coords, jnp.asarray(
        [[-1., -1.], [1., 1.], [1., -1.], [-1., 1.], [0., 1.], [1., 0.]])])
    a = interp.grid_sample_2d(plane, coords)
    b = interp.grid_sample_2d_packed(interp.pack_corners(plane), plane.shape, coords)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ga = jax.grad(lambda p: jnp.sum(jnp.sin(interp.grid_sample_2d(p, coords))))(plane)
    gb = jax.grad(lambda p: jnp.sum(jnp.sin(
        interp.grid_sample_2d_packed(interp.pack_corners(p), p.shape, coords))))(plane)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_sample_plane_packed_custom_vjp():
    """sample_plane_packed (manual-VJP mapping hot path) == grid_sample_2d:
    values bit-for-bit, plane gradients AND coordinate gradients to float
    tolerance (pose-render alignment differentiates through coords)."""
    plane = jax.random.normal(jax.random.PRNGKey(4), (32, 37, 53))
    coords = jax.random.uniform(jax.random.PRNGKey(5), (500, 2),
                                minval=-1.3, maxval=1.3)
    coords = jnp.concatenate([coords, jnp.asarray(
        [[-1., -1.], [1., 1.], [1., -1.], [-1., 1.], [0., 1.], [1., 0.]])])

    a = interp.grid_sample_2d(plane, coords)
    b = interp.sample_plane_packed(plane, coords)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(fn, p, c):
        return jnp.sum(jnp.sin(fn(p, c)) * jnp.cos(jnp.arange(32)))

    ga_p, ga_c = jax.grad(lambda p, c: loss(interp.grid_sample_2d, p, c),
                          argnums=(0, 1))(plane, coords)
    gb_p, gb_c = jax.grad(lambda p, c: loss(interp.sample_plane_packed, p, c),
                          argnums=(0, 1))(plane, coords)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(gb_p), atol=1e-5)
    # coordinate gradients match everywhere except exact-boundary ties
    # (|coord| == 1 is measure-zero; jnp.clip splits tie gradients)
    no_tie = (np.abs(np.abs(np.asarray(coords)) - 1.0) > 1e-6)
    np.testing.assert_allclose(np.asarray(ga_c)[no_tie],
                               np.asarray(gb_c)[no_tie], atol=1e-4)


def test_pallas_scatter_add_rows_matches_xla():
    """The mapping backward's plane-cotangent scatter: the Pallas
    VMEM-resident serial-accumulate kernel (interpret mode on CPU) ==
    zeros.at[idx].add(vals), including duplicate indices and untouched
    rows, at a non-multiple-of-8 row count (the sublane pad path)."""
    from mneslam_tpu.ops import pallas_kernels

    rng = np.random.default_rng(0)
    for n_rows, nu, width in ((201, 64, 128), (1001, 500, 64)):
        idx = jnp.asarray(rng.integers(0, n_rows, nu), jnp.int32)
        # force duplicates
        idx = idx.at[: nu // 4].set(idx[nu // 4: nu // 2])
        vals = jnp.asarray(rng.standard_normal((nu, width)), jnp.float32)
        ref = jnp.zeros((n_rows, width), jnp.float32).at[idx].add(vals)
        got = pallas_kernels.scatter_add_rows_pallas(idx, vals, n_rows,
                                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
        # the unroll-32 variant the dispatcher selects above 16k updates
        # (round 5): same math, deeper manual unroll + remainder loop
        got32 = pallas_kernels.scatter_add_rows_pallas(idx, vals, n_rows,
                                                       interpret=True,
                                                       unroll=32)
        np.testing.assert_allclose(np.asarray(got32), np.asarray(ref),
                                   atol=1e-5)

    # the dispatcher falls back to XLA on CPU (and under the env override)
    out = pallas_kernels.scatter_add_rows(idx, vals, n_rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_scatter_dispatcher_pallas_paths(monkeypatch):
    """MNESLAM_SCATTER_IMPL=pallas drives the dispatcher's kernel branch
    (interpret mode on CPU): fp32 direct, bf16 via fp32 accumulation with
    casts at the edges (the bf16 RMW kernel never compiles on TPU)."""
    from mneslam_tpu.ops import pallas_kernels

    monkeypatch.setenv("MNESLAM_SCATTER_IMPL", "pallas")
    rng = np.random.default_rng(1)
    n_rows, nu, width = 301, 128, 128
    idx = jnp.asarray(rng.integers(0, n_rows, nu), jnp.int32)
    vals32 = jnp.asarray(rng.standard_normal((nu, width)), jnp.float32)

    ref32 = jnp.zeros((n_rows, width), jnp.float32).at[idx].add(vals32)
    got32 = pallas_kernels.scatter_add_rows(idx, vals32, n_rows)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(ref32),
                               atol=1e-5)

    vals16 = vals32.astype(jnp.bfloat16)
    got16 = pallas_kernels.scatter_add_rows(idx, vals16, n_rows)
    assert got16.dtype == jnp.bfloat16
    # fp32 accumulation of the bf16 values, rounded once at the end
    ref16 = (jnp.zeros((n_rows, width), jnp.float32)
             .at[idx].add(vals16.astype(jnp.float32))).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got16, np.float32), np.asarray(ref16, np.float32),
        atol=1e-6)


def test_pack_corners_hwc_and_rows_fold():
    """The row-sharded mapper's raw-rows collective seam primitives
    (parallel/mesh.make_row_sharded_pack): `pack_corners_hwc` ==
    `pack_corners` bit-for-bit, and `fold_corners_rows` is its exact
    transpose — on the full table, on a row-padded table (pad rows zero
    both ways), and composed block-by-block with one-y-row halos (the
    reduce-scattered backward's fold)."""
    C, H, W = 6, 11, 13
    plane = jax.random.normal(jax.random.PRNGKey(7), (C, H, W))
    hwc = jnp.transpose(plane, (1, 2, 0))

    p_ref = interp.pack_corners(plane)
    p_hwc = interp.pack_corners_hwc(hwc)
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_hwc))

    d = jax.random.normal(jax.random.PRNGKey(8), (H * W, 4 * C))
    a_ref = interp._unpack_corners_adjoint(d, C, H, W)
    a_rows = interp.fold_corners_rows(d, H, W)
    np.testing.assert_allclose(
        np.asarray(a_ref),
        np.asarray(jnp.transpose(a_rows.reshape(H, W, C), (2, 0, 1))),
        atol=1e-6)

    # true-transpose dot test: <pack(v), d> == <v, fold(d)>
    v = jax.random.normal(jax.random.PRNGKey(9), (H * W, C))
    lhs = float(jnp.vdot(interp.pack_corners_hwc(v.reshape(H, W, C)), d))
    rhs = float(jnp.vdot(v, a_rows))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)

    # padded fold: zero pad rows in, identical true rows + zero pad rows out
    Hp = 16
    dp = jnp.pad(d, ((0, (Hp - H) * W, ), (0, 0)))
    a_pad = interp.fold_corners_rows(dp, H, W)
    np.testing.assert_array_equal(np.asarray(a_pad[:H * W]), np.asarray(a_rows))
    assert float(jnp.abs(a_pad[H * W:]).max()) == 0.0

    # block composition: 4 blocks of Hp/4 y-rows with one-b-row halos ==
    # the full fold (what the shard_map backward computes per device)
    hb = Hp // 4
    blocks = []
    for k in range(4):
        blk = dp[k * hb * W:(k + 1) * hb * W]
        if k == 0:
            halo = None
        else:
            prev_rows = dp[(k * hb - 1) * W:k * hb * W]
            halo = interp._fold_b_rows(prev_rows.reshape(1, W, 4 * C)
                                       ).reshape(W, C)
        blocks.append(interp.fold_corners_rows(blk, H, W, y0=k * hb,
                                               halo_row=halo))
    a_blocks = jnp.concatenate(blocks, axis=0)
    np.testing.assert_allclose(np.asarray(a_blocks), np.asarray(a_pad),
                               atol=1e-6)


def test_upsample_exact_preserves_bilinear():
    """interp.upsample_exact: sampling the k-times upsampled plane ==
    sampling the original (align_corners bilinear is reproduced exactly on
    a nested grid) — the correctness basis of the merged sampler."""
    plane = jax.random.normal(jax.random.PRNGKey(6), (8, 9, 13))
    coords = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(7), (400, 2), minval=-1.3, maxval=1.3),
        jnp.asarray([[-1., -1.], [1., 1.], [0.1, -0.7]]),
    ])
    a = interp.grid_sample_2d(plane, coords)
    for k in (2, 3, 4):
        up = interp.upsample_exact(plane, k)
        assert up.shape == (8, k * 8 + 1, k * 12 + 1)
        b = interp.grid_sample_2d(up, coords)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)
        # grid nodes of the original plane are preserved exactly
        np.testing.assert_allclose(np.asarray(up[:, ::k, ::k]),
                                   np.asarray(plane), atol=1e-7)


def test_merged_sampler_matches_per_level():
    """SceneRep._plane_features_merged == per-level packed sampling on a
    nested two-level grid (values AND parameter gradients)."""
    cfg = small_config()
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(8))
    planes = params["planes"]
    assert scene._mergeable(planes), [p.shape for p in planes["xy"]]
    pts = jax.random.uniform(jax.random.PRNGKey(9), (300, 3),
                             minval=-2.4, maxval=2.4)
    p_nor = scene._normalize(pts)

    def per_level(pl):
        feats = []
        for lvl in range(2):
            xy = interp.grid_sample_2d(pl["xy"][lvl], p_nor[:, [0, 1]])
            xz = interp.grid_sample_2d(pl["xz"][lvl], p_nor[:, [0, 2]])
            yz = interp.grid_sample_2d(pl["yz"][lvl], p_nor[:, [1, 2]])
            feats.append(xy + xz + yz)
        return jnp.concatenate(feats, axis=-1)

    a = per_level(planes)
    b = scene._plane_features_merged(planes, p_nor)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    ga = jax.grad(lambda pl: jnp.sum(jnp.sin(per_level(pl))))(planes)
    gb = jax.grad(lambda pl: jnp.sum(jnp.sin(
        scene._plane_features_merged(pl, p_nor))))(planes)
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_grid_sample_3d_matches_scipy():
    key = jax.random.PRNGKey(2)
    vol = jax.random.normal(key, (2, 7, 9, 11))
    coords = jax.random.uniform(jax.random.PRNGKey(3), (40, 3), minval=-1.0, maxval=1.0)
    out = interp.grid_sample_3d(vol, coords)
    x = np.asarray((coords[:, 0] + 1) * 0.5 * (11 - 1))
    y = np.asarray((coords[:, 1] + 1) * 0.5 * (9 - 1))
    z = np.asarray((coords[:, 2] + 1) * 0.5 * (7 - 1))
    for c in range(2):
        ref = ndimage.map_coordinates(np.asarray(vol[c]), [z, y, x], order=1, mode="nearest")
        np.testing.assert_allclose(out[:, c], ref, atol=1e-5)


def test_one_blob_properties():
    """OneBlob: correct shape, nonnegative, locality (peak near input bin)."""
    x = jnp.asarray([[0.03125], [0.53125], [0.96875]])  # bin centers for n_bins=16
    enc = encodings.one_blob_encode(x, n_bins=16)
    assert enc.shape == (3, 16)
    assert float(enc.min()) >= 0.0
    np.testing.assert_array_equal(np.argmax(np.asarray(enc), axis=1), [0, 8, 15])


def test_sdf2weights_peak_at_surface():
    """Weights concentrate at the first zero crossing and ignore later ones."""
    cfg = small_config()
    scene = SceneRep(cfg)
    z = jnp.linspace(0.0, 4.0, 64)[None, :].repeat(2, 0)
    surface1, surface2 = 1.5, 3.0
    sdf = jnp.minimum(surface1 - z, jnp.abs(z - surface2))  # crossings at 1.5 only? no:
    # ray 0: sdf = surface1 - z (single crossing at 1.5)
    sdf0 = surface1 - z[0]
    # ray 1: two crossings at 1.0 and 3.0; first must win
    sdf1 = jnp.where(z[1] < 2.0, 1.0 - z[1], z[1] - 3.0)
    sdf = jnp.stack([sdf0, sdf1])
    w = scene.sdf2weights(sdf, z)
    np.testing.assert_allclose(np.sum(np.asarray(w), axis=1), 1.0, atol=1e-4)
    # truncation-band weighting biases ~trunc toward the camera (same as ref)
    d = np.sum(np.asarray(w * z), axis=1)
    assert abs(d[0] - surface1) < 0.15
    assert abs(d[1] - 1.0) < 0.15, f"first surface not selected: {d[1]}"


def test_depth_guided_sampling_brackets_target():
    cfg = small_config()
    scene = SceneRep(cfg)
    target_d = jnp.asarray([[2.0], [0.0]])  # second ray invalid
    z = scene.sample_z_vals(target_d, 2, key=None)
    # ray 0 contains the band around 2.0
    band = np.asarray(z[0])
    assert band.min() <= 2.0 - 0.19 or (np.abs(band - 2.0) < 0.21).sum() >= 5
    assert (np.abs(band - 2.0) <= 0.2 + 1e-5).sum() >= cfg["training"]["n_range_d"]
    # ray 1 falls back to [near, far]
    assert np.asarray(z[1]).max() > 5.0


def test_forward_losses_finite_and_grad():
    cfg = small_config()
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))
    n = 64
    key = jax.random.PRNGKey(1)
    rays_o = 0.1 * jax.random.normal(key, (n, 3))
    rays_d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target_rgb = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    target_d = 1.0 + jax.random.uniform(jax.random.fold_in(key, 3), (n, 1))
    # some invalid depths
    target_d = target_d.at[::7].set(0.0)

    def total(params):
        ret = scene.forward(params, rays_o, rays_d, target_rgb, target_d,
                            key=jax.random.PRNGKey(9))
        return scene.get_loss_from_ret(ret), ret

    (loss, ret), grads = jax.value_and_grad(total, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k, v in ret.items():
        assert np.all(np.isfinite(np.asarray(v))), f"non-finite {k}"
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # gradient must reach every parameter group
    gnorms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
    flat = jax.tree.leaves(gnorms)
    assert all(g > 0 for g in flat), f"dead parameters: {gnorms}"


def test_smoothness_loss():
    cfg = small_config()
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))
    s = scene.smoothness(params, jax.random.PRNGKey(1), sample_points=8,
                         voxel_size=0.1, margin=0.05)
    assert np.isfinite(float(s)) and float(s) >= 0.0


@pytest.mark.slow
def test_hash_grid_encoding():
    """Hash grid: shape, continuity, trainability."""
    from mneslam_tpu.ops import hashgrid

    params, res = hashgrid.init_hash_grid(
        jax.random.PRNGKey(0), n_levels=4, n_features_per_level=2,
        log2_hashmap_size=10, base_resolution=4, desired_resolution=32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hashgrid.hash_grid_encode(params, x, res)
    assert out.shape == (64, 8)

    # continuity: nearby points give nearby features
    eps = 1e-4
    out2 = hashgrid.hash_grid_encode(params, x + eps, res)
    assert float(jnp.max(jnp.abs(out2 - out))) < 0.05

    # trainable: fit a simple function of position
    import optax
    target_fn = lambda p: jnp.sin(4 * p[:, :1])
    w = jnp.zeros((8, 1))
    opt = optax.adam(1e-2)
    state = opt.init((params, w))

    def loss_fn(pw):
        pr, wr = pw
        f = hashgrid.hash_grid_encode(pr, x, res)
        return jnp.mean(jnp.square(f @ wr - target_fn(x)))

    pw = (params, w)
    l0 = float(loss_fn(pw))
    for _ in range(200):
        g = jax.grad(loss_fn)(pw)
        up, state = opt.update(g, state)
        pw = optax.apply_updates(pw, up)
    l1 = float(loss_fn(pw))
    assert l1 < 0.1 * l0, f"hash grid did not fit: {l0} -> {l1}"
