"""End-to-end mapping-only test: GT poses on the synthetic box room.

This is BASELINE.json config #1 in miniature — the reference's degenerate
mode where poses come from the dataset and only the neural map is trained.
Convergence criterion: render PSNR improves substantially and depth error
drops to centimeter scale.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.mapping.mapper import Mapper
from mneslam_tpu.models.scene_rep import SceneRep


def tiny_config():
    return make_config({
        "mapping": {
            "bound": [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]],
            "marching_cubes_bound": [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]],
            "sample": 512,
            "min_pixels_cur": 64,
            "first_iters": 120,
            "iters": 25,
            "keyframe_every": 2,
            "n_pixels": 0.05,
        },
        "planes_res": {"coarse": 0.44, "fine": 0.22, "bound_dividable": 0.22},
        "cam": {"H": 48, "W": 64, "fx": 40.0, "fy": 40.0, "cx": 31.5, "cy": 23.5,
                "near": 0.0, "far": 8.0, "depth_trunc": 100.0},
        "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.25,
                     "trunc": 0.15, "rgb_weight": 5.0, "depth_weight": 0.1,
                     "sdf_weight": 1200, "fs_weight": 10},
        "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48, "truncation": 0.15},
    })


@pytest.mark.slow
def test_mapping_converges_on_synthetic_scene():
    cfg = tiny_config()
    ds = SyntheticBoxDataset(cfg, num_frames=8)
    scene = SceneRep(cfg)
    mapper = Mapper(cfg, scene, num_kf=8, rays_per_kf=ds.num_rays_to_save)

    key = jax.random.PRNGKey(0)
    state = mapper.init_state(key)

    # first frame
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    frame["frame_id"] = 0
    pose0 = jnp.asarray(ds[0]["c2w"])
    state, m0 = mapper.first_frame_mapping(state, frame, pose0, jax.random.PRNGKey(1))
    psnr_first = float(m0["psnr"])

    # subsequent keyframes with GT poses
    for i, fid in enumerate(range(2, 8, 2)):
        item = ds[fid]
        frame = {k: jnp.asarray(v) for k, v in item.items() if k != "frame_id"}
        pose = jnp.asarray(item["c2w"])
        k = jax.random.fold_in(key, 100 + fid)
        state = mapper.add_keyframe(state, jnp.asarray(fid), frame, pose, k)
        state, metrics = mapper.optimize(
            state, frame, pose, jax.random.fold_in(k, 1),
            iters=cfg["mapping"]["iters"],
        )

    assert np.isfinite(float(metrics["loss"]))
    final_psnr = float(metrics["psnr"])
    assert final_psnr > 18.0, f"PSNR too low after mapping: {final_psnr}"

    # render a full frame at a mapped pose and compare depth
    item = ds[4]
    H, W = ds.H, ds.W
    from mneslam_tpu.data.rays import rays_from_pose
    dirs = jnp.asarray(item["direction"]).reshape(-1, 3)
    rays_o, rays_d = rays_from_pose(dirs, jnp.asarray(item["c2w"]))
    depth, rgb = scene.render_image_rays(
        state.params, rays_o, rays_d, jnp.asarray(item["depth"]).reshape(-1), chunk=1024
    )
    gt_depth = np.asarray(item["depth"]).reshape(-1)
    valid = gt_depth > 0
    depth_l1 = float(np.mean(np.abs(np.asarray(depth)[valid] - gt_depth[valid])))
    assert depth_l1 < 0.08, f"depth L1 too high: {depth_l1}"

    rgb_err = float(np.mean(np.square(np.asarray(rgb) - np.asarray(item["rgb"]).reshape(-1, 3))))
    render_psnr = -10 * np.log10(rgb_err)
    assert render_psnr > 18.0, f"full-frame render PSNR too low: {render_psnr}"


def test_keyframe_db_roundtrip():
    from mneslam_tpu.mapping import keyframe as kf_lib
    db = kf_lib.init_db(num_kf=4, rays_per_kf=32)
    key = jax.random.PRNGKey(0)
    H, W = 8, 10
    direction = jax.random.normal(key, (H, W, 3))
    rgb = jax.random.uniform(key, (H, W, 3))
    depth = jnp.ones((H, W))
    db = kf_lib.add_keyframe(db, key, jnp.asarray(5), direction, rgb, depth)
    db = kf_lib.add_keyframe(db, jax.random.fold_in(key, 1), jnp.asarray(9),
                             direction, rgb, depth)
    assert int(db.count) == 2
    assert list(np.asarray(db.frame_ids[:3])) == [5, 9, -1]

    rays, slots = kf_lib.sample_global_rays(db, jax.random.PRNGKey(2), 64)
    assert rays.shape == (64, 7)
    # only filled slots are sampled
    assert set(np.asarray(slots).tolist()) <= {0, 1}
    # depths survived packing
    np.testing.assert_allclose(np.asarray(rays[:, 6]), 1.0)


def test_keyframe_overlap_selection():
    from mneslam_tpu.mapping import keyframe as kf_lib

    key = jax.random.PRNGKey(0)
    # (keyframe deletion is deliberately absent: the mapper lags tracking,
    # so culled keyframes are never mapped — see mapping/keyframe.py note
    # and test_slam_full.py::test_full_slam_with_culling_and_loop_ba)

    # overlap: identical pose sees everything; a far pose sees nothing
    poses = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(50.0)])
    rays_o = jnp.zeros((32, 3))
    rays_d = jnp.concatenate([0.1 * jax.random.normal(key, (32, 2)),
                              -jnp.ones((32, 1))], axis=-1)
    ratios = kf_lib.keyframe_selection_overlap(
        poses, rays_o, rays_d, 2.0 * jnp.ones(32),
        jnp.asarray([40.0, 40.0, 31.5, 23.5]), H=48, W=64)
    assert float(ratios[0]) > 0.9
    assert float(ratios[1]) < 0.1


def test_filter_depth_sampling():
    """mapping.filter_depth=True samples only valid-depth pixels
    (reference keyframe.py:34-38: 0 < d <= depth_trunc)."""
    from mneslam_tpu.mapping import keyframe as kf_lib

    H, W = 8, 10
    key = jax.random.PRNGKey(0)
    direction = jax.random.normal(key, (H, W, 3))
    rgb = jax.random.uniform(key, (H, W, 3))
    # only row 3 has valid depth; everything else is 0 or beyond trunc
    depth = jnp.zeros((H, W)).at[3].set(2.0).at[5].set(150.0)

    rays = kf_lib.sample_rays_from_frame(key, direction, rgb, depth, 64,
                                         filter_depth=True, depth_trunc=100.0)
    np.testing.assert_allclose(np.asarray(rays[:, 6]), 2.0)

    # unfiltered: invalid depths appear
    rays_u = kf_lib.sample_rays_from_frame(key, direction, rgb, depth, 64,
                                           filter_depth=False)
    assert (np.asarray(rays_u[:, 6]) == 0.0).any()

    # all-invalid frame falls back to unfiltered instead of NaN
    rays_f = kf_lib.sample_rays_from_frame(key, direction, rgb,
                                           jnp.zeros((H, W)), 16,
                                           filter_depth=True, depth_trunc=100.0)
    assert np.isfinite(np.asarray(rays_f)).all()


@pytest.mark.slow
def test_smooth_weight_wired_into_mapper_loss():
    """training.smooth_weight > 0 adds the TV plane-feature smoothness term
    to the mapper's loss (mneslam_mp.py:366-397) — gradients and loss value
    must differ from the smooth_weight=0 run on identical data."""
    cfg = tiny_config()
    ds = SyntheticBoxDataset(cfg, num_frames=2)
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])

    import copy
    cfg_s = copy.deepcopy(cfg)
    cfg_s["training"]["smooth_weight"] = 1000.0
    cfg_s["training"]["smooth_pts"] = 8
    cfg_s["training"]["smooth_vox"] = 0.3

    losses = {}
    for name, c in (("off", cfg), ("on", cfg_s)):
        scene = SceneRep(c)
        mapper = Mapper(c, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save)
        state = mapper.init_state(jax.random.PRNGKey(0))
        state = mapper.add_keyframe(state, jnp.asarray(0), frame, pose,
                                    jax.random.PRNGKey(1))
        state, metrics = mapper.optimize(state, frame, pose,
                                         jax.random.PRNGKey(2), iters=2)
        losses[name] = float(metrics["loss"])
    assert losses["on"] != losses["off"]
