"""Device-mesh parallelism tests (8 virtual CPU devices)."""

import os
import sys

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from mneslam_tpu.config import make_config
from mneslam_tpu.models.scene_rep import SceneRep
from mneslam_tpu.parallel import mesh as pmesh


def tiny_scene():
    cfg = make_config({
        "mapping": {"bound": [[-1.2, 1.2]] * 3, "marching_cubes_bound": [[-1.2, 1.2]] * 3},
        "planes_res": {"coarse": 0.6, "fine": 0.3, "bound_dividable": 0.3},
        "cam": {"near": 0.0, "far": 5.0},
        "training": {"n_range_d": 7, "n_samples_d": 4, "range_d": 0.2},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48},
    })
    return SceneRep(cfg)


def make_batch(key, n_agents, batch):
    ro = 0.1 * jax.random.normal(key, (n_agents, batch, 3))
    rd = jax.random.normal(jax.random.fold_in(key, 1), (n_agents, batch, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rgb = jax.random.uniform(jax.random.fold_in(key, 2), (n_agents, batch, 3))
    d = 0.5 + jax.random.uniform(jax.random.fold_in(key, 3), (n_agents, batch, 1))
    return ro, rd, rgb, d


def test_sharded_step_matches_single_device():
    """2-agent sharded train step == unsharded vmap step, numerically."""
    assert len(jax.devices()) >= 8
    scene = tiny_scene()
    opt = optax.adam(1e-3)
    n_agents, batch = 2, 64

    keys = jax.random.split(jax.random.PRNGKey(0), n_agents)
    params = jax.vmap(scene.init_params)(keys)
    opt_state = jax.vmap(opt.init)(params)
    ro, rd, rgb, d = make_batch(jax.random.PRNGKey(1), n_agents, batch)
    step_keys = jax.random.split(jax.random.PRNGKey(2), n_agents)

    step = pmesh.make_multi_agent_train_step(scene, opt)
    # unsharded reference
    p_ref, _, loss_ref = step(params, opt_state, ro, rd, rgb, d, step_keys)

    m = pmesh.make_mesh(n_agents)
    params_s = pmesh.shard_agent_stack(params, m)
    opt_s = pmesh.shard_agent_stack(opt_state, m)
    args_s = [pmesh.shard_ray_batch(x, m) for x in (ro, rd, rgb, d)]
    p_out, _, loss_out = step(params_s, opt_s, *args_s,
                              pmesh.shard_agent_stack(step_keys, m))

    np.testing.assert_allclose(np.asarray(loss_out), np.asarray(loss_ref), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_out), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_descriptor_all_gather_and_fetch():
    n_agents, K, D = 4, 8, 32
    m = pmesh.make_mesh(n_agents)
    descs = jax.random.normal(jax.random.PRNGKey(0), (n_agents, K, D))
    descs_s = pmesh.shard_agent_stack(descs, m)

    gathered = pmesh.all_gather_descriptors(descs_s)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(descs), atol=1e-6)

    # cross-agent similarity works on the gathered copy
    sim = pmesh.cosine_similarity_matrix(gathered[0], gathered[1])
    assert sim.shape == (K, K)

    # fetch one agent's slice (the checkpoint-exchange analogue)
    sl = pmesh.fetch_agent_slice(descs_s, 2)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(descs[2]), atol=1e-6)


def test_ray_sharded_mapper_matches_unsharded():
    """Single-agent mapping with the per-iteration ray batch sharded over
    the full 8-device mesh == the unsharded Mapper, numerically (same key
    stream -> same samples; grads reduce via the psum XLA inserts). This is
    the multi-chip mapping-throughput path (BASELINE.md scatter-floor
    note): per-device scatters shrink by the device count."""
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper

    assert len(jax.devices()) >= 8
    cfg = make_config({
        "mapping": {"bound": [[-1.2, 1.2]] * 3,
                    "marching_cubes_bound": [[-1.2, 1.2]] * 3,
                    "sample": 64, "min_pixels_cur": 16},
        "planes_res": {"coarse": 0.6, "fine": 0.3, "bound_dividable": 0.3},
        "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "near": 0.0, "far": 5.0},
        "training": {"n_range_d": 7, "n_samples_d": 4, "range_d": 0.2},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=1.1)
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])

    mesh = pmesh.make_mesh(1)  # 1 agent x 8 ray devices
    assert mesh.shape["ray"] * mesh.shape["agent"] == 8

    results = []
    for m in (None, mesh):
        mapper = Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save,
                        mesh=m)
        # both variants must sample identical ray batches
        assert (mapper.n_global, mapper.n_cur) == (64, 16)
        st = mapper.init_state(jax.random.PRNGKey(2))
        st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose,
                                 jax.random.PRNGKey(3))
        st, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                                  iters=3)
        results.append((st, met))

    (st_ref, met_ref), (st_sh, met_sh) = results
    np.testing.assert_allclose(float(met_sh["loss"]), float(met_ref["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st_sh.params), jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("one_grid", [True, False])
def test_row_sharded_mapper_matches_unsharded(one_grid):
    """ZeRO-style mapper (plane params + Adam state + gradient fold
    sharded over table rows, packed tables all-gathered per iteration via
    `gather_table_rows`) == the unsharded Mapper, numerically. The
    collective seam must not change the math: forward gathers from the
    identical packed table, and the reduce-scattered packed cotangents
    fold to the identical plane gradient. Covers both grid.oneGrid modes
    (the False variant routes separate color planes through the seam)."""
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper

    assert len(jax.devices()) >= 8
    # plane dims must divide the 8-device mesh for the row placement to
    # engage: bound len 4.0 after dividable-adjust -> coarse 8, fine 16
    cfg = make_config({
        "grid": {"oneGrid": one_grid},
        "c_planes_res": {"coarse": 0.5, "fine": 0.25},
        "mapping": {"bound": [[-1.75, 1.75]] * 3,
                    "marching_cubes_bound": [[-1.75, 1.75]] * 3,
                    "sample": 64, "min_pixels_cur": 16},
        "planes_res": {"coarse": 0.5, "fine": 0.25, "bound_dividable": 0.5},
        "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "near": 0.0, "far": 5.0},
        "training": {"n_range_d": 7, "n_samples_d": 4, "range_d": 0.2},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=1.6)
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])

    mesh = pmesh.make_mesh(1)  # 1 agent x 8 ray devices

    results = []
    for kw in ({}, {"mesh": mesh, "shard_plane_rows": True}):
        mapper = Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save,
                        **kw)
        st = mapper.init_state(jax.random.PRNGKey(2))
        st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose,
                                 jax.random.PRNGKey(3))
        st, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                                  iters=3)
        results.append((st, met))

    (st_ref, met_ref), (st_sh, met_sh) = results
    np.testing.assert_allclose(float(met_sh["loss"]), float(met_ref["loss"]),
                               rtol=1e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(st_sh.params)[0],
            jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(path))
    # the collective seam really engages: the compiled step all-gathers the
    # packed tables (params themselves stay unpadded/replicated at rest)
    from mneslam_tpu.mapping.mapper import Mapper as M
    hlo = M.optimize.lower(
        Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save,
               mesh=mesh, shard_plane_rows=True),
        st_ref, frame, pose, jax.random.PRNGKey(4), iters=2,
    ).compile().as_text()
    assert "all-gather" in hlo


@pytest.mark.parametrize("prefetch", [1, 2])
def test_row_sharded_prefetch_sharding_exact(prefetch):
    """`mapping.shard_prefetch` (pipelined collectives: stale-by-one
    gathered tables; at 2, one-iteration-delayed gradient application)
    must not change the MATH of the sharding itself: the 8-device program
    equals the same prefetch program on a 1-device mesh (where every
    collective is the identity), leaf for leaf. Staleness semantics are
    shared by construction; this pins the collective decomposition.
    Also: iteration 0 is exact, so a 1-iteration run at prefetch=1 equals
    the exact (prefetch=0) seam bitwise."""
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper

    assert len(jax.devices()) >= 8
    cfg = make_config({
        "mapping": {"bound": [[-1.75, 1.75]] * 3,
                    "marching_cubes_bound": [[-1.75, 1.75]] * 3,
                    "sample": 64, "min_pixels_cur": 16,
                    "shard_prefetch": prefetch},
        "planes_res": {"coarse": 0.5, "fine": 0.25, "bound_dividable": 0.5},
        "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "near": 0.0, "far": 5.0},
        "training": {"n_range_d": 7, "n_samples_d": 4, "range_d": 0.2},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=1.6)
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])

    results = []
    for devs in (jax.devices()[:1], jax.devices()):
        mesh = pmesh.make_mesh(1, devices=devs)
        mapper = Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save,
                        mesh=mesh, shard_plane_rows=True)
        st = mapper.init_state(jax.random.PRNGKey(2))
        st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose,
                                 jax.random.PRNGKey(3))
        st, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                                  iters=4)
        results.append((st, met))

    (st_1, met_1), (st_8, met_8) = results
    np.testing.assert_allclose(float(met_8["loss"]), float(met_1["loss"]),
                               rtol=1e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(st_8.params)[0],
            jax.tree.leaves(st_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(path))

    # single-iteration runs are exact vs the synchronous seam (prefetch=1
    # consumes tables gathered from the same params at iteration 0)
    if prefetch == 1:
        cfg_sync = make_config(dict(cfg))
        cfg_sync["mapping"] = dict(cfg["mapping"], shard_prefetch=0)
        mesh = pmesh.make_mesh(1)
        outs = []
        for c in (cfg, cfg_sync):
            mapper = Mapper(c, scene, num_kf=4,
                            rays_per_kf=ds.num_rays_to_save,
                            mesh=mesh, shard_plane_rows=True)
            st = mapper.init_state(jax.random.PRNGKey(2))
            st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose,
                                     jax.random.PRNGKey(3))
            st, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                                      iters=1)
            outs.append((st, met))
        np.testing.assert_allclose(float(outs[0][1]["loss"]),
                                   float(outs[1][1]["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(outs[0][0].params),
                        jax.tree.leaves(outs[1][0].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_row_sharded_prefetch_converges():
    """The stale-gradient pipeline still optimizes. Staleness measurably
    SLOWS convergence (stale tables + delayed application lose ~1-2
    effective iterations and oscillate on the high-curvature fine plane:
    ~2.5-3.5x the sync loss at 25-50 iters on this tiny scene — why the
    stale modes are opt-in, not default); the test pins "optimizes and
    stays within the measured band", not parity."""
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper

    assert len(jax.devices()) >= 8
    losses = {}
    for prefetch in (0, 2):
        cfg = make_config({
            "mapping": {"bound": [[-1.75, 1.75]] * 3,
                        "marching_cubes_bound": [[-1.75, 1.75]] * 3,
                        "sample": 128, "min_pixels_cur": 32,
                        "shard_prefetch": prefetch},
            "planes_res": {"coarse": 0.5, "fine": 0.25,
                           "bound_dividable": 0.5},
            "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                    "cy": 11.5, "near": 0.0, "far": 5.0},
            "training": {"n_range_d": 7, "n_samples_d": 4, "range_d": 0.2},
            "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48},
        })
        scene = SceneRep(cfg)
        ds = SyntheticBoxDataset(cfg, num_frames=2, half=1.6)
        frame = {k: jnp.asarray(v) for k, v in ds[0].items()
                 if k != "frame_id"}
        pose = jnp.asarray(ds[0]["c2w"])
        mapper = Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save,
                        mesh=pmesh.make_mesh(1), shard_plane_rows=True)
        st = mapper.init_state(jax.random.PRNGKey(2))
        st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose,
                                 jax.random.PRNGKey(3))
        st, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                                  iters=25)
        losses[prefetch] = float(met["loss"])
    assert np.isfinite(losses[2])
    assert losses[2] < 5.0 * losses[0] + 1e-6, losses


def _gather_every_cfg(gather_every, sample=64, fold="after"):
    return make_config({
        "mapping": {"bound": [[-1.75, 1.75]] * 3,
                    "marching_cubes_bound": [[-1.75, 1.75]] * 3,
                    "sample": sample, "min_pixels_cur": sample // 4,
                    "shard_gather_every": gather_every,
                    "shard_fold": fold},
        "planes_res": {"coarse": 0.5, "fine": 0.25, "bound_dividable": 0.5},
        "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "near": 0.0, "far": 5.0},
        "training": {"n_range_d": 7, "n_samples_d": 4, "range_d": 0.2},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48},
    })


def _gather_every_run(cfg, devs, iters):
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper

    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=1.6)
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])
    mapper = Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save,
                    mesh=pmesh.make_mesh(1, devices=devs),
                    shard_plane_rows=True)
    st = mapper.init_state(jax.random.PRNGKey(2))
    st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose,
                             jax.random.PRNGKey(3))
    return mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                           iters=iters)


def test_row_sharded_gather_every_fresh_block_exact():
    """`mapping.shard_gather_every` (k-stale loop-invariant tables, round
    5): every k-block's FIRST iteration consumes a table gathered from the
    current params, so a 1-iteration run through the k-stale branch is
    bitwise equal to the synchronous seam (consume(x, gather(x)) == f(x))."""
    assert len(jax.devices()) >= 8
    outs = []
    for ge in (4, 1):  # 4 -> k-stale branch (remainder path); 1 -> sync
        st, met = _gather_every_run(_gather_every_cfg(ge), jax.devices(), 1)
        outs.append((st, met))
    np.testing.assert_allclose(float(outs[0][1]["loss"]),
                               float(outs[1][1]["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][0].params),
                    jax.tree.leaves(outs[1][0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_row_sharded_gather_every_sharding_exact():
    """The k-stale program's collective decomposition is exact: 8-device ==
    1-device (identity collectives) leaf for leaf, at an iteration count
    that exercises both whole k-blocks and the remainder block (iters=5,
    k=2). Staleness semantics are shared by construction; convergence is
    also pinned (the run still optimizes)."""
    assert len(jax.devices()) >= 8
    cfg = _gather_every_cfg(2)
    (st_1, met_1) = _gather_every_run(cfg, jax.devices()[:1], 5)
    (st_8, met_8) = _gather_every_run(cfg, jax.devices(), 5)
    np.testing.assert_allclose(float(met_8["loss"]), float(met_1["loss"]),
                               rtol=1e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(st_8.params)[0],
            jax.tree.leaves(st_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(path))
    assert np.isfinite(float(met_8["loss"]))


@pytest.mark.parametrize("gather_every", [1, 2])
def test_row_sharded_fold_before_sharding_exact(gather_every):
    """`mapping.shard_fold: before` (fold the full packed cotangent
    locally, reduce-scatter the RAW rows — 4x less backward ICI,
    parallel/mesh.make_row_sharded_pack fold="before") is an exact
    reordering of the linear fold: 8-device == 1-device leaf for leaf,
    and == the fold="after" default at matching staleness, both for the
    sync seam and combined with the k-stale gather (the minimal-ICI
    G_k+FB deployment configuration, tools/prof_zero9.py)."""
    assert len(jax.devices()) >= 8
    cfg_b = _gather_every_cfg(gather_every, fold="before")
    (st_1, met_1) = _gather_every_run(cfg_b, jax.devices()[:1], 5)
    (st_8, met_8) = _gather_every_run(cfg_b, jax.devices(), 5)
    np.testing.assert_allclose(float(met_8["loss"]), float(met_1["loss"]),
                               rtol=1e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(st_8.params)[0],
            jax.tree.leaves(st_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(path))
    # fold ordering must not change the math vs the "after" default
    (st_a, met_a) = _gather_every_run(
        _gather_every_cfg(gather_every, fold="after"), jax.devices(), 5)
    np.testing.assert_allclose(float(met_8["loss"]), float(met_a["loss"]),
                               rtol=1e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(st_8.params)[0],
            jax.tree.leaves(st_a.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(path))


def test_shard_plane_rows_config_knob(tmp_path):
    """`mapping.shard_plane_rows: true` routes MNESLAM's mapper through the
    row-sharded optimizer over all local devices; the mapping-only pipeline
    converges as usual."""
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.slam import MNESLAM

    assert len(jax.devices()) >= 8
    cfg = make_config({
        "mode": "mapping",
        "data": {"output": str(tmp_path), "exp_name": "rows"},
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3,
            "marching_cubes_bound": [[-2.1, 2.1]] * 3,
            "sample": 384, "min_pixels_cur": 64,
            "first_iters": 40, "iters": 15, "keyframe_every": 3,
            "shard_plane_rows": True,
        },
        "planes_res": {"coarse": 0.44, "fine": 0.22, "bound_dividable": 0.22},
        "cam": {"H": 40, "W": 56, "fx": 35.0, "fy": 35.0, "cx": 27.5,
                "cy": 19.5, "near": 0.0, "far": 8.0},
        "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.25,
                     "trunc": 0.15},
        "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48,
                  "truncation": 0.15},
        "meshing": {"resolution": 0.12},
    })
    ds = SyntheticBoxDataset(cfg, num_frames=7)
    slam = MNESLAM(cfg, ds, rank=0)
    assert slam.mapper.shard_rows
    metrics = slam.run_mapping_only(log_every=100)
    assert len(metrics) == 3
    assert metrics[-1]["psnr"] > 14.0


@pytest.mark.slow
def test_ray_sharded_mapper_matches_unsharded_reference_shapes():
    """Gradient/loss equality of sharded vs unsharded mapping at REFERENCE
    shapes (2048+100 rays x 43 samples, c_dim 32, 0.04/0.02 m planes over
    an 8 m bound) — VERDICT r2 next #2 asked for the equality claim at the
    real workload, not the tiny config."""
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper

    assert len(jax.devices()) >= 8
    bound = 4.0
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": 2048, "min_pixels_cur": 100},
        "planes_res": {"coarse": 0.04, "fine": 0.02, "bound_dividable": 0.04},
        "cam": {"H": 320, "W": 640, "fx": 320.0, "fy": 320.0,
                "cx": 319.5, "cy": 159.5, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=bound * 0.9)
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])

    # --- gradient equality on ONE identical batch (the exact claim: the
    # psum over ray shards reproduces the unsharded reduction up to fp32
    # sum order) ---
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.mapping import keyframe as kf_lib

    mesh = pmesh.make_mesh(1)  # 1 agent x 8 ray devices
    mapper_u = Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save)
    mapper_s = Mapper(cfg, scene, num_kf=4, rays_per_kf=ds.num_rays_to_save,
                      mesh=mesh)
    st = mapper_u.init_state(jax.random.PRNGKey(2))
    st = mapper_u.add_keyframe(st, jnp.asarray(0), frame, pose,
                               jax.random.PRNGKey(3))

    g_rays, slot_ids = kf_lib.sample_global_rays(st.db, jax.random.PRNGKey(5),
                                                 2048 + 104)
    rays_o, rays_d = rays_lib.rays_from_pose(g_rays[:, :3],
                                             st.kf_poses[slot_ids])
    t_rgb, t_d = g_rays[:, 3:6], g_rays[:, 6:7]

    def loss_u(p):
        return mapper_u._loss_fn(p, rays_o, rays_d, t_rgb, t_d,
                                 jax.random.PRNGKey(7))[0]

    def loss_s(p):
        ro, rd, rgb, d = mapper_s._shard_rays(rays_o, rays_d, t_rgb, t_d)
        return mapper_s._loss_fn(p, ro, rd, rgb, d, jax.random.PRNGKey(7))[0]

    lu, gu = jax.jit(jax.value_and_grad(loss_u))(st.params)
    ls, gs = jax.jit(jax.value_and_grad(loss_s))(st.params)
    assert abs(float(lu) - float(ls)) / max(abs(float(lu)), 1e-9) < 1e-5
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(gu)[0],
                            jax.tree.leaves(gs)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        err = np.abs(a - b).max() / scale
        assert err < 1e-4, (jax.tree_util.keystr(path), err)

    # --- full optimize() agreement stays loose: Adam's eps=1e-15
    # normalization amplifies fp32 sum-order noise into the trajectory ---
    losses = []
    for mapper in (mapper_u, mapper_s):
        st2, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                                   iters=2)
        losses.append(float(met["loss"]))
    assert abs(losses[0] - losses[1]) / max(abs(losses[0]), 1e-9) < 5e-3, losses


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [16])
def test_row_sharded_mapper_16_devices(n_dev):
    """The v5e-16 projection (BASELINE.md r4) quotes shard counts beyond
    the 8-device test mesh; prove the production seam (row padding to 16,
    uneven 80/16 ray split, packed all-gather/reduce-scatter) actually
    compiles and matches 1-device at that count. Subprocess because the
    virtual device count is fixed at jax init."""
    import subprocess

    env = dict(os.environ, PYTHONPATH=".", JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_dev}")
    r = subprocess.run(
        [sys.executable, "tests/_row_sharded_ndev.py", str(n_dev)],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"{n_dev}-device == 1-device: OK" in r.stdout
