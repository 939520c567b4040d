"""Mesh-fleet integration tests (8 virtual CPU devices).

The VERDICT-r1 integration requirement: the device mesh actually drives
multi-agent execution — per-agent map states stacked/sharded on the `agent`
axis, ONE sharded super-step per round, descriptor exchange through a real
all-gather, checkpoint fetch as a cross-slice read — and the result matches
the sequential InMemoryComms runner numerically.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mneslam_tpu.config import make_config
from mneslam_tpu.data.synthetic import SyntheticBoxDataset
from mneslam_tpu.parallel import mesh as pmesh
from mneslam_tpu.parallel.fleet import MeshAgentFleet, MeshComms
from mneslam_tpu.slam import MNESLAM


def fleet_cfg(tmp_path, exp="fleet", loop=False):
    return make_config({
        "mode": "mapping",
        "data": {"output": str(tmp_path), "exp_name": exp},
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3, "marching_cubes_bound": [[-2.1, 2.1]] * 3,
            "sample": 256, "min_pixels_cur": 48, "first_iters": 30, "iters": 8,
            "keyframe_every": 2, "loop_iters": 30, "distill_iters": 10,
            "lr_rot": 0.01, "lr_trans": 0.01,
        },
        "planes_res": {"coarse": 0.44, "fine": 0.22, "bound_dividable": 0.22},
        "cam": {"H": 40, "W": 56, "fx": 35.0, "fy": 35.0, "cx": 27.5, "cy": 19.5,
                "near": 0.0, "far": 8.0},
        "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.25, "trunc": 0.15},
        "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48, "truncation": 0.15},
        "loop_detection": {"enabled": loop, "sim_threshold": 0.9,
                           "min_time_diff": 50, "loop_launch_th": 2,
                           "min_matches_for_fusion": 1},
        "loop_bound": {"bound_0": [[-2.2, 2.2]] * 3, "bound_1": [[-2.2, 2.2]] * 3},
    })


class Slice:
    def __init__(self, ds, lo, hi):
        self.ds, self.lo, self.n = ds, lo, hi - lo
        self.num_rays_to_save = ds.num_rays_to_save

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        item = dict(self.ds[self.lo + i])
        item["frame_id"] = i
        return item


def make_agents(cfg, tmp_path, exp):
    ds = SyntheticBoxDataset(cfg, num_frames=16)
    a0 = MNESLAM(copy.deepcopy(cfg), Slice(ds, 0, 10), rank=0, world_size=2)
    a1 = MNESLAM(copy.deepcopy(cfg), Slice(ds, 6, 16), rank=1, world_size=2)
    return [a0, a1]


@pytest.mark.slow
def test_fleet_matches_sequential_runner(tmp_path):
    """2-agent mesh-fleet mapping == sequential InMemoryComms runner,
    numerically (same keys, same per-agent programs, vmapped + sharded)."""
    from mneslam_tpu.agents.runner import MultiAgentRunner

    assert len(jax.devices()) >= 2
    cfg = fleet_cfg(tmp_path, "seq", loop=False)

    seq_agents = make_agents(cfg, tmp_path, "seq")
    runner = MultiAgentRunner(seq_agents)
    seq_metrics = runner.run_mapping_only()

    mesh_agents = make_agents(fleet_cfg(tmp_path, "mesh", loop=False),
                              tmp_path, "mesh")
    fleet = MeshAgentFleet(mesh_agents)
    assert fleet.mesh.shape["agent"] == 2
    fleet_metrics = fleet.run_mapping_only()

    # identical keyframe schedule and near-identical optimization results
    for seq_log, fl_log in zip(seq_metrics, fleet_metrics):
        assert len(seq_log) == len(fl_log)
        for ms, mf in zip(seq_log, fl_log):
            assert abs(ms["loss"] - mf["loss"]) < 5e-3, (ms, mf)

    for a_seq, a_mesh in zip(seq_agents, mesh_agents):
        for ls, lm in zip(jax.tree.leaves(a_seq.map_state.params),
                          jax.tree.leaves(a_mesh.map_state.params)):
            np.testing.assert_allclose(np.asarray(lm), np.asarray(ls),
                                       atol=2e-4, rtol=1e-3)

    # the fleet's stacked state is genuinely agent-sharded on the mesh
    leaf = jax.tree.leaves(fleet.state.params)[0]
    assert leaf.sharding.is_equivalent_to(
        pmesh.agent_sharding(fleet.mesh), leaf.ndim), leaf.sharding


@pytest.mark.slow
def test_fleet_loop_closure_through_mesh_comms(tmp_path):
    """Cross-agent loop detection + render alignment run entirely through
    the mesh fabric: descriptors via all-gather, the foreign map via a
    cross-slice parameter fetch (no checkpoint copies)."""
    cfg = fleet_cfg(tmp_path, "fleetlc", loop=True)
    agents = make_agents(cfg, tmp_path, "fleetlc")
    fleet = MeshAgentFleet(agents)
    fleet.run_mapping_only()

    db = fleet.comms.descriptors()
    assert {e["agent_id"] for e in db} == {0, 1}
    assert len(db) == len(agents[0].mapped_timestamps) + \
        len(agents[1].mapped_timestamps)

    # checkpoint fetch returns the LIVE stacked params slice
    params1, meta1 = fleet.comms.get_checkpoint(1)
    for got, want in zip(jax.tree.leaves(params1),
                         jax.tree.leaves(agents[1].map_state.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert "bound" in meta1

    # overlapping segments on the same scene: at least one cross-agent
    # match should have fired through the gathered DB
    assert any(0 in c.fused_agents or 1 in c.fused_agents
               for c in fleet.collabs), "no cross-agent loop fired"


def test_fleet_mapping_only_closure_does_not_compound(tmp_path):
    """Regression: under `loop_closure.map_aligned`, run_mapping_only's
    publish/closure hook must consume RAW poses (slam.kf_poses_raw), never
    the aligned map slots. The stored closure transform re-applies to the
    growing raw trajectory on every publish; the map_aligned fold-back
    writes the DEFORMED poses into the stacked state, so feeding those
    back into _apply_closure would re-deform them once per round —
    compounding the correction exactly like the round-4 raw-pose bug
    (0.18 m -> 5.1 m). After N rounds the exported aligned trajectory must
    equal deform(raw, T) applied ONCE."""
    from mneslam_tpu.agents import fusion

    cfg = fleet_cfg(tmp_path, "cmp", loop=False)
    cfg["mapping"].update(first_iters=4, iters=2)  # pose bookkeeping only
    cfg["loop_closure"] = {"map_aligned": True, "pose_decay_sigma": 10.0,
                           "pose_decay_min_weight": 0.1}
    agents = make_agents(cfg, tmp_path, "cmp")
    fleet = MeshAgentFleet(agents)
    tgt = agents[1]

    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.05  # a 5 cm closure correction
    orig = tgt.collab.on_keyframe_mapped
    fired = {}

    def hook(kf_id, rgb, cur, kf_poses, kf_ts):
        # inject an accepted closure once two keyframes exist; the real
        # publish path then re-applies it on every subsequent round
        if not fired and len(kf_ts) >= 2:
            tgt.collab.closure_relative = T
            tgt.collab.closure_loss = 0.0
            tgt.collab.closure_init_loss = 1.0
            tgt.collab.closure_loop_ts = float(kf_ts[0])
            fired["ts"] = float(kf_ts[0])
        return orig(kf_id, rgb, cur, kf_poses, kf_ts)

    tgt.collab.on_keyframe_mapped = hook
    fleet.run_mapping_only()
    assert fired, "closure injection never armed"

    # ground truth: ONE application of T to the raw (dataset) trajectory
    raw = np.stack([np.asarray(tgt.dataset[int(t)]["c2w"])
                    for t in tgt.mapped_timestamps]).astype(np.float32)
    expect = np.asarray(fusion.deform_trajectory(
        jnp.asarray(raw), jnp.asarray(0), jnp.asarray(T),
        decay_sigma=10.0, min_weight=0.1))
    got = np.asarray(tgt.collab.aligned_poses_c2w)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=1e-5)
    # and the fold-back put the aligned poses (not raw) into the stack
    n = len(tgt.mapped_timestamps)
    np.testing.assert_allclose(np.asarray(tgt.map_state.kf_poses[:n]),
                               expect, atol=1e-5)
    # while kf_poses_raw still returns the tracker-world trajectory
    np.testing.assert_allclose(tgt.kf_poses_raw(n), raw, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("row_sharded", [False, True])
def test_fleet_slam_matches_sequential(tmp_path, row_sharded):
    """Full SLAM through the mesh fleet (per-agent tracking + ONE sharded
    mapping super-step per round) == the sequential interleaved runner,
    numerically: same tracker trajectories, same mapping key streams, and
    map params matching to float tolerance. Parametrized over the composed
    agent x rows mode (round 4) so the run_slam/_map_pending path is
    equality-tested with row sharding engaged too."""
    from mneslam_tpu.agents.runner import MultiAgentRunner
    from tests.test_slam_full import gt_tracker_poses, make_oracle

    H, W = 64, 96

    def slam_cfg(exp):
        return make_config({
            "mode": "slam",
            "data": {"output": str(tmp_path), "exp_name": exp},
            "mapping": {
                "bound": [[-2.2, 2.2]] * 3, "marching_cubes_bound": [[-2.1, 2.1]] * 3,
                "sample": 128, "min_pixels_cur": 32, "first_iters": 20, "iters": 4,
                "keyframe_every": 4, "global_ba_every": 1000,
            },
            "planes_res": {"coarse": 0.44, "fine": 0.22, "bound_dividable": 0.22},
            "cam": {"H": H, "W": W, "fx": 60.0, "fy": 60.0, "cx": 47.5, "cy": 31.5,
                    "H_out": H, "W_out": W, "near": 0.0, "far": 8.0},
            "training": {"n_range_d": 9, "n_samples_d": 8, "range_d": 0.25,
                         "trunc": 0.15},
            "model": {"c_dim": 16, "input_ch": 32, "input_ch_pos": 48,
                      "truncation": 0.15},
            "meshing": {"resolution": 0.3},
            "tracking": {
                "buffer": 24, "warmup": 4, "upsample": False,
                "motion_filter": {"thresh": -1.0, "batch": 4},
                "frontend": {"enable_loop": False, "keyframe_thresh": -1.0,
                             "window": 8, "radius": 1, "max_factors": 24,
                             "nms": 0, "thresh": 25.0},
                "backend": {"thresh": 25.0, "radius": 1, "nms": 1,
                            "loop_window": 8, "loop_thresh": 25.0,
                            "loop_radius": 1, "loop_nms": 1},
            },
            "loop_detection": {"enabled": False},
        })

    intr8 = jnp.asarray([60.0 / 8, 60.0 / 8, 47.5 / 8, 31.5 / 8])

    def build(exp):
        cfg = slam_cfg(exp)
        ds = SyntheticBoxDataset(cfg, num_frames=14)
        agents = []
        for rank, (lo, hi) in enumerate([(0, 10), (4, 14)]):
            sl = Slice(ds, lo, hi)
            gt_table = gt_tracker_poses(sl)
            update_fn, agg_fn = make_oracle(gt_table, intr8)
            agents.append(MNESLAM(copy.deepcopy(cfg), sl, rank=rank,
                                  world_size=2, update_fn=update_fn,
                                  agg_fn=agg_fn))
        return agents

    seq_agents = build("seqslam")
    MultiAgentRunner(seq_agents)  # installs collab hooks
    alive = [True, True]
    while any(alive):
        alive = [a.slam_step() if ok else False
                 for a, ok in zip(seq_agents, alive)]

    mesh_agents = build("meshslam" + ("row" if row_sharded else ""))
    if row_sharded:
        for a in mesh_agents:
            a.config["mapping"]["shard_plane_rows"] = True
    fleet = MeshAgentFleet(mesh_agents)
    assert fleet.row_sharded == row_sharded
    al = [True, True]
    while any(al):
        al = [a.track_step() if ok else False
              for a, ok in zip(mesh_agents, al)]
        fleet._map_pending()
        for a in mesh_agents:
            a.maybe_global_ba()
    fleet._map_pending()

    for a_seq, a_mesh in zip(seq_agents, mesh_agents):
        assert a_seq.tracker.counter == a_mesh.tracker.counter
        assert a_seq.mapped_timestamps == a_mesh.mapped_timestamps
        for ls, lm in zip(jax.tree.leaves(a_seq.map_state.params),
                          jax.tree.leaves(a_mesh.map_state.params)):
            np.testing.assert_allclose(np.asarray(lm), np.asarray(ls),
                                       atol=3e-4, rtol=2e-3)


def test_mesh_comms_descriptor_roundtrip():
    mesh = pmesh.make_mesh(2)
    comms = MeshComms(mesh, n_agents=2, desc_cap=4)
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((3, 16)).astype(np.float32)
    comms.add_descriptor({"descriptor": vecs[0], "kf_id": 0, "agent_id": 0})
    comms.add_descriptor({"descriptor": vecs[1], "kf_id": 2, "agent_id": 1})
    comms.add_descriptor({"descriptor": vecs[2], "kf_id": 4, "agent_id": 0})
    db = comms.descriptors()
    assert len(db) == 3
    by_key = {(e["agent_id"], e["kf_id"]): e["descriptor"] for e in db}
    np.testing.assert_allclose(by_key[(0, 0)], vecs[0], atol=1e-6)
    np.testing.assert_allclose(by_key[(1, 2)], vecs[1], atol=1e-6)
    np.testing.assert_allclose(by_key[(0, 4)], vecs[2], atol=1e-6)


def test_fleet_overrides_row_sharded_mapper_no_row_group(tmp_path):
    """When the fleet mesh has no spare devices for a per-agent row group
    (devices == agents), mapping.shard_plane_rows cannot compose — the
    fleet must fall back to a plain-mapper clone, not crash."""
    cfg = fleet_cfg(tmp_path, exp="rows")
    cfg["mapping"]["shard_plane_rows"] = True
    agents = make_agents(cfg, tmp_path, "rows")
    assert agents[0].mapper.shard_rows            # per-agent knob engaged
    fleet = MeshAgentFleet(agents,
                           mesh=pmesh.make_mesh(2, devices=jax.devices()[:2]))
    assert not fleet.row_sharded
    assert not getattr(fleet.mapper, "shard_rows", False)
    logs = fleet.run_mapping_only()
    assert all(np.isfinite(m["loss"]) for log in logs for m in log)


@pytest.mark.slow
def test_fleet_row_sharded_matches_sequential(tmp_path):
    """The composed agent x rows fleet (2 agents x 4-device row groups on
    the 8-device mesh; `make_fleet_super_step_row_sharded`) matches the
    sequential runner numerically: each agent's per-device program is the
    single-agent row-sharded mapper program with collectives confined to
    its own 'ray' group."""
    from mneslam_tpu.agents.runner import MultiAgentRunner

    assert len(jax.devices()) >= 8
    cfg = fleet_cfg(tmp_path, "seqrow", loop=False)

    seq_agents = make_agents(cfg, tmp_path, "seqrow")
    runner = MultiAgentRunner(seq_agents)
    seq_metrics = runner.run_mapping_only()

    cfg2 = fleet_cfg(tmp_path, "meshrow", loop=False)
    cfg2["mapping"]["shard_plane_rows"] = True
    mesh_agents = make_agents(cfg2, tmp_path, "meshrow")
    fleet = MeshAgentFleet(mesh_agents)
    assert fleet.row_sharded
    assert fleet.mapper.shard_rows and fleet.mapper.shard_axes == ("ray",)
    assert fleet.mesh.shape["agent"] == 2 and fleet.mesh.shape["ray"] == 4
    fleet_metrics = fleet.run_mapping_only()

    for seq_log, fl_log in zip(seq_metrics, fleet_metrics):
        assert len(seq_log) == len(fl_log)
        for ms, mf in zip(seq_log, fl_log):
            assert abs(ms["loss"] - mf["loss"]) < 5e-3, (ms, mf)

    for a_seq, a_mesh in zip(seq_agents, mesh_agents):
        for (path, lm), ls in zip(
                jax.tree_util.tree_flatten_with_path(
                    a_mesh.map_state.params)[0],
                jax.tree.leaves(a_seq.map_state.params)):
            np.testing.assert_allclose(
                np.asarray(lm), np.asarray(ls), atol=2e-4, rtol=1e-3,
                err_msg=jax.tree_util.keystr(path))
