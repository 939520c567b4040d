"""Agent collaboration glue + deterministic multi-agent runner.

`AgentCollaboration` gives one MNESLAM agent its multi-agent behaviors
(reference: `mp_slam/mapper.py:316-726` + `mneslam_mp.py:159-186`):
publishing keyframes/checkpoints, loop detection per mapped keyframe,
render-based inter-agent pose alignment with SLERP trajectory deformation,
and bound-overlap distillation fusion.

`MultiAgentRunner` replaces the reference's process-per-agent spawn
(`multi_agents.py:15-62`) with a deterministic round-robin interleave of
agents inside one process — the TPU execution model where agents are slices
of one device mesh and exchange through `InMemoryComms` instead of Manager
lists and file polling (SURVEY.md §5.8). `FileComms` drops in for
multi-process runs with the reference's on-disk protocol.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene_rep import SceneRep
from . import fusion
from .comms import Comms, InMemoryComms, unpack_params
from .loop_detector import LoopDetector, find_mutual_matches
from .netvlad import make_descriptor_fn


def load_agent_bounds(config, world_size: int) -> Dict[int, np.ndarray]:
    """Per-agent bound table from the `loop_bound` section
    (mneslam_mp.py:249-286)."""
    default = np.asarray(config["mapping"]["bound"], float)
    if world_size == 1:
        return {0: default}
    lb = config.get("loop_bound") or {}
    return {
        r: np.asarray(lb.get(f"bound_{r}", default), float)
        for r in range(world_size)
    }


class AgentCollaboration:
    def __init__(self, slam, comms: Comms, descriptor_fn=None):
        self.slam = slam
        self.comms = comms
        cfg = slam.config
        if descriptor_fn is None:
            descriptor_fn = make_descriptor_fn(cfg)
        self.loop_detector = LoopDetector(cfg, comms, descriptor_fn)
        # the reference's top-level enable_loop_detect key (§5.6) wins
        self.enable_loop_detect = bool(cfg.get(
            "enable_loop_detect",
            cfg.get("loop_detection", {}).get("enabled", True)))
        self.all_agent_bounds = load_agent_bounds(cfg, slam.world_size)
        self.fused_agents: set[int] = set()
        self.fused_frame_ids: set = set()
        self.aligned_poses_c2w: Optional[jax.Array] = None
        # accepted closure: the best (lowest render-loss) inter-agent
        # transform seen so far, re-applied to the growing raw trajectory
        # on every publish (the reference applies EVERY closure's transform
        # unconditionally, mapper.py:417-489 — one badly-converged late
        # alignment then wrecks the whole exported trajectory)
        self.closure_relative: Optional[np.ndarray] = None
        self.closure_loss: float = float("inf")
        self.closure_init_loss: float = float("inf")  # init loss at accept
        self.closure_loop_ts: float = -1.0
        self._foreign_scenes: Dict[int, SceneRep] = {}

    # ------------------------------------------------------------------
    # publication (mapper.py:565-592, mneslam_mp.py:294-315)
    # ------------------------------------------------------------------

    def publish(self, kf_poses_c2w: np.ndarray, kf_timestamps: np.ndarray):
        slam = self.slam
        self._apply_closure(kf_poses_c2w, kf_timestamps)
        if self.aligned_poses_c2w is not None:
            kf_poses_c2w = np.asarray(self.aligned_poses_c2w)
        self.comms.publish_keyframes(slam.rank, kf_poses_c2w, kf_timestamps)
        self.comms.publish_checkpoint(
            slam.rank, slam.map_state.params,
            {"bound": np.asarray(slam.scene.bounding_box)},
        )

    # ------------------------------------------------------------------

    def _foreign_scene(self, rank: int, bound: np.ndarray) -> SceneRep:
        if rank not in self._foreign_scenes:
            import copy

            cfg = copy.deepcopy(self.slam.config)
            cfg["mapping"]["bound"] = np.asarray(bound).tolist()
            self._foreign_scenes[rank] = SceneRep(cfg)
        return self._foreign_scenes[rank]

    def _load_foreign(self, rank: int):
        """(scene, params) of another agent from its latest checkpoint
        (mapper.py:708-726)."""
        ck = self.comms.get_checkpoint(rank)
        if ck is None:
            return None, None
        params_or_flat, meta = ck
        bound = np.asarray(meta.get("bound", self.all_agent_bounds[rank]))
        scene = self._foreign_scene(rank, bound)
        if isinstance(params_or_flat, dict) and any("/" in k for k in params_or_flat):
            template = scene.init_params(jax.random.PRNGKey(0))
            params = unpack_params(template, params_or_flat)
        else:
            params = params_or_flat
        return scene, params

    # ------------------------------------------------------------------
    # loop closure (mapper.py:316-489)
    # ------------------------------------------------------------------

    def on_keyframe_mapped(self, kf_id: int, frame_rgb, cur_c2w,
                           kf_poses_c2w: np.ndarray, kf_timestamps: np.ndarray):
        """Post-mapping hook: publish, detect, maybe close a loop."""
        self.publish(kf_poses_c2w, kf_timestamps)
        if not self.enable_loop_detect:
            return None
        info = self.loop_detector.detect_and_add(kf_id, self.slam.rank, frame_rgb)
        # same-agent matches also route through render-based alignment (the
        # detector's min_time_diff already filters recent frames) — the
        # reference handles both cases in handle_loop_closure
        if info is not None:
            self.handle_loop_closure(info, kf_id, cur_c2w,
                                     kf_poses_c2w, kf_timestamps)
        return info

    def handle_loop_closure(self, info: Dict, current_map_id: int, cur_c2w,
                            kf_poses_c2w: np.ndarray, kf_timestamps: np.ndarray):
        slam = self.slam
        other = int(info["match_agent_id"])
        if other != slam.rank:
            self.fused_agents.add(other)
        loop_id = (other, current_map_id)
        if loop_id in self.fused_frame_ids:
            return
        self.fused_frame_ids.add(loop_id)

        other_kfs = self.comms.get_keyframes(other)
        if other_kfs is None:
            return
        o_poses, o_ts = other_kfs
        hits = np.nonzero(o_ts == info["match_kf_id"])[0]
        if len(hits) == 0:
            return
        other_c2w = jnp.asarray(o_poses[int(hits[0])])

        # base/target by rank order (mapper.py:339-356)
        if slam.rank < other:
            base_c2w, target_c2w = jnp.asarray(cur_c2w), other_c2w
            target_is_self = False
        else:
            base_c2w, target_c2w = other_c2w, jnp.asarray(cur_c2w)
            target_is_self = True

        f_scene, f_params = self._load_foreign(other)
        if f_params is None:
            return
        scene_for_base = slam.scene if slam.rank < other else f_scene
        params_for_base = slam.map_state.params if slam.rank < other else f_params
        scene_for_target = f_scene if slam.rank < other else slam.scene
        params_for_target = f_params if slam.rank < other else slam.map_state.params

        # sampled camera rays (mapper.py:371-382)
        cfg = slam.config
        sample = int(cfg["mapping"]["sample"])
        rays_d_cam = np.asarray(slam.dataset[0]["direction"]).reshape(-1, 3)
        idx = np.random.default_rng(current_map_id).integers(0, len(rays_d_cam), sample)
        rays = jnp.asarray(rays_d_cam[idx])

        best_c2w, best_loss, init_loss = fusion.align_pose_by_render(
            scene_for_base, params_for_base, scene_for_target, params_for_target,
            base_c2w, target_c2w, rays, jax.random.PRNGKey(current_map_id),
            iters=int(cfg["mapping"]["loop_iters"]),
            lr_rot=float(cfg["mapping"]["lr_rot"]),
            lr_trans=float(cfg["mapping"]["lr_trans"]),
            rgb_weight=float(cfg["training"]["rgb_weight"]),
            depth_weight=float(cfg["training"]["depth_weight"]),
            rot_rep=cfg["training"]["rot_rep"],
        )
        relative = jnp.asarray(base_c2w) @ jnp.linalg.inv(best_c2w)

        if target_is_self:
            # each closure re-estimates the FULL inter-agent transform
            # against the agent's own-world (tracker) pose, so it deforms
            # the raw trajectory — never the previous aligned one, which
            # would compound corrections across repeated closures (the
            # reference's mapper.py:417-489 deforms its latest aligned
            # poses, divergent under repeated loop hits).
            #
            # Acceptance gate (loop_closure.mode, default "gated" — a
            # measured deviation from the reference): a closure only
            # counts if the render alignment CONVERGED — best loss under
            # an absolute bar or clearly below the init-pose loss (a
            # spurious descriptor match leaves it ~init). Among accepted
            # closures the lowest loss wins; the stored transform is
            # re-applied to the growing raw trajectory on every publish.
            # mode: "reference" reproduces the reference's apply-every-
            # closure behavior (mapper.py:417-489: each closure's
            # transform replaces the previous unconditionally) for A/B
            # parity runs — in the round-3 two-agent eval that behavior
            # left 11.2 m keyframe error after three non-converged late
            # alignments, vs 0.056 m gated (BASELINE.md).
            lc = cfg.get("loop_closure", {})
            mode = str(lc.get("mode", "gated"))
            best, init = float(best_loss), float(init_loss)
            if mode == "reference":
                accepted, take = True, True
            else:
                accepted = (
                    best <= float(lc.get("accept_loss", 0.05))
                    or best <= float(lc.get("accept_ratio", 0.25)) * init
                )
                take = accepted and best < self.closure_loss
            if take:
                self.closure_relative = np.asarray(relative)
                self.closure_loss = best
                self.closure_init_loss = init
                self.closure_loop_ts = float(current_map_id)
                print(f"[agent {slam.rank}] loop with agent {other}: "
                      f"accepted closure (loss {best:.5f}, init {init:.5f})")
            elif not accepted:
                print(f"[agent {slam.rank}] loop with agent {other}: "
                      f"rejected closure (loss {best:.5f}, init {init:.5f})")
            self._apply_closure(kf_poses_c2w, kf_timestamps)
        return relative

    def _apply_closure(self, kf_poses_c2w: np.ndarray, kf_timestamps: np.ndarray):
        """Deform the current raw keyframe trajectory with the stored best
        closure transform (SLERP decay about the closure keyframe)."""
        if self.closure_relative is None:
            return
        poses = jnp.asarray(kf_poses_c2w)
        hits = np.nonzero(
            np.asarray(kf_timestamps)[: len(poses)] == self.closure_loop_ts)[0]
        loop_idx = int(hits[0]) if len(hits) else len(poses) - 1
        lc = self.slam.config.get("loop_closure", {})
        self.aligned_poses_c2w = fusion.deform_trajectory(
            poses, jnp.asarray(loop_idx), jnp.asarray(self.closure_relative),
            decay_sigma=float(lc.get("pose_decay_sigma", 10.0)),
            min_weight=float(lc.get("pose_decay_min_weight", 0.1)),
        )
        if bool(lc.get("map_aligned", False)):
            # reference-faithful mode (mp_slam/mapper.py:193-198): the
            # agent's own map consumes the aligned trajectory too
            self.slam.set_aligned_kf_poses(
                np.asarray(kf_timestamps)[: len(poses)],
                np.asarray(self.aligned_poses_c2w))

    # ------------------------------------------------------------------
    # bound-overlap fusion (mapper.py:646-706)
    # ------------------------------------------------------------------

    def bound_based_fusion(self):
        slam = self.slam
        cfg = slam.config
        if not cfg.get("distillation", {}).get("use_bound_overlap", True):
            return
        if slam.world_size <= 1:
            return
        min_matches = cfg.get("loop_detection", {}).get("min_matches_for_fusion", 3)

        candidates = self.fused_agents or (
            set(range(slam.world_size)) - {slam.rank}
        )
        for other in sorted(candidates):
            if other == slam.rank:
                continue
            overlap = fusion.compute_overlap_bound(
                self.all_agent_bounds[slam.rank],
                self.all_agent_bounds.get(other, self.all_agent_bounds[slam.rank]),
            )
            if overlap is None:
                continue
            local_kf = self.comms.get_keyframes(slam.rank)
            foreign_kf = self.comms.get_keyframes(other)
            if local_kf is None or foreign_kf is None:
                continue
            local_in = fusion.keyframes_in_bound(*local_kf, overlap)
            foreign_in = fusion.keyframes_in_bound(*foreign_kf, overlap)
            if not local_in or not foreign_in:
                continue

            db = self.comms.descriptors()
            l_ids = {k["kf_id"] for k in local_in}
            f_ids = {k["kf_id"] for k in foreign_in}
            l_desc = [e for e in db if e["agent_id"] == slam.rank and e["kf_id"] in l_ids]
            f_desc = [e for e in db if e["agent_id"] == other and e["kf_id"] in f_ids]
            matches = find_mutual_matches(
                l_desc, f_desc, self.loop_detector.sim_threshold)
            if len(matches) <= min_matches:
                continue

            fids = [m["foreign_kf_id"] for m in matches]
            expand = [k for k in foreign_in if min(fids) <= k["kf_id"] <= max(fids)]
            if not expand:
                continue

            f_scene, f_params = self._load_foreign(other)
            if f_params is None:
                continue
            foreign_poses = jnp.stack([jnp.asarray(k["pose"]) for k in expand])
            rays_d_cam = jnp.asarray(
                np.asarray(slam.dataset[0]["direction"]).reshape(-1, 3))
            rays_per_kf = max(int(cfg["mapping"]["sample"]) // len(expand),
                              int(cfg["mapping"]["min_pixels_cur"]))

            params, opt_state, loss = fusion.distill(
                f_scene, f_params, slam.scene, slam.mapper,
                slam.map_state.params, slam.map_state.opt_state,
                foreign_poses, rays_d_cam, jax.random.PRNGKey(17 + other),
                iters=int(cfg["mapping"]["distill_iters"]),
                rays_per_kf=rays_per_kf,
            )
            slam.map_state = slam.map_state._replace(params=params, opt_state=opt_state)
            print(f"[agent {slam.rank}] distilled from agent {other}: "
                  f"{len(expand)} kfs, final loss {float(loss):.4f}")
            self._save_fused_mesh()

    def _save_fused_mesh(self):
        """Post-distillation fused mesh (mp_slam/mapper.py:644)."""
        import os

        from ..mapping.mesher import extract_mesh

        slam = self.slam
        path = os.path.join(slam.out_dir, "mesh", "fused_mesh.ply")
        try:
            extract_mesh(slam.scene, slam.map_state.params, slam.config,
                         save_path=path)
        except Exception as e:  # meshing must not kill the run
            print(f"[agent {slam.rank}] fused meshing failed: {e}")


class MultiAgentRunner:
    """Deterministic in-process multi-agent execution (multi_agents.py
    equivalent). Agents advance round-robin, one dataset frame at a time."""

    def __init__(self, agents: List, comms: Optional[Comms] = None,
                 descriptor_fn=None):
        self.agents = agents
        self.comms = comms or InMemoryComms()
        self.collabs = [
            AgentCollaboration(a, self.comms, descriptor_fn=descriptor_fn)
            for a in agents
        ]
        for a, c in zip(agents, self.collabs):
            a.collab = c

    def run_mapping_only(self):
        """Round-robin mapping-only multi-agent run with fusion at the end."""
        max_len = max(len(a.dataset) for a in self.agents)
        for idx in range(0, max_len):
            for a in self.agents:
                if idx >= len(a.dataset) or idx % int(a.config["mapping"]["keyframe_every"]) != 0:
                    continue
                frame, pose = a._frame_for_mapping(idx)
                # _map_keyframe fires a.collab.on_keyframe_mapped (publish +
                # loop detection + closure) via the agent's collab hook
                a._map_keyframe(idx, pose, first=not a.first_frame_mapped)
        # final fusion pass (mapper.py final_run:260-264)
        for a in self.agents:
            a.collab.bound_based_fusion()
        return [a.metrics_log for a in self.agents]

    def run_slam(self):
        """Online interleaved multi-agent SLAM.

        The reference runs agents concurrently as OS processes
        (`multi_agents.py:44-49`) so agent A can close loops against agent
        B's map while both are mid-trajectory. Here that concurrency is a
        deterministic round-robin: every live agent advances one
        motion-filter batch (`MNESLAM.slam_step`) per round, so all agents
        publish keyframes/descriptors at the same cadence and cross-agent
        loop closures fire mid-run in either direction. Ends with the
        one-time bound-overlap fusion (`mp_slam/mapper.py:260-264`) and
        per-agent terminate (mesh + trajectory fill + ATE)."""
        alive = [True] * len(self.agents)
        while any(alive):
            for i, a in enumerate(self.agents):
                if alive[i]:
                    alive[i] = a.slam_step()
        for a in self.agents:
            a.collab.bound_based_fusion()
        return [a.terminate() for a in self.agents]
