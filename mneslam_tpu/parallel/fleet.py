"""Mesh-sliced multi-agent execution: agents ARE device-mesh slices.

This is the runner-level integration of `parallel/mesh.py` (SURVEY.md §5.8):
instead of round-robining agents through per-agent jitted calls with host
exchange (`agents/runner.py`), the per-agent map states are STACKED on the
mesh's `agent` axis and one sharded super-step maps every agent's keyframe
concurrently — the TPU replacement for the reference's process-per-GPU
concurrency (`multi_agents.py:31-49`). Exchange rides the mesh instead of
Manager lists / checkpoint files (`mp_slam/mapper.py:565-592,708-726`):

  * descriptor DB     — agent-sharded [n_agents, cap, D] device array,
                        replicated on demand by a real `lax.all_gather`;
  * map checkpoints   — the live stacked params; a peer's map is a
                        cross-slice fetch (`fetch_agent_slice`), never a
                        host copy;
  * keyframe poses    — host metadata (tiny; the reference ships these as
                        .npy files).

Numerics match the sequential runner: the super-step is `vmap` of exactly
`Mapper.add_keyframe` + `Mapper.optimize` with per-agent key streams
mirroring `MNESLAM._map_keyframe` (tested in tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.comms import Comms
from ..agents.runner import AgentCollaboration
from . import mesh as pmesh


def tree_stack(trees):
    """Stack a list of identically-shaped pytrees on a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def tree_index(tree, i: int):
    """Lazy per-agent view of a stacked pytree (one slice per leaf)."""
    return jax.tree.map(lambda x: x[i], tree)


@partial(jax.jit, donate_argnums=0, static_argnames=())
def _desc_write(db: jax.Array, rank, slot, vec: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(db, vec[None, None, :], (rank, slot, 0))


@partial(jax.jit, donate_argnums=0)
def _tree_set_slice(stacked, i, value):
    return jax.tree.map(lambda s, v: jax.lax.dynamic_update_index_in_dim(
        s, v.astype(s.dtype), i, axis=0), stacked, value)


class MeshComms(Comms):
    """Comms whose descriptor DB lives agent-sharded on the mesh and whose
    "checkpoints" are the fleet's live stacked params (no copies)."""

    def __init__(self, mesh, n_agents: int, desc_cap: int = 1024):
        self.mesh = mesh
        self.n_agents = n_agents
        self.desc_cap = desc_cap
        self._db: Optional[jax.Array] = None      # [n_agents, cap, D]
        self._kf_ids: List[List[int]] = [[] for _ in range(n_agents)]
        self._kf: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._ckpt_meta: Dict[int, Dict] = {}
        self.fleet: Optional["MeshAgentFleet"] = None  # set by the fleet

    def add_descriptor(self, entry: Dict) -> None:
        vec = jnp.asarray(entry["descriptor"], jnp.float32).reshape(-1)
        if self._db is None:
            self._db = pmesh.shard_agent_stack(
                jnp.zeros((self.n_agents, self.desc_cap, vec.shape[0])), self.mesh)
        r = int(entry["agent_id"])
        slot = len(self._kf_ids[r])
        if slot >= self.desc_cap:
            raise RuntimeError(f"descriptor DB full for agent {r} "
                               f"(cap {self.desc_cap})")
        self._db = _desc_write(self._db, jnp.asarray(r), jnp.asarray(slot), vec)
        self._kf_ids[r].append(int(entry["kf_id"]))

    def descriptors(self) -> List[Dict]:
        if self._db is None:
            return []
        # fetch only the filled prefix, padded to the next power of two:
        # the fill counts are host-known, a full-capacity fetch pulls
        # cap*D floats per agent through the ~10-20 MB/s tunnel per
        # keyframe, and pow2 padding keeps the slice-shape count (= eager
        # remote compiles) logarithmic over a run
        n_max = max(len(ids) for ids in self._kf_ids)
        if n_max == 0:
            return []
        pad = min(self.desc_cap, 1 << (n_max - 1).bit_length() if n_max > 1
                  else 1)
        gathered = pmesh.all_gather_descriptors(self._db, self.mesh)
        full = np.asarray(gathered[:, :pad])
        out = []
        for r in range(self.n_agents):
            for i, kf in enumerate(self._kf_ids[r]):
                out.append({"descriptor": full[r, i], "kf_id": kf, "agent_id": r})
        return out

    def publish_keyframes(self, rank, poses, timestamps):
        self._kf[rank] = (np.asarray(poses).copy(), np.asarray(timestamps).copy())

    def get_keyframes(self, rank):
        return self._kf.get(rank)

    def publish_checkpoint(self, rank, params, meta):
        # params already live in the fleet's stacked state — only the
        # metadata (bounds) needs recording
        self._ckpt_meta[rank] = dict(meta)

    def get_checkpoint(self, rank):
        if self.fleet is None or rank not in self._ckpt_meta:
            return None
        params = pmesh.fetch_agent_slice(self.fleet.state.params, rank)
        return params, self._ckpt_meta[rank]


def make_fleet_super_step(mapper):
    """One sharded program mapping every agent's pending keyframe: vmapped
    `add_keyframe` + `optimize` over the stacked state (agent axis). An
    agent with valid=False keeps its state unchanged (ragged datasets)."""

    @partial(jax.jit, static_argnames=("iters",))
    def step(state, frame_ids, frames, poses, k1s, k2s, valids, iters):
        def one(st, fid, frame, pose, k1, k2, valid):
            st1 = mapper.add_keyframe(st, fid, frame, pose, k1)
            st2, metrics = mapper.optimize(st1, frame, pose, k2, iters=iters)
            st_out = jax.tree.map(lambda a, b: jnp.where(valid, a, b), st2, st)
            return st_out, metrics

        return jax.vmap(one)(state, frame_ids, frames, poses, k1s, k2s, valids)

    return step


def make_fleet_super_step_row_sharded(mapper):
    """Composed agent x rows fleet step (round 4): ONE shard_map over the
    2D ('agent', 'ray') mesh. Each agent owns one 'ray' device group;
    inside the group the mapper's row-sharded per-device program
    (`Mapper._make_row_body` — the exact program the single-agent
    multi-chip deployment runs) executes with collectives over 'ray'
    only, while the 'agent' axis is pure data parallelism (zero
    cross-agent ICI traffic). So a 2-agent v5e-8 deployment gives every
    agent 4-way ZeRO-style row sharding in one compiled step. Per-agent
    numerics match `Mapper.add_keyframe` + `Mapper.optimize`
    (tests/test_fleet.py::test_fleet_row_sharded_matches_sequential)."""
    from jax.sharding import PartitionSpec as P

    from ..mapping import keyframe as kf_lib

    mesh = mapper.mesh
    stack_ax = mapper._stack_axes
    shard_ax = mapper.shard_axes
    filter_depth = bool(mapper.config["mapping"].get("filter_depth", False))
    depth_trunc = float(mapper.config["cam"]["depth_trunc"])

    @partial(jax.jit, static_argnames=("iters",))
    def step(state, frame_ids, frames, poses, k1s, k2s, valids, iters):
        H, W = (int(s) for s in frames["depth"].shape[1:])
        params0 = mapper._shard_plane_state_stacked(state.params)
        opt0 = mapper._shard_plane_state_stacked(state.opt_state)

        def spec_of(tree):
            return jax.tree_util.tree_map_with_path(
                lambda p, l: (P(stack_ax, shard_ax)
                              if mapper._plane_leaf_addr(p) is not None
                              and hasattr(l, "ndim") and l.ndim == 3
                              else P(stack_ax)), tree)

        row_body = mapper._make_row_body(H, W, iters, use_cur=True)

        def body(params, opt, db, kf_poses, frame, pose, fid, k1, k2, valid):
            # every operand carries a leading agent-block axis of size 1
            sq = lambda t: jax.tree.map(lambda x: x[0], t)
            params_l, opt_l = sq(params), sq(opt)
            db_l, kfp_l = sq(db), sq(kf_poses)
            frame_l, pose_l = sq(frame), sq(pose)

            # Mapper.add_keyframe semantics (pose written at the pre-add
            # count slot), replicated across the agent's row group
            db2 = kf_lib.add_keyframe(
                db_l, k1[0], fid[0], frame_l["direction"], frame_l["rgb"],
                frame_l["depth"], filter_depth=filter_depth,
                depth_trunc=depth_trunc)
            kfp2 = jax.lax.dynamic_update_index_in_dim(
                kfp_l, pose_l, db_l.count, axis=0)

            p2, o2, metrics = row_body(
                params_l, opt_l, db2, kfp2,
                frame_l["direction"].reshape(-1, 3),
                frame_l["rgb"].reshape(-1, 3),
                frame_l["depth"].reshape(-1), pose_l, k2[0])

            sel = lambda a, b: jnp.where(valid[0], a, b)
            p2 = jax.tree.map(sel, p2, params_l)
            o2 = jax.tree.map(sel, o2, opt_l)
            db2 = jax.tree.map(sel, db2, db_l)
            kfp2 = sel(kfp2, kfp_l)
            ex = lambda t: jax.tree.map(lambda x: x[None], t)
            return ex(p2), ex(o2), ex(db2), ex(kfp2), ex(metrics)

        smap = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec_of(params0), spec_of(opt0), P(stack_ax),
                      P(stack_ax), P(stack_ax), P(stack_ax), P(stack_ax),
                      P(stack_ax), P(stack_ax), P(stack_ax)),
            out_specs=(spec_of(params0), spec_of(opt0), P(stack_ax),
                       P(stack_ax), P(stack_ax)),
            check_vma=False)
        p, o, db, kfp, metrics = smap(
            params0, opt0, state.db, state.kf_poses, frames, poses,
            frame_ids, k1s, k2s, valids)
        p = mapper._unshard_plane_state_stacked(p)
        o = mapper._unshard_plane_state_stacked(o)
        return state._replace(params=p, opt_state=o, db=db,
                              kf_poses=kfp), metrics

    return step


class MeshAgentFleet:
    """Multi-agent mapping runner where the per-agent map states are one
    sharded stack and every round's keyframe optimization is ONE pjit call
    over the whole mesh. Requires all agents to share scene/mapper shapes
    (same bound/resolution config — per-agent `loop_bound` sub-bounds still
    apply to fusion logic, which is host-side)."""

    def __init__(self, agents: List, mesh=None, descriptor_fn=None,
                 comms: Optional[MeshComms] = None):
        self.agents = agents
        n = len(agents)
        self.mesh = mesh if mesh is not None else pmesh.make_mesh(n)
        self.mapper = agents[0].mapper
        want_rows = (getattr(self.mapper, "shard_rows", False)
                     or bool(agents[0].config["mapping"]
                             .get("shard_plane_rows", False)))
        n_rows = int(self.mesh.shape.get("ray", 1))
        self.row_sharded = want_rows and n_rows > 1
        if self.row_sharded and int(self.mesh.shape["agent"]) != n:
            # the composed super-step's shard_map body squeezes an
            # agent-block of exactly 1 (sq/ex in
            # make_fleet_super_step_row_sharded) — a 2-agent block would
            # silently drop its second agent, and an uneven split fails at
            # trace time with an opaque error. make_mesh degrades
            # gracefully for non-dividing agent counts, so guard here.
            raise ValueError(
                f"row-sharded fleet needs exactly one agent per 'agent' "
                f"slice: {n} agents on a mesh with agent axis "
                f"{int(self.mesh.shape['agent'])} "
                f"(pass a mesh with agent={n}, or disable "
                f"mapping.shard_plane_rows)")
        if self.row_sharded:
            # compose: each agent's 'ray' device group runs the row-sharded
            # mapper program (collectives over 'ray' only), agents ride the
            # 'agent' axis — see make_fleet_super_step_row_sharded
            from ..mapping.mapper import Mapper

            self.mapper = Mapper(self.mapper.config, self.mapper.scene,
                                 num_kf=self.mapper.num_kf,
                                 rays_per_kf=self.mapper.rays_per_kf,
                                 mesh=self.mesh, shard_plane_rows=True,
                                 shard_axes=("ray",))
        elif getattr(self.mapper, "shard_rows", False) or self.mapper.mesh is not None:
            # a single-agent mapper mesh cannot compose with the fleet's
            # agent sharding when no row group is available (devices ==
            # agents) — run the fleet with a plain mapper.
            from ..mapping.mapper import Mapper

            print("[fleet] mapper mesh ignored under the mesh fleet "
                  "(no spare devices for a per-agent row group)")
            self.mapper = Mapper(self.mapper.config, self.mapper.scene,
                                 num_kf=self.mapper.num_kf,
                                 rays_per_kf=self.mapper.rays_per_kf)
        shapes = [jax.tree.map(jnp.shape, a.map_state) for a in agents]
        if any(s != shapes[0] for s in shapes[1:]):
            raise ValueError("mesh fleet requires identical map-state shapes "
                             "across agents (shared bound/resolution config)")
        self.state = pmesh.shard_agent_stack(
            tree_stack([a.map_state for a in agents]), self.mesh)
        # descriptor capacity: one slot per possible keyframe (full-SLAM
        # admission can keyframe every frame), or the config override —
        # the sequential InMemoryComms DB is unbounded, so a mid-run
        # "DB full" RuntimeError must not be reachable at any dataset
        # length (static shape: the sharded DB allocates lazily at the
        # first descriptor's D)
        cap = int(agents[0].config.get("loop_detection", {})
                  .get("desc_cap", 0))
        if cap <= 0:
            cap = max(len(a.dataset) for a in agents) + 1
        self.comms = comms or MeshComms(self.mesh, n, desc_cap=cap)
        self.comms.fleet = self
        self.collabs = [
            AgentCollaboration(a, self.comms, descriptor_fn=descriptor_fn)
            for a in agents
        ]
        for a, c in zip(agents, self.collabs):
            a.collab = c
        self._super_step = (make_fleet_super_step_row_sharded(self.mapper)
                            if self.row_sharded
                            else make_fleet_super_step(self.mapper))
        # padding (frame, pose) per agent for rounds where that agent has
        # nothing to map (valid=False): the content never changes, so the
        # host dataset IO + several-MB device upload must not repeat per
        # round
        self._pad_frame: List = [None] * n

    def _padding_frame(self, i: int):
        if self._pad_frame[i] is None:
            self._pad_frame[i] = self.agents[i]._frame_for_mapping(0)
        return self._pad_frame[i]

    # ------------------------------------------------------------------

    def _sync_agent_views(self):
        """Point each agent's map_state at its slice of the stacked state
        (consumed by collab hooks: publish, render alignment, meshing)."""
        for i, a in enumerate(self.agents):
            a.map_state = tree_index(self.state, i)

    def _writeback(self, i: int, map_state):
        """An agent-local update (e.g. distillation) back into the stack."""
        self.state = _tree_set_slice(self.state, jnp.asarray(i), map_state)

    # ------------------------------------------------------------------

    def run_mapping_only(self):
        """Mapping-only multi-agent run (BASELINE config #1 shape): every
        round, all agents' pending keyframes are optimized in ONE sharded
        super-step; publication/loop hooks run host-side per agent after
        the step (reference flow: mp_slam/mapper.py:164-258)."""
        agents = self.agents
        max_len = max(len(a.dataset) for a in agents)
        every = int(agents[0].config["mapping"]["keyframe_every"])

        for idx in range(0, max_len, every):
            valids = [idx < len(a.dataset) for a in agents]
            if not any(valids):
                continue
            firsts = [not a.first_frame_mapped for a in agents]
            if any(firsts) and not all(f or not v for f, v in zip(firsts, valids)):
                raise RuntimeError("mesh fleet requires agents to bootstrap "
                                   "in the same round")
            first = any(f and v for f, v in zip(firsts, valids))
            iters = int(agents[0].config["mapping"]
                        ["first_iters" if first else "iters"])

            frames, poses, k1s, k2s = [], [], [], []
            for i, (a, v) in enumerate(zip(agents, valids)):
                frame, pose = (a._frame_for_mapping(idx) if v
                               else self._padding_frame(i))
                frames.append(frame)
                poses.append(pose)
                if not v:
                    k1s.append(jax.random.PRNGKey(0))
                    k2s.append(jax.random.PRNGKey(0))
                elif first:
                    # first_frame_mapping splits one key (slam.py parity)
                    k1, k2 = jax.random.split(a._next_key())
                    k1s.append(k1)
                    k2s.append(k2)
                else:
                    k1s.append(a._next_key())
                    k2s.append(a._next_key())

            self.state, metrics = self._super_step(
                self.state,
                jnp.asarray([idx] * len(agents)),
                tree_stack(frames), tree_stack(poses),
                jnp.stack(k1s), jnp.stack(k2s),
                jnp.asarray(valids),
                iters=iters,
            )
            # keep the stack pinned to the agent sharding (jit output
            # shardings are propagation-chosen otherwise)
            self.state = pmesh.shard_agent_stack(self.state, self.mesh)

            self._sync_agent_views()
            for i, (a, v) in enumerate(zip(agents, valids)):
                if not v:
                    continue
                a.first_frame_mapped = True
                # shared bookkeeping (mapped_timestamps, raw-pose history
                # growth, metrics log, publish + loop detect + closure) —
                # the same helper the run_slam path uses (_map_pending).
                # Crucially its collab hook feeds kf_poses_raw, never the
                # aligned map slots: under loop_closure.map_aligned the
                # fold-back below writes the closure-deformed poses into
                # the stack, and re-deforming those on the next publish
                # would compound the correction every round (the same
                # failure mode as the round-4 raw-pose bug, 0.18 m -> 5.1 m;
                # this path previously passed map_state.kf_poses directly).
                ov_before = getattr(a, "_aligned_kf_override", None)
                a._post_map_bookkeeping(
                    idx, np.asarray(poses[i]),
                    {k: m[i] for k, m in metrics.items()})
                # `loop_closure.map_aligned` may have overridden the
                # agent-local view's kf_poses (set_aligned_kf_poses via
                # _apply_closure) — fold that back into the stack so the
                # NEXT super-step maps against the aligned trajectory
                # (run_slam's _map_pending folds agent views per pass; this
                # path previously dropped the override silently). Gated on
                # the override OBJECT changing during this round's
                # bookkeeping (set_aligned_kf_poses always stores a fresh
                # tuple), so a round where no closure re-applied pays no
                # eager per-agent stack write (~25-30 ms dispatch/RTT).
                if (getattr(a, "_aligned_kf_override", None) is not None
                        and a._aligned_kf_override is not ov_before):
                    self.state = self.state._replace(
                        kf_poses=self.state.kf_poses.at[i].set(
                            a.map_state.kf_poses))

        self._final_fusion()
        return [a.metrics_log for a in self.agents]

    def run_slam(self):
        """Full multi-agent SLAM on the mesh: tracking stays per-agent host
        logic (its state is per-agent and cheap next to mapping), but every
        round all agents' pending keyframes are optimized in ONE sharded
        super-step — the flagship mode's dominant compute rides the mesh.
        Round-robin interleave keeps cross-agent loop closure live mid-run
        (multi_agents.py:44-49 semantics)."""
        agents = self.agents
        alive = [a.tracker is not None for a in agents]
        while any(alive):
            for i, a in enumerate(agents):
                if alive[i]:
                    alive[i] = a.track_step()
            self._map_pending()
            for a in agents:
                a.maybe_global_ba()
        self._map_pending()
        self._final_fusion()
        return [a.terminate() for a in agents]

    def _map_pending(self):
        """Map every agent's pending keyframes as sharded super-steps.
        Agents bootstrapping (first keyframe, `first_iters`) and agents in
        steady state (`iters`) run as two separately-shaped steps since the
        iteration count is static per program."""
        agents = self.agents
        cfg0 = agents[0].config["mapping"]
        while True:
            pend = [a.pending_keyframe() for a in agents]
            if not any(p is not None for p in pend):
                return
            # pending_keyframe refreshed tracker pose updates into the
            # agent-local view's kf_poses — fold them back into the stack
            for i, (a, p) in enumerate(zip(agents, pend)):
                if p is not None:
                    self.state = self.state._replace(
                        kf_poses=self.state.kf_poses.at[i].set(
                            a.map_state.kf_poses))
            # one group per pass: bootstrapping agents (first_iters) first,
            # then steady-state agents — iteration count is static per
            # compiled step, and group membership must be a snapshot (an
            # agent bootstrapped this pass must not also map in the other
            # group off the same stale pending entry)
            first_sel = [i for i, p in enumerate(pend) if p is not None
                         and not agents[i].first_frame_mapped]
            if first_sel:
                sel, first_group = first_sel, True
            else:
                sel = [i for i, p in enumerate(pend) if p is not None]
                first_group = False
            iters = int(cfg0["first_iters" if first_group else "iters"])
            valids = [i in sel for i in range(len(agents))]
            frames, poses, fids, k1s, k2s = [], [], [], [], []
            for i, a in enumerate(agents):
                if valids[i]:
                    _, frame_id, pose = pend[i]
                    frame, _ = a._frame_for_mapping(frame_id)
                    if first_group:
                        k1, k2 = jax.random.split(a._next_key())
                    else:
                        k1, k2 = a._next_key(), a._next_key()
                else:
                    frame, pose = self._padding_frame(i)
                    frame_id = 0
                    k1 = k2 = jax.random.PRNGKey(0)
                frames.append(frame)
                poses.append(pose)
                fids.append(frame_id)
                k1s.append(k1)
                k2s.append(k2)

            self.state, metrics = self._super_step(
                self.state, jnp.asarray(fids),
                tree_stack(frames), tree_stack(poses),
                jnp.stack(k1s), jnp.stack(k2s), jnp.asarray(valids),
                iters=iters,
            )
            self.state = pmesh.shard_agent_stack(self.state, self.mesh)
            self._sync_agent_views()
            for i in sel:
                a = agents[i]
                a.first_frame_mapped = True
                a.map_counter += 1
                a._post_map_bookkeeping(
                    fids[i], np.asarray(poses[i]),
                    {k: m[i] for k, m in metrics.items()})

    def _final_fusion(self):
        """Fusion pass (mapper.py final_run:260-264); distillation updates
        are written back into the stack."""
        for i, a in enumerate(self.agents):
            before = a.map_state
            a.collab.bound_based_fusion()
            if a.map_state is not before:
                self._writeback(i, a.map_state)
                self._sync_agent_views()
