"""MNESLAM orchestrator: deterministic track / map / global-BA interleave.

Rebuild of the reference `MNESLAM` class (`/root/reference/mneslam_mp.py:90-753`).
The reference runs three Python threads (tracking / mapping / global BA)
racing over shared CUDA tensors with spin-wait counters; per SURVEY.md §7.1
this becomes a deterministic interleave of jitted super-steps — per input
frame run the tracker; whenever the mapper lags the tracker by more than one
keyframe, map the next pending keyframe; every `global_ba_every` keyframes
run a full-history BA. Functionally equivalent, with the reference's
documented race hazards (SURVEY.md §5.2) designed out.

Output contract matches the reference: `output/<exp>/agent_<rank>/` with
`est_poses.npy`, `key_est_poses.npy`, `key_timestamps.npy`,
`metrics_traj.txt`, `mesh/*.ply`, `final_checkpoint.npz`.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import make_config
from .eval import ate as ate_lib
from .mapping.mapper import Mapper
from .mapping.mesher import extract_mesh
from .models import droid_net
from .models.scene_rep import SceneRep
from .ops import lie
from .tracking import video as video_lib
from .tracking.tracker import Tracker
from .tracking.trajectory_filler import PoseTrajectoryFiller


_get_poses_c2w_jit = jax.jit(video_lib.get_poses_c2w, static_argnames=("n",))


@jax.jit
def _pack_refresh_fetch(poses: jax.Array, hit: jax.Array) -> jax.Array:
    """[num_kf, 4, 4] poses + [num_kf] hit mask -> one [num_kf, 17] array,
    so the raw-history maintenance below costs ONE device->host fetch per
    refresh instead of two (each fetch pays the ~25-30 ms remote-tunnel
    RTT regardless of payload; num_kf*17 floats is ~35 KB at buffer 512)."""
    return jnp.concatenate(
        [poses.reshape(poses.shape[0], 16), hit.astype(jnp.float32)[:, None]],
        axis=1)


@jax.jit
def _refresh_kf_poses_batched(
    kf_poses: jax.Array,      # [num_kf, 4, 4] mapper slot poses
    mapped_ts: jax.Array,     # [num_kf] timestamp per mapper slot, -1 = empty
    video_state,              # full tracker VideoState (static buffer)
    counter: jax.Array,       # tracked keyframe count (dynamic scalar)
    first_gt: jax.Array,      # [4, 4] world-alignment anchor
) -> Tuple[jax.Array, jax.Array]:
    """One batched timestamp-match + gather replacing the per-slot host
    loop (VERDICT r2 weak #6): all mapper slots refresh in ONE dispatch
    whose cost is independent of the keyframe count. Slots whose timestamp
    has no live tracker row (e.g. culled keyframes) keep their pose.

    Also returns the per-slot refresh `hit` mask: slots that MISSED keep a
    possibly-overridden (aligned) pose, so the raw-pose history maintained
    for `kf_poses_raw` must not take those slots from this output."""
    T = video_state.poses.shape[0]
    all_poses = video_lib.get_poses_c2w(video_state, T, first_gt=first_gt)
    live = jnp.arange(T) < counter                              # [T]
    m = (mapped_ts[:, None] == video_state.timestamps[None, :]) \
        & live[None, :] & (mapped_ts >= 0.0)[:, None]           # [K, T]
    hit = m.any(axis=1)
    row = jnp.argmax(m, axis=1)
    return jnp.where(hit[:, None, None], all_poses[row], kf_poses), hit


class MNESLAM:
    def __init__(
        self,
        config: Dict,
        dataset,
        rank: int = 0,
        world_size: int = 1,
        droid_params: Optional[Dict] = None,
        update_fn=None,
        agg_fn=None,
        comms=None,
    ):
        self.config = config
        self.dataset = dataset
        self.rank = rank
        self.world_size = world_size
        self.comms = comms
        self.mode = config.get("mode", "slam")  # "slam" | "mapping"

        out_root = config["data"].get("output", "output")
        exp = config["data"].get("exp_name", "exp")
        self.out_dir = os.path.join(out_root, exp, f"agent_{rank}")
        os.makedirs(os.path.join(self.out_dir, "mesh"), exist_ok=True)

        self.scene = SceneRep(config)
        if self.mode == "mapping":
            # GT-pose mode maps every keyframe_every-th frame
            num_kf = int(len(dataset) // config["mapping"]["keyframe_every"] + 1)
        else:
            # SLAM mode maps every keyframe the motion filter admits —
            # bounded by the tracking buffer and the sequence length
            num_kf = min(len(dataset), int(config["tracking"]["buffer"])) + 1
        # mapping.shard_plane_rows: shard the mapping optimizer (plane
        # params/Adam/gradient fold) + ray batch over ALL local devices —
        # the multi-chip mapping-throughput deployment knob (BASELINE.md
        # round-3 row-sharded measurements; single-device mesh = no-op)
        map_mesh = None
        shard_rows = bool(config["mapping"].get("shard_plane_rows", False))
        if shard_rows and len(jax.devices()) > 1:
            from .parallel import mesh as pmesh
            map_mesh = pmesh.make_mesh(1)
        self.mapper = Mapper(config, self.scene, num_kf=num_kf,
                             rays_per_kf=dataset.num_rays_to_save,
                             mesh=map_mesh,
                             shard_plane_rows=map_mesh is not None)
        self.map_state = self.mapper.init_state(jax.random.PRNGKey(42 + rank))
        self.key = jax.random.PRNGKey(1000 + rank)

        self.tracker = None
        self.traj_filler = None
        if self.mode == "slam":
            if droid_params is None:
                pretrained = config["tracking"].get("pretrained")
                if pretrained and os.path.exists(str(pretrained)):
                    if str(pretrained).endswith(".npz"):
                        # pre-converted via tools/import_weights.py
                        from .utils.params_io import load_pytree_npz
                        droid_params = load_pytree_npz(str(pretrained))
                    else:
                        droid_params = droid_net.load_droid_weights(str(pretrained))
                else:
                    droid_params = droid_net.init_droid_net(jax.random.PRNGKey(7))
            cam = config["cam"]
            # edge-aware rescale (dataset_track.py:124-140): the image is
            # resized to (H_out + 2*H_edge, W_out + 2*W_edge) and the edge
            # band cropped off, so focal lengths scale by the padded size
            # and the principal point shifts by the crop
            he = int(cam.get("H_edge", 0))
            we = int(cam.get("W_edge", 0))
            sx = (cam["W_out"] + 2 * we) / cam["W"]
            sy = (cam["H_out"] + 2 * he) / cam["H"]
            intr = np.asarray([cam["fx"] * sx, cam["fy"] * sy,
                               cam["cx"] * sx - we, cam["cy"] * sy - he])
            self.tracker = Tracker(config, droid_params, intr,
                                   update_fn=update_fn, agg_fn=agg_fn)
            self.traj_filler = PoseTrajectoryFiller(
                droid_params, self.tracker.intrinsics,
                update_fn=update_fn, agg_fn=agg_fn,
            )

        from .utils.metrics import StageTimers

        self.timers = StageTimers(os.path.join(self.out_dir, "metrics.jsonl"))

        # mapper progress
        self.map_counter = 0
        self.mapped_timestamps: list[float] = []
        self.first_frame_mapped = False
        self.global_ba_every = int(config["mapping"].get("global_ba_every", 10))
        self.metrics_log: list[Dict] = []
        self._metrics_flushed = 0  # log entries converted to host floats
        self.collab = None  # set by MultiAgentRunner / AgentCollaboration
        # loop_closure.map_aligned: (timestamps, c2w) pushed by the
        # collaboration layer after each closure deformation — the
        # reference's aligned_poses_c2w feedback into mapping
        # (mp_slam/mapper.py:193-198)
        self._aligned_kf_override = None
        # raw (tracker-world) keyframe poses, maintained only while the
        # override is active: the collab layer's closure math MUST consume
        # raw poses — its stored relative transform was measured against
        # the unaligned tracker pose, so feeding it already-aligned poses
        # re-applies the correction every keyframe (measured divergence:
        # 0.18 m bias compounded to 5.1 m over 30 keyframes, BASELINE r4)
        self._raw_kf_poses = None

        # slam_step cursor state (multi-agent interleaving advances agents
        # one motion-filter batch at a time through slam_step)
        self._frame_cursor = 0
        self._last_global_ba = 0

    # ------------------------------------------------------------------

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _frame_for_mapping(self, idx: int) -> Dict[str, jax.Array]:
        item = self.dataset[idx]
        return {
            "direction": jnp.asarray(item["direction"]),
            "rgb": jnp.asarray(item["rgb"]),
            "depth": jnp.asarray(item["depth"]),
        }, jnp.asarray(item["c2w"])

    def _tracked_pose_c2w(self, kf_index: int) -> jax.Array:
        """c2w of keyframe kf_index in the GT-aligned world frame
        (depth_video.py:185-218). Full static buffer inside one jit — no
        per-counter recompiles."""
        T = self.tracker.state.poses.shape[0]
        poses = _get_poses_c2w_jit(
            self.tracker.state, n=T, first_gt=self.tracker.state.poses_gt[0],
        )
        return poses[kf_index]

    def _refresh_mapped_poses(self):
        """Propagate tracker pose updates into the mapper's keyframe slots,
        matched by timestamp (the reference reads poses fresh per mapping
        iteration, mp_slam/mapper.py:193-198).

        ONE jitted batched dispatch for all slots (the former per-slot host
        loop was O(K) dispatches per keyframe, O(K^2) per run — VERDICT r2
        weak #6); no host readbacks at all."""
        if not self.mapped_timestamps:
            return
        if self.tracker is None:
            self._apply_aligned_override()
            return
        # NOTE: by default the agent's own map deliberately stays in its own
        # tracker world. The reference feeds aligned_poses_c2w back into
        # mapping (mapper.py:193-198), but each closure's relative transform
        # is re-measured against the *unaligned* tracker pose, so re-applying
        # it to already-deformed poses compounds the correction (divergent
        # under repeated closures). Here the aligned trajectory is the
        # exported estimate (publish/fusion/eval); the private map keeps a
        # single consistent frame. `loop_closure.map_aligned: true` restores
        # the reference behavior: the collaboration layer pushes the deformed
        # trajectory via set_aligned_kf_poses and it overrides the refreshed
        # slots below.
        with self.timers.stage("pose_refresh"):
            num_kf = self.map_state.kf_poses.shape[0]
            mts = np.full((num_kf,), -1.0, np.float32)
            k = min(len(self.mapped_timestamps), num_kf)
            if k:
                mts[:k] = self.mapped_timestamps[:k]
            new_poses, hit = _refresh_kf_poses_batched(
                self.map_state.kf_poses, jnp.asarray(mts), self.tracker.state,
                jnp.asarray(self.tracker.counter, jnp.int32),
                self.tracker.state.poses_gt[0],
            )
            self.map_state = self.map_state._replace(kf_poses=new_poses)
            if self._aligned_kf_override is not None:
                # keep the raw tracker-world poses retrievable. A refresh
                # HIT is a fresh tracker pose (pre-override by
                # construction); a MISS kept the existing slot value, which
                # may already be an aligned override — for misses keep the
                # previous raw history instead, so an override can never
                # leak into the "raw" trajectory even if the
                # never-cull-a-mapped-keyframe invariant is violated
                # (ADVICE r4 #2).
                packed = np.asarray(_pack_refresh_fetch(new_poses, hit))
                raw = packed[:k, :16].reshape(k, 4, 4).copy()
                hit_np = packed[:k, 16] > 0.5
                if self._raw_kf_poses is not None:
                    m_prev = min(k, len(self._raw_kf_poses))
                    miss = ~hit_np[:m_prev]
                    raw[:m_prev][miss] = self._raw_kf_poses[:m_prev][miss]
                self._raw_kf_poses = raw
        self._apply_aligned_override()

    def set_aligned_kf_poses(self, timestamps, poses_c2w):
        """`loop_closure.map_aligned` feedback: the collaboration layer's
        closure-deformed trajectory, to be mapped against from now on (the
        reference's aligned_poses_c2w consumption, mp_slam/mapper.py:193-198).
        Stored and applied immediately; re-applied after every tracker pose
        refresh so aligned poses always win for matching keyframe slots.
        The pre-override (tracker-world) poses stay retrievable through
        `kf_poses_raw` — the closure math's required input."""
        if self._aligned_kf_override is None and self._raw_kf_poses is None:
            # seed the raw history even when no keyframe is mapped yet
            # (mapping-only mode has no tracker refresh to initialize it;
            # ADVICE r4 #1) — the per-keyframe append in
            # _post_map_bookkeeping grows it from here
            n = min(len(self.mapped_timestamps),
                    self.map_state.kf_poses.shape[0])
            self._raw_kf_poses = (np.array(self.map_state.kf_poses[:n])
                                  if n else np.zeros((0, 4, 4), np.float32))
        self._aligned_kf_override = (
            np.asarray(timestamps, np.float64).ravel(),
            np.asarray(poses_c2w, np.float32),
        )
        self._apply_aligned_override()

    def kf_poses_raw(self, n: int) -> np.ndarray:
        """Tracker-world poses for mapped keyframe slots [0, n) — identical
        to `map_state.kf_poses[:n]` unless `loop_closure.map_aligned` has
        overridden the map slots, in which case the maintained raw history
        is returned instead."""
        if self._aligned_kf_override is None or self._raw_kf_poses is None:
            return np.asarray(self.map_state.kf_poses[:n])
        out = np.array(self.map_state.kf_poses[:n])
        m = min(len(out), len(self._raw_kf_poses))
        out[:m] = self._raw_kf_poses[:m]
        return out

    def _apply_aligned_override(self):
        if self._aligned_kf_override is None or not self.mapped_timestamps:
            return
        ats, aposes = self._aligned_kf_override
        num_kf = self.map_state.kf_poses.shape[0]
        ov = np.zeros((num_kf, 4, 4), np.float32)
        mask = np.zeros((num_kf, 1, 1), bool)
        pos = {float(t): i for i, t in enumerate(ats)}
        for slot, t in enumerate(self.mapped_timestamps[:num_kf]):
            j = pos.get(float(t))
            if j is not None:
                ov[slot] = aposes[j]
                mask[slot] = True
        if mask.any():
            kf = jnp.where(jnp.asarray(mask), jnp.asarray(ov),
                           self.map_state.kf_poses)
            self.map_state = self.map_state._replace(kf_poses=kf)

    # ------------------------------------------------------------------

    def _map_keyframe(self, frame_idx: int, pose_c2w: jax.Array, first: bool):
        with self.timers.stage("map_keyframe"):
            return self._map_keyframe_inner(frame_idx, pose_c2w, first)

    def _map_keyframe_inner(self, frame_idx: int, pose_c2w: jax.Array, first: bool):
        frame, _ = self._frame_for_mapping(frame_idx)
        frame["frame_id"] = frame_idx
        if first:
            self.map_state, metrics = self.mapper.first_frame_mapping(
                self.map_state, frame, pose_c2w, self._next_key()
            )
            self.first_frame_mapped = True
        else:
            self.map_state = self.mapper.add_keyframe(
                self.map_state, jnp.asarray(frame_idx), frame, pose_c2w, self._next_key()
            )
            self.map_state, metrics = self.mapper.optimize(
                self.map_state, frame, pose_c2w, self._next_key(),
                iters=int(self.config["mapping"]["iters"]),
            )
        self._post_map_bookkeeping(frame_idx, pose_c2w, metrics)
        return metrics

    def _post_map_bookkeeping(self, frame_idx: int, pose_c2w, metrics):
        """Shared per-mapped-keyframe host work: logs, vis cadence, and the
        multi-agent hooks (publish + loop detection + closure,
        mp_slam/mapper.py:224-229). Used by both the sequential path and
        the mesh fleet's sharded super-step."""
        self.mapped_timestamps.append(float(frame_idx))
        if self._aligned_kf_override is not None and \
                self._raw_kf_poses is not None:
            # extend the raw-pose history with this keyframe's tracker-
            # world pose (pose_c2w is always raw — it comes from the
            # tracker/dataset, never from the overridden map slots)
            self._raw_kf_poses = np.concatenate(
                [self._raw_kf_poses, np.asarray(pose_c2w)[None]])
        # Pipelined metric readback (VERDICT r3 next #3): the new entry
        # keeps its DEVICE scalars; the host float conversion + the
        # metrics.jsonl write happen one keyframe LATE, while this
        # keyframe's optimize super-step is still in flight on device —
        # the ~30 ms remote fetch RTT then overlaps device compute instead
        # of serializing the per-keyframe mapping dispatch chain.
        # Consumers reading metrics_log entries coerce on access (float()/
        # format of a 0-d jax array fetches); terminate()/run end flush
        # everything to plain floats.
        self.metrics_log.append(dict(metrics))
        self._flush_metrics(upto=len(self.metrics_log) - 1)

        vis_every = int(self.config["mapping"].get("vis", 0))
        if vis_every > 0 and (len(self.mapped_timestamps) - 1) % vis_every == 0:
            self._save_vis(frame_idx, pose_c2w)

        # periodic mesh snapshot (mapping.mapping_save_stride — the
        # reference's mp_slam/mapper.py:238-243 cadence with save_mesh's
        # mesh_track_{i}.ply naming, mneslam_mp.py:558-575; its save body
        # is commented out upstream, so this functions where the reference
        # only mkdirs). 0/absent = off.
        stride = int(self.config["mapping"].get("mapping_save_stride", 0))
        if stride > 0 and len(self.mapped_timestamps) % stride == 0:
            try:
                extract_mesh(
                    self.scene, self.map_state.params, self.config,
                    voxel_size=float(self.config["mesh"]["voxel_eval"]),
                    save_path=os.path.join(
                        self.out_dir, "mesh", f"mesh_track_{frame_idx}.ply"),
                )
            except Exception as e:  # snapshot failure must not kill the run
                print(f"[agent {self.rank}] mesh snapshot failed: {e}")

        if self.collab is not None:
            n = min(len(self.mapped_timestamps), self.map_state.kf_poses.shape[0])
            kf_ts = np.asarray(self.mapped_timestamps[:n], float)
            # the collab layer's closure math consumes RAW tracker-world
            # poses: its stored relative transform was measured against
            # the unaligned pose, so under loop_closure.map_aligned the
            # overridden map slots must NOT feed back (re-applying the
            # correction per keyframe compounded 0.18 m to 5.1 m over 30
            # keyframes in the round-4 on-chip eval)
            kf_poses = self.kf_poses_raw(n)
            self.collab.on_keyframe_mapped(
                frame_idx, self.dataset[frame_idx]["rgb"],
                np.asarray(pose_c2w), kf_poses, kf_ts,
            )

    def _flush_metrics(self, upto: Optional[int] = None):
        """Convert queued metrics_log entries (0-d device arrays) to host
        floats and write them to metrics.jsonl. `upto` = flush entries with
        index < upto (default: all). The pipelined readback in
        _post_map_bookkeeping flushes up to len-1, leaving the newest
        entry's scalars on device so their ~30 ms remote fetch overlaps the
        NEXT keyframe's optimize dispatch instead of serializing it."""
        end = len(self.metrics_log) if upto is None else upto
        while self._metrics_flushed < end:
            i = self._metrics_flushed
            entry = {k: float(v) for k, v in self.metrics_log[i].items()}
            self.metrics_log[i] = entry
            self.timers.log_scalars(int(self.mapped_timestamps[i]), entry)
            self._metrics_flushed = i + 1

    def _save_vis(self, frame_idx: int, pose_c2w: jax.Array):
        """Per-keyframe render/residual panel (mneslam_mp.py:472-560)."""
        from .data.rays import rays_from_pose
        from .utils import vis

        item = self.dataset[frame_idx]
        dirs = jnp.asarray(item["direction"]).reshape(-1, 3)
        rays_o, rays_d = rays_from_pose(dirs, pose_c2w)
        depth, rgb = self.scene.render_image_rays(
            self.map_state.params, rays_o, rays_d,
            jnp.asarray(item["depth"]).reshape(-1), chunk=4096)
        H, W = item["depth"].shape
        vis.save_render_panel(
            os.path.join(self.out_dir, "eval_vis", f"kf_{frame_idx:05d}.jpg"),
            np.asarray(item["rgb"]), np.asarray(item["depth"]),
            np.asarray(rgb).reshape(H, W, 3), np.asarray(depth).reshape(H, W),
            title=f"agent {self.rank} keyframe {frame_idx}",
        )

    # ------------------------------------------------------------------

    def run_mapping_only(self, log_every: int = 10):
        """BASELINE config #1: GT poses from the dataset, map every
        keyframe_every-th frame."""
        every = int(self.config["mapping"]["keyframe_every"])
        t0 = time.time()
        for idx in range(0, len(self.dataset), every):
            _, pose = self._frame_for_mapping(idx)
            self._map_keyframe(idx, pose, first=not self.first_frame_mapped)
            if (idx // every) % log_every == 0:
                m = self.metrics_log[-1]
                print(f"[agent {self.rank}] map kf {idx}: "
                      f"psnr={m['psnr']:.1f} loss={m['loss']:.4f}")
        self._flush_metrics()
        elapsed = time.time() - t0
        print(f"[agent {self.rank}] mapping-only done: "
              f"{len(self.mapped_timestamps)} kfs in {elapsed:.1f}s")
        return self.metrics_log

    def track_step(self) -> bool:
        """Tracking-only advance by one motion-filter batch. Returns False
        once the dataset is exhausted. Mapping of admitted keyframes is the
        caller's job (`slam_step` maps them inline; the mesh fleet maps all
        agents' pending keyframes in one sharded super-step)."""
        n_frames = len(self.dataset)
        if self._frame_cursor >= n_frames:
            return False
        batch = max(1, int(self.config["tracking"]["motion_filter"].get("batch", 1)))
        start = self._frame_cursor
        idxs = list(range(start, min(start + batch, n_frames)))
        self._frame_cursor = idxs[-1] + 1

        items = [self.dataset[i] for i in idxs]
        imgs = [self._to_tracking_res(it["rgb"]) for it in items]
        deps = [self._depth_to_tracking_res(it["depth"]) for it in items]
        gts = [jnp.asarray(it["c2w"]) for it in items]
        with self.timers.stage("track_frame"):
            if batch == 1:
                self.tracker.run(float(idxs[0]), imgs[0], depth=deps[0],
                                 gt_pose=gts[0])
            else:
                self.tracker.run_batch([float(i) for i in idxs], imgs,
                                       deps, gts)
        return True

    def pending_keyframe(self) -> Optional[Tuple[int, int, jax.Array]]:
        """Next tracked-but-unmapped keyframe as (kf_slot, frame_id, pose),
        or None — the mapper stays >= 1 keyframe behind tracking
        (mp_slam/mapper.py:173-176's race guard, now deterministic)."""
        if self.tracker is None or not self.tracker.frontend.is_initialized:
            return None
        if self.map_counter >= self.tracker.counter - 1:
            return None
        kf_idx = self.map_counter
        ts = float(self.tracker.state.timestamps[kf_idx])
        self._refresh_mapped_poses()
        pose = self._tracked_pose_c2w(kf_idx)
        return kf_idx, int(ts), pose

    def maybe_global_ba(self):
        """Periodic global BA (the reference's BundleAdjustment thread)."""
        if self.tracker is None:
            return
        if (self.tracker.counter - self._last_global_ba >= self.global_ba_every
                and self.tracker.counter > self.config["tracking"]["frontend"]["window"]):
            self.tracker.global_ba(steps=2)
            self._last_global_ba = self.tracker.counter

    def slam_step(self) -> bool:
        """Advance SLAM by one motion-filter batch: track, map pending
        keyframes, run periodic global BA. Returns False once the dataset
        is exhausted. This is the unit of multi-agent interleaving — the
        reference's per-agent OS processes (`multi_agents.py:44-49`) become
        a deterministic round-robin over these steps, so agents progress
        together and cross-agent loop closures can fire mid-run."""
        if not self.track_step():
            return False
        while True:
            pending = self.pending_keyframe()
            if pending is None:
                break
            _, frame_id, pose = pending
            self._map_keyframe(frame_id, pose, first=not self.first_frame_mapped)
            self.map_counter += 1
        self.maybe_global_ba()
        return True

    def run_slam(self):
        """Full SLAM: batched tracking, lagged mapping, periodic global BA.

        Frames go through the motion filter in batches of
        `tracking.motion_filter.batch` (admission semantics identical to
        per-frame; batching amortizes the per-dispatch readback latency of
        the device link — see motion_filter.track_batch)."""
        while self.slam_step():
            pass
        return self.terminate()

    def _to_tracking_res(self, rgb: np.ndarray) -> jax.Array:
        """Resize to (H_out + 2*H_edge, W_out + 2*W_edge), then crop the
        edge band — the reference tracking loader's order
        (datasets/dataset_track.py:101-142; the band holds invalid pixels
        after undistortion). The edge-aware intrinsic rescale in __init__
        matches this geometry."""
        cam = self.config["cam"]
        H_out, W_out = cam["H_out"], cam["W_out"]
        he, we = int(cam.get("H_edge", 0)), int(cam.get("W_edge", 0))
        img = jnp.asarray(rgb).transpose(2, 0, 1)
        Hp, Wp = H_out + 2 * he, W_out + 2 * we
        if img.shape[1] != Hp or img.shape[2] != Wp:
            # antialias=False: cv2.resize INTER_LINEAR (the reference
            # loader) does not prefilter on downscale
            img = jax.image.resize(img, (3, Hp, Wp), "bilinear",
                                   antialias=False)
        if he or we:
            img = img[:, he: Hp - he or None, we: Wp - we or None]
        return img

    def _depth_to_tracking_res(self, depth: np.ndarray) -> jax.Array:
        cam = self.config["cam"]
        H_out, W_out = cam["H_out"], cam["W_out"]
        he, we = int(cam.get("H_edge", 0)), int(cam.get("W_edge", 0))
        d = jnp.asarray(depth)
        Hp, Wp = H_out + 2 * he, W_out + 2 * we
        if d.shape != (Hp, Wp):
            # torch F.interpolate(mode='nearest') semantics (the reference
            # loader): source index = floor(out_idx * in/out), no
            # half-pixel offset (jax.image.resize 'nearest' rounds from
            # half-pixel centers and picks different texels)
            iy = jnp.floor(jnp.arange(Hp) * (d.shape[0] / Hp)).astype(jnp.int32)
            ix = jnp.floor(jnp.arange(Wp) * (d.shape[1] / Wp)).astype(jnp.int32)
            d = d[iy][:, ix]
        if he or we:
            d = d[he: Hp - he or None, we: Wp - we or None]
        return d

    # ------------------------------------------------------------------

    def terminate(self):
        """Final mesh + trajectory fill + ATE eval (mneslam_mp.py:632-737)."""
        self._flush_metrics()  # drain the pipelined metric readback queue
        results = {}
        # final mesh + keyframe-frustum-culled variant (the reference's
        # Mesher.get_mesh culled output, model/Mesher.py:92-157,217-297)
        mesh_path = os.path.join(self.out_dir, "mesh", "final_mesh.ply")
        try:
            # RAW mesh is bounded to keyframe-observed space (the reference
            # never generates geometry outside the keyframe TSDF hull,
            # model/Mesher.py:92-157); the culled variant below additionally
            # frustum/occlusion-culls per vertex.
            verts, faces, colors = extract_mesh(
                self.scene, self.map_state.params, self.config,
                save_path=mesh_path, observed=self._observed_space()
            )
            results["mesh_verts"] = len(verts)
            culled = self._save_culled_mesh(verts, faces, colors)
            if culled is not None:
                results["mesh_verts_culled"] = culled
        except Exception as e:  # meshing must not kill the eval
            print(f"[agent {self.rank}] meshing failed: {e}")

        if self.tracker is not None and self.tracker.counter > 1:
            n = self.tracker.counter
            key_poses = np.asarray(video_lib.get_poses_c2w(
                self.tracker.state, n, first_gt=self.tracker.state.poses_gt[0]))
            key_ts = np.asarray(self.tracker.state.timestamps[:n])
            np.save(os.path.join(self.out_dir, "key_est_poses.npy"), key_poses)
            np.save(os.path.join(self.out_dir, "key_timestamps.npy"), key_ts)

            # trajectory fill over all frames
            def stream():
                for idx in range(len(self.dataset)):
                    yield float(idx), self._to_tracking_res(self.dataset[idx]["rgb"])

            filled_w2c = self.traj_filler(self.tracker.state, n, stream())
            # convert the filled w2c poses to GT-aligned c2w matrices
            c2w = lie.inv(filled_w2c)
            M = lie.matrix(c2w)
            trans = self.tracker.state.poses_gt[0]
            trans = trans.at[:3, 1].multiply(-1.0).at[:3, 2].multiply(-1.0)
            # float32 precision: exported-trajectory compose (see
            # video.get_poses_c2w)
            with jax.default_matmul_precision("float32"):
                M = jnp.einsum("ij,njk->nik", trans, M)
            M = M.at[:, :3, 1].multiply(-1.0).at[:, :3, 2].multiply(-1.0)
            est_poses = np.asarray(M)
            np.save(os.path.join(self.out_dir, "est_poses.npy"), est_poses)

            gt = np.stack([self.dataset[i]["c2w"] for i in range(len(self.dataset))])
            metrics = ate_lib.evaluate_ate(gt, est_poses, alignment="sim3")
            ate_lib.save_trajectory_metrics(
                os.path.join(self.out_dir, "metrics_traj.txt"), metrics)
            results["ate"] = metrics
            print(f"[agent {self.rank}] APE(sim3) rmse={metrics['rmse']:.4f} m")

        self.save_checkpoint(os.path.join(self.out_dir, "final_checkpoint.npz"))
        return results

    def _observed_space(self):
        """(kf_poses, intrinsics, H, W, depths, eps) of the mapped
        keyframes, for observed-space mesh bounding — or None before any
        keyframe is mapped."""
        if not self.mapped_timestamps:
            return None
        n = min(len(self.mapped_timestamps), self.map_state.kf_poses.shape[0])
        kf_poses = np.asarray(self.map_state.kf_poses[:n])
        depths = np.stack([np.asarray(self.dataset[int(t)]["depth"])
                           for t in self.mapped_timestamps[:n]])
        H, W = depths.shape[1:]
        cam = self.config["cam"]
        intr = np.asarray([cam["fx"], cam["fy"], cam["cx"], cam["cy"]], np.float32)
        # depth-support band: the meshing truncation (3*trunc, like the
        # reference's TSDF integration depth + truncation)
        eps = 3.0 * float(self.config["training"]["trunc"]) * \
            float(self.config["data"]["sc_factor"])
        return kf_poses, intr, H, W, depths, eps

    def _save_culled_mesh(self, verts, faces, colors) -> Optional[int]:
        """Frustum+occlusion-cull the final mesh against the mapped
        keyframes (poses + observed depths) and save it alongside the raw
        one (model/Mesher.py:92-157 behavior at terminate)."""
        if len(verts) == 0 or not self.mapped_timestamps:
            return None
        from .mapping import cull
        from .ops import mc

        kf_poses, intr, H, W, depths, _ = self._observed_space()
        cverts, cfaces, ccolors = cull.cull_mesh(
            verts, faces, kf_poses, intr, H, W, depths=depths, colors=colors)
        path = os.path.join(self.out_dir, "mesh", "final_mesh_culled.ply")
        if len(cverts):
            mc.save_ply(path, cverts, cfaces, ccolors)
        return len(cverts)

    # ------------------------------------------------------------------

    # ------------------------------------------------------------------
    # full-state checkpoint / deterministic resume (SURVEY.md §5.4 — the
    # reference has no resume; the rebuild checkpoints the complete pytree:
    # map params/optimizer, keyframe DB, tracker video buffer, counters, RNG)
    # ------------------------------------------------------------------

    def full_state(self) -> Dict:
        state = {
            "map_state": self.map_state._asdict() | {"db": self.map_state.db._asdict()},
            "key": self.key,
            "host": {
                "map_counter": self.map_counter,
                "mapped_timestamps": list(self.mapped_timestamps),
                "first_frame_mapped": self.first_frame_mapped,
            },
        }
        if self.tracker is not None:
            state["video"] = self.tracker.state._asdict()
            state["host"]["tracker_counter"] = self.tracker.counter
            state["host"]["frontend_t1"] = self.tracker.frontend.t1
            state["host"]["frontend_initialized"] = self.tracker.frontend.is_initialized
        return state

    def save_full_state(self, path: str):
        """Atomic single-file full-state checkpoint (flattened pytree)."""
        tree = self.full_state()
        tree["host"]["mapped_timestamps"] = np.asarray(
            tree["host"]["mapped_timestamps"], np.float64)
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        arrays = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)

    def load_full_state(self, path: str):
        """Restore into the live structure (types preserved via template)."""
        data = np.load(path, allow_pickle=False)
        template = self.full_state()
        template["host"]["mapped_timestamps"] = np.asarray(
            template["host"]["mapped_timestamps"], np.float64)
        # pad/truncate template list-shaped leaves to saved shapes via rebuild
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = [jnp.asarray(data[jax.tree_util.keystr(p)]) for p, _ in leaves]
        restored = jax.tree_util.tree_unflatten(treedef, new_leaves)

        from .mapping.keyframe import KeyframeDB
        from .mapping.mapper import MapperState

        ms = restored["map_state"]
        self.map_state = MapperState(
            params=ms["params"], opt_state=ms["opt_state"],
            db=KeyframeDB(**ms["db"]), kf_poses=ms["kf_poses"],
        )
        self.key = restored["key"]
        host = restored["host"]
        self.map_counter = int(host["map_counter"])
        self.mapped_timestamps = [float(t) for t in np.asarray(host["mapped_timestamps"])]
        self.first_frame_mapped = bool(host["first_frame_mapped"])
        if self.tracker is not None and "video" in restored:
            from .tracking.video import VideoState

            self.tracker.state = VideoState(**restored["video"])
            self.tracker.counter = int(host["tracker_counter"])
            self.tracker.frontend.t1 = int(host["frontend_t1"])
            self.tracker.frontend.is_initialized = bool(host["frontend_initialized"])

    def save_checkpoint(self, path: str):
        """Flat-npz checkpoint of the map params + keyframe poses (the
        reference's final_checkpoint.pt contract, mneslam_mp.py:317-340)."""
        flat = jax.tree_util.tree_flatten_with_path(self.map_state.params)[0]
        arrays = {"/".join(str(k) for k in path_): np.asarray(v) for path_, v in flat}
        arrays["__kf_poses"] = np.asarray(self.map_state.kf_poses)
        arrays["__kf_count"] = np.asarray(self.map_state.db.count)
        np.savez(path, **arrays)

    def load_checkpoint(self, path: str):
        data = np.load(path)
        flat, treedef = jax.tree_util.tree_flatten_with_path(self.map_state.params)
        new_leaves = [jnp.asarray(data["/".join(str(k) for k in p)]) for p, _ in flat]
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)
        self.map_state = self.map_state._replace(
            params=params,
            kf_poses=jnp.asarray(data["__kf_poses"]),
        )


def build_slam(overrides: Optional[Dict] = None, dataset=None, **kw) -> MNESLAM:
    """Convenience constructor used by tests and the benchmark."""
    cfg = make_config(overrides)
    if dataset is None:
        from .data.synthetic import SyntheticBoxDataset

        dataset = SyntheticBoxDataset(cfg)
    return MNESLAM(cfg, dataset, **kw)
