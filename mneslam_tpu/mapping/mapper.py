"""Online mapper: jitted gradient-descent super-steps over the neural map.

Rebuild of the reference `Mapper` (`/root/reference/mp_slam/mapper.py`) with
the TPU execution model from SURVEY.md §7.1: instead of a Python thread
looping 50 torch steps per keyframe, the entire per-keyframe optimization
(ray sampling -> render -> loss -> Adam update, `mapper.py:118-161`) is ONE
jitted `lax.fori_loop` program. The keyframe DB, poses, params, and
optimizer state all live on device; the host only decides *when* to map.

Optimizer mirrors `mneslam_mp.py:431-469`: Adam(betas=(0.9, 0.99)) with
lr_decoder + weight decay 1e-6 on the decoder, lr_embed + eps 1e-15 on the
planes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import rays as rays_lib
from ..models.scene_rep import SceneRep
from . import keyframe as kf_lib


class MapperState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    db: kf_lib.KeyframeDB
    kf_poses: jax.Array  # [num_kf, 4, 4] c2w per slot


def make_optimizer(config) -> optax.GradientTransformation:
    mp = config["mapping"]

    def label_fn(params):
        return jax.tree.map_with_path(
            lambda path, _: "decoder" if path[0].key == "decoder" else "planes", params
        )

    return optax.multi_transform(
        {
            "decoder": optax.chain(
                optax.add_decayed_weights(1e-6),
                optax.adam(mp["lr_decoder"], b1=0.9, b2=0.99),
            ),
            "planes": optax.adam(mp["lr_embed"], b1=0.9, b2=0.99, eps=1e-15),
        },
        label_fn,
    )


class Mapper:
    def __init__(self, config, scene: SceneRep, num_kf: int, rays_per_kf: int,
                 mesh=None, shard_plane_rows: bool = False, shard_axes=None):
        """`mesh`: optional jax.sharding.Mesh — when given, each
        optimization iteration's ray batch is sharded over every mesh
        device (both named axes) and the plane-gradient reduction rides the
        ICI psum XLA inserts for the replicated params. This is the
        multi-chip mapping-throughput path (BASELINE.md: the per-iteration
        floor on one chip is the tri-plane scatter's random-RMW bandwidth;
        sharding rays divides the scattered rows per device). The ray count
        is padded up to the device count so the batch splits evenly
        (min_pixels_cur is a lower bound in the reference too,
        mapper.py:118-161).

        `shard_plane_rows` (requires mesh): additionally shard the plane
        parameters, their Adam state, and the whole plane-gradient
        reduce/fold over table rows (ZeRO-style). Per iteration the RAW
        plane rows are all-gathered and packed locally
        (`parallel.mesh.make_row_sharded_pack` — the raw rows are 4x fewer
        bytes over ICI than the packed tables round 3 gathered), and the
        backward's packed cotangents reduce-scatter so the dense
        `pack_corners` adjoint fold and Adam run on 1/N of the table per
        device — the table-sized backward terms that do NOT shrink with
        the ray shard (BASELINE.md round-3 ray-sharding measurement: they
        dominate the per-device cost at rays/8).

        `shard_axes` (row-sharded mode only): the SUBSET of mesh axes the
        seam collectives and the ray/row shards run over — defaults to
        every mesh axis (the single-agent multi-chip deployment). The
        mesh fleet passes a 2D ('agent', 'ray') mesh with
        shard_axes=('ray',): each agent occupies one 'ray' device group,
        rows/rays shard within the group, and the 'agent' axis carries
        data-parallel agents (parallel/fleet.py, round 4)."""
        self.config = config
        self.scene = scene
        self.num_kf = num_kf
        self.rays_per_kf = rays_per_kf
        self.optimizer = make_optimizer(config)
        self.mesh = mesh
        self.shard_rows = bool(shard_plane_rows) and mesh is not None
        self.shard_axes = (tuple(shard_axes) if shard_axes is not None
                           else (tuple(mesh.axis_names)
                                 if mesh is not None else ()))
        if mesh is not None:
            assert all(a in mesh.axis_names for a in self.shard_axes)
        self._stack_axes = (tuple(a for a in mesh.axis_names
                                  if a not in self.shard_axes)
                            if mesh is not None else ())
        self._seam_cache = {}
        self.n_global = int(config["mapping"]["sample"])
        self.n_cur = int(config["mapping"]["min_pixels_cur"])
        if mesh is not None:
            n_dev = (self._n_dev if self.shard_rows
                     else int(np.prod(list(mesh.shape.values()))))
            rup = lambda n: (n + n_dev - 1) // n_dev * n_dev
            self.n_global, self.n_cur = rup(self.n_global), rup(self.n_cur)

    def _shard_rays(self, *arrays):
        """Pin per-iteration ray batches to the mesh's combined device axis
        (no-op without a mesh)."""
        if self.mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        spec = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(tuple(self.mesh.axis_names)))
        out = tuple(jax.lax.with_sharding_constraint(a, spec) for a in arrays)
        return out if len(out) > 1 else out[0]

    def init_state(self, key) -> MapperState:
        params = self.scene.init_params(key)
        return MapperState(
            params=params,
            opt_state=self.optimizer.init(params),
            db=kf_lib.init_db(self.num_kf, self.rays_per_kf),
            kf_poses=jnp.tile(jnp.eye(4), (self.num_kf, 1, 1)),
        )

    @property
    def _n_dev(self) -> int:
        """Device count of the shard group (the row/ray shard width —
        excludes fleet 'agent' axes when shard_axes is a subset)."""
        return int(np.prod([self.mesh.shape[a] for a in self.shard_axes]))

    def _pad_h(self, H: int) -> int:
        n = self._n_dev
        return (H + n - 1) // n * n

    def _plane_shapes_of(self, which: str):
        return (self.scene.plane_shapes if which == "planes"
                else self.scene.c_plane_shapes)

    @staticmethod
    def _plane_leaf_addr(path):
        """(which, name, level) when `path` addresses a plane leaf, else
        None. Adam-moment trees mirror the params tree (multi_transform
        group names included), so the trailing planes/<name>/<level>
        segments identify the leaf in params and optimizer state alike."""
        from jax.tree_util import DictKey, SequenceKey

        for i in range(len(path) - 3, -1, -1):
            if (isinstance(path[i], DictKey)
                    and path[i].key in ("planes", "c_planes")
                    and isinstance(path[i + 1], DictKey)
                    and path[i + 1].key in ("xy", "xz", "yz")
                    and isinstance(path[i + 2], SequenceKey)):
                return path[i].key, path[i + 1].key, path[i + 2].idx
        return None

    def _shard_plane_state(self, tree):
        """Entering `optimize` under shard_plane_rows: convert each plane
        leaf (params or Adam moments) [C, H, W] to the flat row-major
        layout [Hp*W, C] (row r = y*W + x, H zero-padded to a device-count
        multiple Hp) and pin it row-sharded. Inside the compiled loop
        everything — collective seam, gradient fold, Adam — works on this
        layout, so the per-iteration path carries NO [C,H,W]<->row-major
        transposes (the relayouts run once here and in `_unshard`, amortized
        over the whole fori_loop). The pad rows carry zero gradients and
        zero moments, so the round trip is exact. Params stay unpadded,
        untransposed, and replicated AT REST (renderer, mesher,
        checkpointing, fusion all see the ordinary layout)."""
        from ..parallel import mesh as mesh_lib

        shard = mesh_lib.row_sharding(self.mesh, ndim=2, axis=0,
                                      names=self.shard_axes)

        def f(path, leaf):
            addr = self._plane_leaf_addr(path)
            if addr is None or not hasattr(leaf, "ndim") or leaf.ndim != 3:
                return leaf
            which, name, lvl = addr
            C, H, W = (int(s) for s in self._plane_shapes_of(which)[lvl][name])
            flat = jnp.transpose(leaf, (1, 2, 0)).reshape(H * W, C)
            Rp = self._pad_h(H) * W
            if Rp > H * W:
                flat = jnp.pad(flat, ((0, Rp - H * W), (0, 0)))
            return jax.lax.with_sharding_constraint(flat, shard)

        return jax.tree_util.tree_map_with_path(f, tree)

    def _unshard_plane_state(self, tree):
        """Leaving `optimize`: back to [C, H, W], pad rows sliced off."""
        def f(path, leaf):
            addr = self._plane_leaf_addr(path)
            if addr is None or not hasattr(leaf, "ndim") or leaf.ndim != 2:
                return leaf
            which, name, lvl = addr
            C, H, W = (int(s) for s in self._plane_shapes_of(which)[lvl][name])
            return jnp.transpose(leaf[:H * W].reshape(H, W, C), (2, 0, 1))

        return jax.tree_util.tree_map_with_path(f, tree)

    def _shard_plane_state_stacked(self, tree):
        """Fleet variant of `_shard_plane_state`: every plane leaf carries
        a leading agent axis ([A, C, H, W] -> flat row-major [A, Hp*W, C];
        agent axis pinned to the fleet's stack axes, rows to the shard
        axes). Used by the composed agent x rows super-step
        (`parallel/fleet.make_fleet_super_step_row_sharded`)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        # empty axis tuples are not a valid PartitionSpec entry — map them
        # to None (replicated); a row-sharded mapper whose shard_axes cover
        # all mesh axes has no stack axes (ADVICE r4 #5)
        shard = NamedSharding(self.mesh, P(self._stack_axes or None,
                                           self.shard_axes or None))

        def f(path, leaf):
            addr = self._plane_leaf_addr(path)
            if addr is None or not hasattr(leaf, "ndim") or leaf.ndim != 4:
                return leaf
            which, name, lvl = addr
            C, H, W = (int(s) for s in self._plane_shapes_of(which)[lvl][name])
            A = leaf.shape[0]
            flat = jnp.transpose(leaf, (0, 2, 3, 1)).reshape(A, H * W, C)
            Rp = self._pad_h(H) * W
            if Rp > H * W:
                flat = jnp.pad(flat, ((0, 0), (0, Rp - H * W), (0, 0)))
            return jax.lax.with_sharding_constraint(flat, shard)

        return jax.tree_util.tree_map_with_path(f, tree)

    def _unshard_plane_state_stacked(self, tree):
        """Leaving the fleet super-step: [A, Hp*W, C] -> [A, C, H, W]."""
        def f(path, leaf):
            addr = self._plane_leaf_addr(path)
            if addr is None or not hasattr(leaf, "ndim") or leaf.ndim != 3:
                return leaf
            which, name, lvl = addr
            C, H, W = (int(s) for s in self._plane_shapes_of(which)[lvl][name])
            A = leaf.shape[0]
            return jnp.transpose(leaf[:, :H * W].reshape(A, H, W, C),
                                 (0, 3, 1, 2))

        return jax.tree_util.tree_map_with_path(f, tree)

    def _seam_fn(self, true_shape):
        """Cached per-plane-shape collective seam
        (`parallel/mesh.make_row_sharded_pack`, shard_map-internal):
        local pack + all-gather of PACKED blocks forward; reduce-scatter +
        row-local fold backward (`mapping.shard_fold`: "after" = packed
        reduce-scatter then block fold, "before" = full local fold then
        4x-smaller raw reduce-scatter — numerically identical, different
        compute/ICI split). The cast to `training.render_dtype` happens on
        the sharded side inside the seam, so under bfloat16 the all-gather
        AND the gradient reduction move half the bytes (matching the
        single-chip bf16 path, which folds and scatters in bf16 too)."""
        from ..parallel import mesh as mesh_lib

        fn = self._seam_cache.get(true_shape)
        if fn is None:
            axes = self.shard_axes
            sizes = tuple(int(self.mesh.shape[a]) for a in axes)
            fn = mesh_lib.make_row_sharded_pack(
                axes, sizes, true_shape, self._pad_h(true_shape[1]),
                compute_dtype=self.scene.compute_dtype,
                fold=str(self.config["mapping"].get("shard_fold", "after")))
            self._seam_cache[true_shape] = fn
        return fn

    def _packed_params(self, params, tables=None):
        """Swap the flat row-sharded plane leaves for replicated
        `PackedPlane` tables through the collective seam.

        With `tables` (the prefetch buffer from `_gather_plane_tables`),
        each table enters through the seam's `consume` half instead: the
        forward uses the CARRIED (one-iteration-old) table and the VJP
        reroutes its cotangent to the local rows — `mapping.shard_prefetch`
        semantics (see `_optimize_row_sharded`)."""
        from ..ops import interp

        out = dict(params)
        for which in ("planes", "c_planes"):
            if which not in params:
                continue
            shapes = self._plane_shapes_of(which)
            packed = {}
            for name in ("xy", "xz", "yz"):
                packed[name] = []
                for lvl, leaf in enumerate(params[which][name]):
                    ts = tuple(int(s) for s in shapes[lvl][name])
                    fn = self._seam_fn(ts)
                    tbl = (fn(leaf) if tables is None
                           else fn.consume(leaf, tables[which][name][lvl]))
                    packed[name].append(interp.PackedPlane(tbl, ts))
            out[which] = packed
        return out

    def _gather_plane_tables(self, params):
        """Forward-only pack + all-gather of every plane leaf — the
        prefetch buffer (`f.gather`): issued at the top of a loop
        iteration for the table the NEXT iteration's forward consumes, so
        the all-gather runs under a full iteration of compute."""
        out = {}
        for which in ("planes", "c_planes"):
            if which not in params:
                continue
            shapes = self._plane_shapes_of(which)
            out[which] = {
                name: [self._seam_fn(tuple(int(s)
                                           for s in shapes[lvl][name])).gather(leaf)
                       for lvl, leaf in enumerate(params[which][name])]
                for name in ("xy", "xz", "yz")}
        return out

    # ------------------------------------------------------------------

    def _loss_fn(self, params, rays_o, rays_d, target_rgb, target_d, key):
        ret = self.scene.forward(params, rays_o, rays_d, target_rgb, target_d, key=key)
        smooth = None
        tr = self.config["training"]
        if float(tr.get("smooth_weight", 0.0)) > 0.0:
            # TV smoothness over a random plane-feature sub-grid
            # (mneslam_mp.py:375-397, weighted at mneslam_mp.py:366-370)
            smooth = self.scene.smoothness(
                params, jax.random.fold_in(key, 101),
                sample_points=int(tr.get("smooth_pts", 32)),
                voxel_size=float(tr.get("smooth_vox", 0.1)),
                margin=float(tr.get("smooth_margin", 0.05)))
        loss = self.scene.get_loss_from_ret(ret, smooth_loss=smooth)
        return loss, ret

    def _build_rays(self, db, kf_poses, dir_flat, rgb_flat, d_flat,
                    cur_pose, HW, key, use_cur):
        """One iteration's full ray batch (global KF rays + current-frame
        rays) — shared by the single/ray-sharded and row-sharded paths so
        both sample identical batches from the same key stream."""
        k_db, k_cur, k_render = jax.random.split(key, 3)
        g_rays, slot_ids = kf_lib.sample_global_rays(db, k_db, self.n_global)
        g_poses = kf_poses[slot_ids]                            # [n, 4, 4]
        g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3], g_poses)
        g_rgb, g_depth = g_rays[:, 3:6], g_rays[:, 6]

        if use_cur:
            idx = jax.random.randint(k_cur, (self.n_cur,), 0, HW)
            c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], cur_pose)
            rays_o = jnp.concatenate([g_o, c_o], axis=0)
            rays_d = jnp.concatenate([g_d, c_d], axis=0)
            target_rgb = jnp.concatenate([g_rgb, rgb_flat[idx]], axis=0)
            target_d = jnp.concatenate([g_depth, d_flat[idx]], axis=0)[:, None]
        else:
            rays_o, rays_d = g_o, g_d
            target_rgb, target_d = g_rgb, g_depth[:, None]
        return rays_o, rays_d, target_rgb, target_d, k_render

    @partial(jax.jit, static_argnames=("self", "iters", "use_cur"))
    def optimize(
        self,
        state: MapperState,
        cur_frame: Dict[str, jax.Array],   # direction [H,W,3], rgb [H,W,3], depth [H,W]
        cur_pose: jax.Array,               # [4, 4] c2w
        key: jax.Array,
        iters: int,
        use_cur: bool = True,
    ) -> Tuple[MapperState, Dict[str, jax.Array]]:
        """`iters` optimization steps over (global KF rays + current-frame
        rays) — the body of mapper.py:118-161, compiled once."""
        if self.shard_rows:
            return self._optimize_row_sharded(state, cur_frame, cur_pose,
                                              key, iters, use_cur)
        H, W = cur_frame["depth"].shape
        dir_flat = cur_frame["direction"].reshape(-1, 3)
        rgb_flat = cur_frame["rgb"].reshape(-1, 3)
        d_flat = cur_frame["depth"].reshape(-1)

        def step(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, i)
            rays_o, rays_d, target_rgb, target_d, k_render = self._build_rays(
                state.db, state.kf_poses, dir_flat, rgb_flat, d_flat,
                cur_pose, H * W, k, use_cur)
            if self.mesh is not None:
                rays_o, rays_d, target_rgb, target_d = self._shard_rays(
                    rays_o, rays_d, target_rgb, target_d)

            (loss, ret), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                params, rays_o, rays_d, target_rgb, target_d, k_render
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss, "psnr": ret["psnr"],
                                       "rgb_loss": ret["rgb_loss"],
                                       "depth_loss": ret["depth_loss"]}

        zero_metrics = {"loss": jnp.zeros(()), "psnr": jnp.zeros(()),
                        "rgb_loss": jnp.zeros(()), "depth_loss": jnp.zeros(())}
        params, opt_state, metrics = jax.lax.fori_loop(
            0, iters, step, (state.params, state.opt_state, zero_metrics)
        )
        return state._replace(params=params, opt_state=opt_state), metrics

    def _make_row_body(self, H, W, iters, use_cur):
        """The per-device row-sharded optimize program: `iters` iterations
        of sample -> render local ray shard -> seam backward -> row-local
        fold/Adam, collectives over `self.shard_axes`. Shared verbatim by
        the single-agent shard_map (`_optimize_row_sharded`) and the
        composed agent x rows fleet super-step
        (`parallel/fleet.make_fleet_super_step_row_sharded`), so the two
        deployments run the identical per-device program."""
        axes = self.shard_axes
        sizes = tuple(int(self.mesh.shape[a]) for a in axes)
        n_dev = self._n_dev
        tr = self.config["training"]
        smooth_w = float(tr.get("smooth_weight", 0.0))
        prefetch = int(self.config["mapping"].get("shard_prefetch", 0))
        gather_every = max(1, int(self.config["mapping"].get(
            "shard_gather_every", 1)))
        if prefetch != 0 and gather_every > 1:
            raise ValueError(
                "mapping.shard_gather_every composes with the sync seam "
                "only (shard_prefetch must be 0)")

        def body(params, opt_state, db, kf_poses, dirf, rgbf, df, pose, key):
            dev = jnp.zeros((), jnp.int32)
            for name, size in zip(axes, sizes):
                dev = dev * size + jax.lax.axis_index(name)

            def loss_fn(p, tables, ro, rd, trgb, td, k_render, offset,
                        n_total):
                packed = self._packed_params(p, tables)
                ret = self.scene.forward(packed, ro, rd, trgb, td,
                                         key=k_render, axis_name=axes,
                                         rng_block=(n_total, offset))
                smooth = None
                if smooth_w > 0.0:
                    smooth = self.scene.smoothness(
                        packed, jax.random.fold_in(k_render, 101),
                        sample_points=int(tr.get("smooth_pts", 32)),
                        voxel_size=float(tr.get("smooth_vox", 0.1)),
                        margin=float(tr.get("smooth_margin", 0.05)))
                # The differentiated scalar is the GLOBAL loss / n_dev: in
                # shard_map autodiff psum's transpose is psum, so grad of
                # the replicated global loss is n_dev x the true partial.
                # The 1/n_dev makes every summed gradient exact — including
                # the replicated smoothness term (identical on all devices,
                # summed once by the seam's reduce-scatter).
                loss_g = self.scene.get_loss_from_ret(
                    ret, smooth_loss=smooth) / n_dev
                return loss_g, ret

            def grads_and_metrics(i, params, tables):
                """One iteration's loss/grad at the (possibly stale)
                prefetched tables; plane grads row-local, rest psum'd."""
                k = jax.random.fold_in(key, i)
                # identical full-batch sampling on every device (same key),
                # then each device takes its contiguous ray block
                rays_o, rays_d, t_rgb, t_d, k_render = self._build_rays(
                    db, kf_poses, dirf, rgbf, df, pose, H * W, k, use_cur)
                n_total = rays_o.shape[0]
                shard = n_total // n_dev
                sl = lambda a: jax.lax.dynamic_slice_in_dim(
                    a, dev * shard, shard, axis=0)
                (loss_g, ret), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    params, tables, sl(rays_o), sl(rays_d), sl(t_rgb),
                    sl(t_d), k_render, dev * shard, n_total)
                # plane grads come out of the seam already row-local;
                # everything else (decoder) is a per-device partial -> psum
                grads = jax.tree_util.tree_map_with_path(
                    lambda p, g: g if self._plane_leaf_addr(p) is not None
                    else jax.lax.psum(g, axes), grads)
                return grads, {"loss": loss_g * n_dev, "psnr": ret["psnr"],
                               "rgb_loss": ret["rgb_loss"],
                               "depth_loss": ret["depth_loss"]}

            zero_metrics = {"loss": jnp.zeros(()), "psnr": jnp.zeros(()),
                            "rgb_loss": jnp.zeros(()),
                            "depth_loss": jnp.zeros(())}

            # `mapping.shard_prefetch` (VERDICT r3 next #1(b), measured
            # round 4 — tools/prof_zero6.py, tools/prof_prefetch_quality.py):
            #
            #   prefetch == 0 (DEFAULT, exact): the synchronous seam —
            #     pack + all-gather inline in the forward, reduce-scatter +
            #     fold in the backward. Measured FASTEST per-device program
            #     (3.93 ms/iter fp32 / 3.98 bf16 at 8 shards, K=40): every
            #     hoisted/double-buffered restructure costs more per-device
            #     compute (+0.6-1.1 ms/iter) than the ≤1.35 ms of ICI it
            #     could hide, because carrying the packed tables through
            #     the fori_loop defeats XLA's gather/consumer fusion.
            #   prefetch == 1 (stale-by-one tables): the packed tables live
            #     in the fori_loop CARRY; the body gathers BEFORE its Adam
            #     update so the all-gather's overlap window is the whole
            #     iteration, at the cost of rendering against one-step-old
            #     plane features (delayed-gradient descent). Quality nearly
            #     neutral on the synthetic eval (45.8 -> 44.6 dB PSNR,
            #     equal depth L1).
            #   prefetch == 2: additionally applies grads one iteration
            #     late, taking the reduce-scatter off the critical path
            #     too. Quality COLLAPSES (24 dB / 22 cm depth L1) — kept
            #     only as a documented rejected experiment.
            # Both stale modes also measured SLOWER per-device than the
            # sync seam on one chip; they could only win if real multi-chip
            # ICI latency exceeds the ~1.1 ms/iter structure tax, which the
            # payload math says it does not (BASELINE.md round 4).
            # `mapping.shard_gather_every` = k (round 5, VERDICT r4 next
            # #1): amortize the dominant per-iteration collective — the
            # packed-table all-gather (~270 MB fp32 / ~135 bf16 at
            # reference shapes) — by hoisting ONE pack + all-gather out of
            # every k-iteration inner loop and rendering those k
            # iterations against the same loop-INVARIANT table. Gradients
            # still reduce-scatter and Adam still applies EVERY iteration
            # (only the forward's table view goes up-to-(k-1)-stale; the
            # params themselves advance each step). Unlike the
            # measured-rejected H/P prefetch variants, the tables are NOT
            # carried through a fori_loop — they are closure invariants of
            # the inner loop, so XLA hoists them without the +0.6-1.1
            # ms/iter carry structure tax. k=1 == the sync seam exactly
            # (fresh table, consume(x, gather(x)) == f(x)).
            if prefetch == 0 and gather_every > 1:
                def run_block(base, count, carry):
                    # `tables` enters the inner fori_loop as a CLOSURE
                    # invariant (hoisted once), not as loop carry — the
                    # carried-table H/P variants paid +0.6-1.1 ms/iter of
                    # structure tax for exactly that carry
                    tables = self._gather_plane_tables(carry[0])

                    def inner(j, c):
                        params, opt_state, _ = c
                        grads, metrics = grads_and_metrics(
                            base + j, params, tables)
                        updates, opt_state = self.optimizer.update(
                            grads, opt_state, params)
                        params = optax.apply_updates(params, updates)
                        return params, opt_state, metrics

                    return jax.lax.fori_loop(0, count, inner, carry)

                n_outer, rem = divmod(iters, gather_every)

                def outer(o, carry):
                    return run_block(o * gather_every, gather_every, carry)

                carry = jax.lax.fori_loop(
                    0, n_outer, outer, (params, opt_state, zero_metrics))
                if rem:
                    carry = run_block(n_outer * gather_every, rem, carry)
                return carry

            if prefetch == 0:
                def step(i, carry):
                    params, opt_state, _ = carry
                    grads, metrics = grads_and_metrics(i, params, None)
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, metrics

                return jax.lax.fori_loop(0, iters, step,
                                         (params, opt_state, zero_metrics))

            def step(i, carry):
                params, opt_state, tables, pgrads, _ = carry
                tables_next = self._gather_plane_tables(params)
                grads, metrics = grads_and_metrics(i, params, tables)
                if prefetch >= 2:
                    apply_grads, pgrads = pgrads, grads
                else:
                    apply_grads = grads
                updates, opt_new = self.optimizer.update(
                    apply_grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                if prefetch >= 2:
                    # iteration 0 has no delayed grads yet — skip its
                    # optimizer step (cheap scalar select) so the run
                    # performs exactly `iters` real Adam updates
                    keep = i > 0
                    sel = lambda a, b: jnp.where(keep, a, b)
                    params = jax.tree.map(sel, new_params, params)
                    opt_state = jax.tree.map(sel, opt_new, opt_state)
                else:
                    params, opt_state = new_params, opt_new
                return params, opt_state, tables_next, pgrads, metrics

            tables0 = self._gather_plane_tables(params)
            zero_grads = jax.tree.map(jnp.zeros_like, params)
            params, opt_state, _, pgrads, metrics = jax.lax.fori_loop(
                0, iters, step,
                (params, opt_state, tables0, zero_grads, zero_metrics))
            if prefetch >= 2:
                # trailing apply of the last iteration's (delayed) grads
                updates, opt_state = self.optimizer.update(
                    pgrads, opt_state, params)
                params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return body

    def _optimize_row_sharded(self, state, cur_frame, cur_pose, key, iters,
                              use_cur):
        """The ZeRO-style optimize: one shard_map program with EXPLICIT
        collectives (round 4 — GSPMD given the equivalent
        with_sharding_constraint seams multiplied the gathers ~2-4x and
        replicated the backward scatter values; see
        parallel/mesh.make_row_sharded_pack). Per device and iteration:

          fwd:  pack the LOCAL row block (1-y-row halo exchange) ->
                all-gather the PACKED blocks -> render the LOCAL ray shard
                (psum-aware losses). Packing before the gather costs 4x
                the ICI payload but saves ~4.7 ms/iter of full-size pack
                per device (tools/prof_zero5.py, round 4).
          bwd:  local scatter of the ray shard's corner cotangents ->
                reduce-scatter (packed, fold=after; raw, fold=before) ->
                row-local fold -> row-local Adam.

        Plane params and Adam moments live as flat row-major blocks sharded
        over all mesh axes; decoder grads psum. Numerically equal to the
        unsharded path (identical ray batches from the same key stream;
        tests/test_parallel.py::test_row_sharded_mapper_matches_unsharded)."""
        from jax.sharding import PartitionSpec as P


        H, W = cur_frame["depth"].shape
        dir_flat = cur_frame["direction"].reshape(-1, 3)
        rgb_flat = cur_frame["rgb"].reshape(-1, 3)
        d_flat = cur_frame["depth"].reshape(-1)

        axes = self.shard_axes
        params0 = self._shard_plane_state(state.params)
        opt0 = self._shard_plane_state(state.opt_state)

        def spec_of(tree):
            return jax.tree_util.tree_map_with_path(
                lambda p, l: (P(axes) if self._plane_leaf_addr(p) is not None
                              and hasattr(l, "ndim") and l.ndim == 2 else P()),
                tree)

        body = self._make_row_body(H, W, iters, use_cur)

        smap = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(spec_of(params0), spec_of(opt0), P(), P(), P(), P(),
                      P(), P(), P()),
            out_specs=(spec_of(params0), spec_of(opt0), P()),
            check_vma=False)
        params, opt_state, metrics = smap(
            params0, opt0, state.db, state.kf_poses, dir_flat, rgb_flat,
            d_flat, cur_pose, key)
        params = self._unshard_plane_state(params)
        opt_state = self._unshard_plane_state(opt_state)
        return state._replace(params=params, opt_state=opt_state), metrics

    @partial(jax.jit, static_argnames=("self",))
    def add_keyframe(
        self,
        state: MapperState,
        frame_id: jax.Array,
        cur_frame: Dict[str, jax.Array],
        cur_pose: jax.Array,
        key: jax.Array,
    ) -> MapperState:
        db = kf_lib.add_keyframe(
            state.db, key, frame_id,
            cur_frame["direction"], cur_frame["rgb"], cur_frame["depth"],
            filter_depth=bool(self.config["mapping"].get("filter_depth", False)),
            depth_trunc=float(self.config["cam"]["depth_trunc"]),
        )
        kf_poses = jax.lax.dynamic_update_index_in_dim(
            state.kf_poses, cur_pose, state.db.count, axis=0
        )
        return state._replace(db=db, kf_poses=kf_poses)

    def update_kf_pose(self, state: MapperState, slot: jax.Array, pose: jax.Array) -> MapperState:
        """Refresh a keyframe slot pose (tracking updates / loop closure)."""
        return state._replace(
            kf_poses=jax.lax.dynamic_update_index_in_dim(state.kf_poses, pose, slot, axis=0)
        )

    # ------------------------------------------------------------------

    def first_frame_mapping(
        self, state: MapperState, frame: Dict, pose: jax.Array, key: jax.Array,
        iters: Optional[int] = None,
    ) -> Tuple[MapperState, Dict]:
        """First-frame bootstrap (mapper.py:52-116): add the keyframe, then
        optimize hard with current-frame rays only."""
        iters = iters if iters is not None else int(self.config["mapping"]["first_iters"])
        k1, k2 = jax.random.split(key)
        state = self.add_keyframe(state, jnp.asarray(frame["frame_id"]), frame, pose, k1)
        state, metrics = self.optimize(state, frame, pose, k2, iters=iters, use_cur=True)
        return state, metrics
