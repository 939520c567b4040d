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
                 mesh=None, shard_plane_rows: bool = False):
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
        reduce/fold over table rows (ZeRO-style). Per iteration the packed
        corner tables are all-gathered for the forward's random row
        gathers (`parallel.mesh.gather_table_rows`), and the backward's
        packed cotangents reduce-scatter so the dense `pack_corners`
        adjoint fold and Adam run on 1/N of the table per device — the
        table-sized backward terms that do NOT shrink with the ray shard
        (BASELINE.md round-3 ray-sharding measurement: they dominate the
        per-device cost at rays/8)."""
        self.config = config
        self.scene = scene
        self.num_kf = num_kf
        self.rays_per_kf = rays_per_kf
        self.optimizer = make_optimizer(config)
        self.mesh = mesh
        self.shard_rows = bool(shard_plane_rows) and mesh is not None
        self.n_global = int(config["mapping"]["sample"])
        self.n_cur = int(config["mapping"]["min_pixels_cur"])
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
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
        return int(np.prod(list(self.mesh.shape.values())))

    @property
    def _plane_shape_set(self):
        shapes = {tuple(s[name]) for s in self.scene.plane_shapes
                  for name in ("xy", "xz", "yz")}
        if not self.scene.one_grid:
            shapes |= {tuple(s[name]) for s in self.scene.c_plane_shapes
                       for name in ("xy", "xz", "yz")}
        return shapes

    def _pad_h(self, H: int) -> int:
        n = self._n_dev
        return (H + n - 1) // n * n

    @property
    def _padded_shape_map(self):
        """padded (C, H', W) -> true (C, H, W) for every plane leaf."""
        return {(C, self._pad_h(H), W): (C, H, W)
                for (C, H, W) in self._plane_shape_set}

    def _shard_plane_state(self, tree):
        """Entering `optimize` under shard_plane_rows: pad each plane-shaped
        leaf (params or Adam moments) along grid axis H to a device-count
        multiple (the nested fine grid is k*(coarse-1)+1 rows — always odd)
        and pin it row-sharded. The dead rows carry zero gradients and zero
        moments, so the pad/unpad round trip is exact. Params stay unpadded
        and replicated AT REST (every other consumer — renderer, mesher,
        checkpointing, fusion — sees the ordinary layout); the padded
        sharded layout lives only inside the compiled optimization loop."""
        from ..parallel import mesh as mesh_lib

        shapes = self._plane_shape_set
        shard = mesh_lib.row_sharding(self.mesh, ndim=3, axis=1)

        def f(leaf):
            if (hasattr(leaf, "ndim") and leaf.ndim == 3
                    and tuple(leaf.shape) in shapes):
                C, H, W = leaf.shape
                Hp = self._pad_h(H)
                if Hp != H:
                    leaf = jnp.pad(leaf, ((0, 0), (0, Hp - H), (0, 0)))
                return jax.lax.with_sharding_constraint(leaf, shard)
            return leaf

        return jax.tree.map(f, tree)

    def _unshard_plane_state(self, tree):
        """Leaving `optimize`: slice the pad rows back off."""
        pmap = {k: v for k, v in self._padded_shape_map.items() if k != v}

        def f(leaf):
            if (hasattr(leaf, "ndim") and leaf.ndim == 3
                    and tuple(leaf.shape) in pmap):
                return leaf[:, :pmap[tuple(leaf.shape)][1]]
            return leaf

        return jax.tree.map(f, tree)

    def _packed_params(self, params):
        """Swap (padded, row-sharded) plane leaves for all-gathered
        `PackedPlane` tables — the replicate-fwd/shard-bwd seam of the
        row-sharded path (parallel/mesh.gather_table_rows)."""
        from ..ops import interp
        from ..parallel import mesh as mesh_lib

        pmap = self._padded_shape_map
        gather = mesh_lib.gather_table_rows(self.mesh)
        # under render_dtype: bfloat16 cast BEFORE pack so the all-gather /
        # gradient reduction move half the bytes (numerically identical to
        # the cast scene.forward would apply after the gather; the bf16
        # gradient reduction matches the single-chip bf16 path, which folds
        # and scatters in bf16 too)
        cdt = self.scene.compute_dtype

        def one(pl):
            shape = pmap.get(tuple(pl.shape), tuple(pl.shape))
            if shape != tuple(pl.shape):
                pl = pl[:, :shape[1]]              # drop sharding pad rows
            if pl.dtype != cdt:
                pl = pl.astype(cdt)
            return interp.PackedPlane(gather(interp.pack_corners(pl)), shape)

        def pack(planes):
            return {name: [one(pl) for pl in planes[name]]
                    for name in ("xy", "xz", "yz")}

        out = dict(params)
        out["planes"] = pack(params["planes"])
        if "c_planes" in params:
            out["c_planes"] = pack(params["c_planes"])
        return out

    # ------------------------------------------------------------------

    def _loss_fn(self, params, rays_o, rays_d, target_rgb, target_d, key):
        if self.shard_rows:
            params = self._packed_params(params)
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
        H, W = cur_frame["depth"].shape
        dir_flat = cur_frame["direction"].reshape(-1, 3)
        rgb_flat = cur_frame["rgb"].reshape(-1, 3)
        d_flat = cur_frame["depth"].reshape(-1)

        def step(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, i)
            k_db, k_cur, k_render = jax.random.split(k, 3)

            g_rays, slot_ids = kf_lib.sample_global_rays(state.db, k_db, self.n_global)
            g_poses = state.kf_poses[slot_ids]                      # [n, 4, 4]
            g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3], g_poses)
            g_rgb, g_depth = g_rays[:, 3:6], g_rays[:, 6]

            if use_cur:
                idx = jax.random.randint(k_cur, (self.n_cur,), 0, H * W)
                c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], cur_pose)
                rays_o = jnp.concatenate([g_o, c_o], axis=0)
                rays_d = jnp.concatenate([g_d, c_d], axis=0)
                target_rgb = jnp.concatenate([g_rgb, rgb_flat[idx]], axis=0)
                target_d = jnp.concatenate([g_depth, d_flat[idx]], axis=0)[:, None]
            else:
                rays_o, rays_d = g_o, g_d
                target_rgb, target_d = g_rgb, g_depth[:, None]
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
        params0, opt_state0 = state.params, state.opt_state
        if self.shard_rows:
            params0 = self._shard_plane_state(params0)
            opt_state0 = self._shard_plane_state(opt_state0)
        params, opt_state, metrics = jax.lax.fori_loop(
            0, iters, step, (params0, opt_state0, zero_metrics)
        )
        if self.shard_rows:
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
