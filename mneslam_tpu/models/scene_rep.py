"""Tri-plane neural scene representation with SDF volume rendering.

TPU-native rebuild of the reference's `JointEncoding`
(`/root/reference/model/scene_rep.py:15-611`): ESLAM-style coarse+fine
tri-plane feature grids + Co-SLAM OneBlob positional encoding + tiny
SDF/color MLPs, rendered by truncation-windowed SDF->weight compositing
with depth-guided stratified sampling, trained by the combined
rgb/depth/free-space/SDF loss suite.

TPU-first design: the model is a pure function of a params pytree; one
`forward` call over a static `[n_rays, n_samples]` batch traces to a single
XLA program — plane gathers fuse with the decoder matmuls (MXU) and the
compositing (VPU). No chunking loops in the hot path; full-image rendering
uses `lax.map` over fixed-size ray chunks.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encodings, interp
from . import decoder as decoder_lib

import os

# "packed" (default): one pack_corners row gather per point per plane (per
#   level) — fastest measured variant (16.5 ms/iter at Replica shapes).
# "merged": ONE row gather per point per plane ORIENTATION — the nested
#   fine grid lets the coarse level upsample bilinear-exactly onto it and
#   both levels' corner tables fuse into one [H*W, 8C] table, halving the
#   gather/scatter index count. MEASURED SLOWER on v5e (24.0 ms/iter): the
#   per-iteration dense upsample+concat+pack traffic (~0.5 GB/orientation)
#   outweighs the index savings. Kept (correct + tested) for hardware where
#   gathers dominate harder.
# "rows": four per-corner row gathers (the pre-pack baseline, 42.3 ms/iter).
_PLANE_SAMPLER = os.environ.get("MNESLAM_PLANE_SAMPLER", "packed")


def _plane_shapes(bound: np.ndarray, resolutions, c_dim: int,
                  nested: bool = True):
    """Per-level (xy, xz, yz) plane shapes, mirroring the reference's
    resolution computation (scene_rep.py:104-109): n_axis = int(len/res),
    planes store [C, rows, cols] with rows/cols per the grid_sample pairing
    (xy: [ny, nx], xz: [nz, nx], yz: [nz, ny]).

    With `nested` (default), level-1 node counts snap to k*(n0-1)+1 where
    k = round(res0/res1) >= 2, so fine cells evenly subdivide coarse cells
    (at most one node off the reference's int(len/res)) — the precondition
    for the fused "merged" sampler."""
    xyz_len = bound[:, 1] - bound[:, 0]
    shapes = []
    k = max(2, int(round(resolutions[0] / max(resolutions[1], 1e-9)))) \
        if len(resolutions) == 2 else 0
    for lvl, res in enumerate(resolutions):
        nx, ny, nz = (int(l / res) for l in xyz_len)
        nx, ny, nz = max(nx, 2), max(ny, 2), max(nz, 2)
        if nested and lvl == 1:
            c = shapes[0]
            nx = k * (c["xy"][2] - 1) + 1
            ny = k * (c["xy"][1] - 1) + 1
            nz = k * (c["xz"][1] - 1) + 1
        shapes.append({
            "xy": (c_dim, ny, nx),
            "xz": (c_dim, nz, nx),
            "yz": (c_dim, nz, ny),
        })
    return shapes


class SceneRep:
    """Static configuration + pure apply functions over a params pytree.

    Params layout:
      {"planes": {"xy": [lvl...], "xz": [...], "yz": [...]},
       "c_planes": {...}            # only when grid.oneGrid == False
       "decoder": {"sdf": [...], "color": [...]}}
    """

    def __init__(self, config):
        self.config = config
        # bounding_box = raw mapping bound (used for [0,1] normalization of
        # the positional encoding); bound = dividable-adjusted copy (used
        # for [-1,1] plane coords) — mneslam_mp.py:219-224 / scene_rep.py:72-83.
        bb = np.array(config["mapping"]["bound"], dtype=np.float32) * config["scale"]
        self.bounding_box = jnp.asarray(bb)
        div = config["planes_res"]["bound_dividable"]
        bound = bb.copy()
        bound[:, 1] = (np.floor((bound[:, 1] - bound[:, 0]) / div) + 1) * div + bound[:, 0]
        self.bound = jnp.asarray(bound)

        self.one_grid = bool(config["grid"]["oneGrid"])
        c_dim = config["model"]["c_dim"]
        self.plane_shapes = _plane_shapes(
            bound, [config["planes_res"]["coarse"], config["planes_res"]["fine"]], c_dim
        )
        if not self.one_grid:
            self.c_plane_shapes = _plane_shapes(
                bound, [config["c_planes_res"]["coarse"], config["c_planes_res"]["fine"]], c_dim
            )

        self.pos_encode, self.input_ch_pos = encodings.get_encoder(
            config["pos"]["enc"], n_bins=config["pos"]["n_bins"]
        )
        self.input_ch = c_dim * len(self.plane_shapes)

        tr = config["training"]
        self.trunc = float(tr["trunc"])
        self.sc_factor = float(config["data"]["sc_factor"])
        self.near, self.far = float(config["cam"]["near"]), float(config["cam"]["far"])
        self.n_range_d = int(tr["n_range_d"])
        self.range_d = float(tr["range_d"])
        self.n_samples_d = int(tr["n_samples_d"])
        self.n_samples = int(tr["n_samples"])
        self.n_importance = int(tr.get("n_importance", 0))
        self.perturb = float(tr["perturb"]) > 0.0
        self.white_bkgd = bool(tr["white_bkgd"])
        self.truncation_model = float(config["model"]["truncation"])
        self.depth_trunc = float(config["cam"]["depth_trunc"])
        # mixed precision: run plane features + decoders in bf16 (params and
        # losses stay fp32) — halves the render path's bandwidth on TPU
        self.compute_dtype = (
            jnp.bfloat16 if str(tr.get("render_dtype", "float32")) == "bfloat16"
            else jnp.float32
        )

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def init_params(self, key) -> Dict:
        keys = jax.random.split(key, 3)

        def init_planes(k, shapes):
            out = {"xy": [], "xz": [], "yz": []}
            for lvl, s in enumerate(shapes):
                for name in ("xy", "xz", "yz"):
                    k, sub = jax.random.split(k)
                    out[name].append(0.01 * jax.random.normal(sub, s[name]))
            return out

        params = {
            "planes": init_planes(keys[0], self.plane_shapes),
            "decoder": decoder_lib.init_decoder(keys[1], self.config),
        }
        if not self.one_grid:
            params["c_planes"] = init_planes(keys[2], self.c_plane_shapes)
        return params

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def _normalize(self, pts: jax.Array) -> jax.Array:
        """World points -> [-1, 1] plane coords (model/utils.py:27-41)."""
        lo, hi = self.bound[:, 0], self.bound[:, 1]
        return (pts - lo) / (hi - lo) * 2.0 - 1.0

    def _normalize01(self, pts: jax.Array) -> jax.Array:
        """World points -> [0, 1] for the positional encoding."""
        lo, hi = self.bounding_box[:, 0], self.bounding_box[:, 1]
        return (pts - lo) / (hi - lo)

    def plane_features(self, planes: Dict, p_nor: jax.Array) -> jax.Array:
        """Sample tri-planes at normalized coords [N, 3] -> [N, levels*C].

        Per level: bilinear(xy) + bilinear(xz) + bilinear(yz), levels
        concatenated — ESLAM's summation scheme (scene_rep.py:28-53).

        TPU note: each plane is `pack_corners`-ed so every sample point
        needs ONE row gather of all 4 bilinear corners instead of 4 — the
        XLA gather floor on v5e is ~18 ns per index regardless of row
        width, so this is a ~4x cut on the mapping hot path (the pack is
        dense shifted copies, amortized over ~1e5 gathers per step).
        Tried and rejected earlier: one fused gather over a concatenated
        multi-plane table (6x slower — more indices, lost inter-op
        overlap), [2,2,C] slab dynamic_slice per point (60x slower), bf16
        tables (no gain). Set MNESLAM_PLANE_SAMPLER=rows for the plain
        4-gather path.
        """
        return jnp.concatenate(self.plane_feature_blocks(planes, p_nor), axis=-1)

    def plane_feature_blocks(self, planes: Dict, p_nor: jax.Array) -> list:
        """Per-level feature blocks [N, C] (no lane-dim concat).

        The mapping hot path feeds these straight into the decoder's
        block-matmul first layer (decoder.mlp_apply_blocks): concatenating
        [N, C] gather outputs along the minor/lane dimension costs ~11 ms
        per step at 92k points in fwd+bwd relayouts (prof_mapping10)."""
        if _PLANE_SAMPLER == "merged" and self._mergeable(planes):
            merged = self._plane_features_merged(planes, p_nor)
            C = planes["xy"][0].shape[0]
            return [merged[:, :C], merged[:, C:]]
        if _PLANE_SAMPLER == "rows":
            sample = interp.grid_sample_2d
        else:
            # packed one-gather-per-point sampler with the manual VJP
            # (ops/interp.sample_plane_packed) — the autodiff backward of
            # the packed path was the mapping hot spot (prof_mapping9)
            sample = interp.sample_plane_packed

        def sample_any(pl, uv):
            # row-sharded mapping path: leaves may be pre-packed tables
            # whose cotangent is the raw packed scatter (interp.PackedPlane)
            if isinstance(pl, interp.PackedPlane):
                return interp.sample_packed_table(pl.packed, uv, pl.shape)
            return sample(pl, uv)

        feats = []
        for lvl in range(len(planes["xy"])):
            xy = sample_any(planes["xy"][lvl], p_nor[:, [0, 1]])
            xz = sample_any(planes["xz"][lvl], p_nor[:, [0, 2]])
            yz = sample_any(planes["yz"][lvl], p_nor[:, [1, 2]])
            feats.append(xy + xz + yz)
        return feats

    @staticmethod
    def _mergeable(planes: Dict) -> bool:
        """Two levels whose grids nest (fine = k*(coarse-1)+1 nodes)."""
        if len(planes["xy"]) != 2:
            return False
        if any(isinstance(pl, interp.PackedPlane)
               for lst in planes.values() for pl in lst):
            return False
        for name in ("xy", "xz", "yz"):
            c, f = planes[name][0].shape, planes[name][1].shape
            if (f[1] - 1) % (c[1] - 1) or (f[2] - 1) % (c[2] - 1):
                return False
            if (f[1] - 1) // (c[1] - 1) != (f[2] - 1) // (c[2] - 1):
                return False
        return True

    def _plane_features_merged(self, planes: Dict, p_nor: jax.Array) -> jax.Array:
        """Fused two-level sampling: the coarse plane is exactly upsampled
        onto the (nested) fine grid, both levels' corner tables concatenate
        channel-wise, and each point needs ONE [8C]-row gather per plane
        orientation instead of two — bit-equal to the per-level path up to
        fp rounding (upsample_exact), verified in tests/test_scene_rep.py.
        Halves the hot path's gather (fwd) and scatter (bwd) index count;
        the upsample/pack are dense, MXU/VPU-friendly ops."""
        feats = None
        for name, dims in (("xy", (0, 1)), ("xz", (0, 2)), ("yz", (1, 2))):
            coarse, fine = planes[name][0], planes[name][1]
            k = (fine.shape[1] - 1) // (coarse.shape[1] - 1)
            up = interp.upsample_exact(coarse, k)
            comb = jnp.concatenate([up, fine], axis=0)          # [2C, Hf, Wf]
            g = interp.grid_sample_2d_packed(
                interp.pack_corners(comb), comb.shape,
                p_nor[:, list(dims)])                           # [N, 2C]
            feats = g if feats is None else feats + g
        return feats

    def query_color_sdf(self, params: Dict, pts: jax.Array) -> jax.Array:
        """World points [N, 3] -> raw [N, 4] (rgb logits, sdf)."""
        if self.compute_dtype != jnp.float32:
            params = jax.tree.map(lambda x: x.astype(self.compute_dtype), params)
            pts = pts.astype(self.compute_dtype)
        p_nor = self._normalize(pts)
        embed = self.plane_feature_blocks(params["planes"], p_nor)
        embed_pos = self.pos_encode(self._normalize01(pts)).astype(embed[0].dtype)
        embed_color = None
        if not self.one_grid:
            embed_color = self.plane_feature_blocks(params["c_planes"], p_nor)
        raw = decoder_lib.decoder_apply(params["decoder"], embed, embed_pos, embed_color)
        return raw.astype(jnp.float32)

    def query_sdf(self, params: Dict, pts: jax.Array) -> jax.Array:
        """World points [..., 3] -> sdf [...]."""
        flat = pts.reshape(-1, 3)
        raw = self.query_color_sdf(params, flat)
        return raw[..., 3].reshape(pts.shape[:-1])

    def query_color(self, params: Dict, pts: jax.Array) -> jax.Array:
        flat = pts.reshape(-1, 3)
        raw = self.query_color_sdf(params, flat)
        return jax.nn.sigmoid(raw[..., :3]).reshape(*pts.shape[:-1], 3)

    def query_plane_feature_grid(self, params: Dict, pts: jax.Array) -> jax.Array:
        """Raw plane features (pre-MLP), for the TV smoothness loss
        (mneslam_mp.py:375-397 queries with embed=True)."""
        flat = pts.reshape(-1, 3)
        emb = self.plane_features(params["planes"], self._normalize(flat))
        return emb.reshape(*pts.shape[:-1], emb.shape[-1])

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------

    def sdf2weights(self, sdf: jax.Array, z_vals: jax.Array) -> jax.Array:
        """Truncation-windowed SDF -> normalized compositing weights.

        sigmoid(s/tr)*sigmoid(-s/tr), zeroed behind the first zero
        crossing + truncation band, renormalized (scene_rep.py:183-203).
        """
        weights = jax.nn.sigmoid(sdf / self.trunc) * jax.nn.sigmoid(-sdf / self.trunc)
        signs = sdf[:, 1:] * sdf[:, :-1]
        mask = (signs < 0.0).astype(sdf.dtype)
        inds = jnp.argmax(mask, axis=1)
        z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)
        band = (z_vals < z_min + self.sc_factor * self.trunc).astype(sdf.dtype)
        weights = weights * band
        return weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-8)

    def raw2outputs(self, raw: jax.Array, z_vals: jax.Array):
        """Composite raw [R, S, 4] along rays (scene_rep.py:205-230)."""
        rgb = jax.nn.sigmoid(raw[..., :3])
        weights = self.sdf2weights(raw[..., 3], z_vals)
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
        depth_map = jnp.sum(weights * z_vals, axis=-1)
        depth_var = jnp.sum(weights * jnp.square(z_vals - depth_map[..., None]), axis=-1)
        acc_map = jnp.sum(weights, axis=-1)
        disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))
        if self.white_bkgd:
            rgb_map = rgb_map + (1.0 - acc_map[..., None])
        return rgb_map, disp_map, acc_map, weights, depth_map, depth_var

    def render_surface_color(self, params: Dict, points: jax.Array,
                             normal: jax.Array) -> jax.Array:
        """Color at surface points by compositing along the normal
        (scene_rep.py:333-349): z in [-trunc, trunc] around each point."""
        n_rays = points.shape[0]
        z_vals = jnp.broadcast_to(
            jnp.linspace(-self.trunc, self.trunc, self.n_range_d),
            (n_rays, self.n_range_d))
        pts = points[:, None, :] + normal[:, None, :] * z_vals[..., None]
        raw = self.query_color_sdf(params, pts.reshape(-1, 3)).reshape(
            n_rays, self.n_range_d, 4)
        rgb_map, *_ = self.raw2outputs(raw, z_vals)
        return rgb_map

    @staticmethod
    def _block_uniform(key, n_rays: int, width: int, rng_block):
        """Per-ray uniforms that are slice-consistent under ray sharding:
        with rng_block=(n_total, offset) every shard draws the FULL
        [n_total, width] stream from the same key and slices its block, so
        sharded rays see exactly the randoms the unsharded batch would
        (the row-sharded mapper's equality contract). rng_block=None is the
        plain draw."""
        if rng_block is None:
            return jax.random.uniform(key, (n_rays, width))
        n_total, offset = rng_block
        full = jax.random.uniform(key, (int(n_total), width))
        return jax.lax.dynamic_slice_in_dim(full, offset, n_rays, axis=0)

    def sample_pdf(self, bins: jax.Array, weights: jax.Array, n_importance: int,
                   key: Optional[jax.Array] = None, rng_block=None) -> jax.Array:
        """Inverse-CDF importance sampling (model/utils.py:65-104).

        bins [R, B], weights [R, B] -> samples [R, n_importance]; stratified
        when no key given (det=True), uniform-random otherwise.
        """
        weights = weights + 1e-5
        pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B+1]

        R = cdf.shape[0]
        if key is None:
            u = jnp.linspace(0.5 / n_importance, 1.0 - 0.5 / n_importance, n_importance)
            u = jnp.broadcast_to(u, (R, n_importance))
        else:
            u = self._block_uniform(key, R, n_importance, rng_block)

        idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
        below = jnp.maximum(idx - 1, 0)
        above = jnp.minimum(idx, cdf.shape[-1] - 1)
        cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
        cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
        bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
        bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)
        denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        t = (u - cdf_b) / denom
        return bins_b + t * (bins_a - bins_b)

    def sample_z_vals(
        self, target_d: jax.Array, n_rays: int, key: Optional[jax.Array],
        rng_block=None,
    ) -> jax.Array:
        """Depth-guided stratified sampling (scene_rep.py:361-381).

        n_range_d samples in [d - range_d, d + range_d] (rays with invalid
        depth fall back to [near, far]), plus n_samples_d uniform samples,
        sorted; optional per-bin perturbation.
        """
        t = target_d.reshape(n_rays, 1)
        z_near = jnp.linspace(-self.range_d, self.range_d, self.n_range_d)
        z_around = z_near[None, :] + t
        z_fallback = jnp.broadcast_to(
            jnp.linspace(self.near, self.far, self.n_range_d), (n_rays, self.n_range_d)
        )
        z_samples = jnp.where(t <= 0, z_fallback, z_around)

        if self.n_samples_d > 0:
            z_uniform = jnp.broadcast_to(
                jnp.linspace(self.near, self.far, self.n_samples_d),
                (n_rays, self.n_samples_d),
            )
            z_vals = jnp.sort(jnp.concatenate([z_uniform, z_samples], axis=-1), axis=-1)
        else:
            z_vals = z_samples

        if self.perturb and key is not None:
            mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
            upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
            lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
            u = self._block_uniform(key, n_rays, z_vals.shape[1], rng_block)
            z_vals = lower + (upper - lower) * u
        return z_vals

    def render_rays(
        self,
        params: Dict,
        rays_o: jax.Array,
        rays_d: jax.Array,
        target_d: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        rng_block=None,
    ) -> Dict[str, jax.Array]:
        """Render a static-size batch of rays [R, 3] -> outputs dict.

        `rng_block=(n_total, offset)`: this batch is a contiguous shard of
        a larger one — per-ray randoms are drawn for the full batch and
        sliced, so sharded rendering matches unsharded bit-for-bit."""
        n_rays = rays_o.shape[0]
        if target_d is None:
            z_vals = jnp.broadcast_to(
                jnp.linspace(self.near, self.far, self.n_samples), (n_rays, self.n_samples)
            )
            if self.perturb and key is not None:
                mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
                upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
                lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
                u = self._block_uniform(key, n_rays, z_vals.shape[1], rng_block)
                z_vals = lower + (upper - lower) * u
        else:
            z_vals = self.sample_z_vals(target_d, n_rays, key, rng_block=rng_block)

        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]  # [R, S, 3]
        raw = self.query_color_sdf(params, pts.reshape(-1, 3)).reshape(
            n_rays, z_vals.shape[1], 4
        )
        rgb_map, disp_map, acc_map, weights, depth_map, depth_var = self.raw2outputs(raw, z_vals)

        ret = {}
        if self.n_importance > 0:
            # hierarchical resampling (scene_rep.py:389-417)
            ret.update(rgb0=rgb_map, disp0=disp_map, acc0=acc_map,
                       depth0=depth_map, depth_var0=depth_var)
            z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
            k_imp = None if key is None else jax.random.fold_in(key, 777)
            z_samples = jax.lax.stop_gradient(
                self.sample_pdf(z_mid, weights[:, 1:-1], self.n_importance,
                                key=k_imp if self.perturb else None,
                                rng_block=rng_block))
            z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
            raw = self.query_color_sdf(params, pts.reshape(-1, 3)).reshape(
                n_rays, z_vals.shape[1], 4)
            rgb_map, disp_map, acc_map, weights, depth_map, depth_var = \
                self.raw2outputs(raw, z_vals)

        ret.update({
            "rgb": rgb_map,
            "depth": depth_map,
            "disp_map": disp_map,
            "acc_map": acc_map,
            "depth_var": depth_var,
            "z_vals": z_vals,
            "raw": raw,
            "weights": weights,
        })
        return ret

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------

    @staticmethod
    def _psum(x, axis_name):
        """Scalar sum of `x`, globalized over `axis_name` when the caller
        runs as a shard_map ray shard (the row-sharded mapper). With
        axis_name=None this is a plain sum — the single-device semantics."""
        s = jnp.sum(x)
        return s if axis_name is None else jax.lax.psum(s, axis_name)

    def _pmean(self, x, axis_name):
        """Global mean: psum of the local sum over psum of the local size.
        Exact for the mapper's ray shards (ray counts are padded to a
        device-count multiple, so every shard has equal size)."""
        if axis_name is None:
            return jnp.mean(x)
        n = self._psum(jnp.full((), x.size, x.dtype), axis_name)
        return self._psum(x, axis_name) / n

    def co_sdf_losses(self, z_vals, target_d, sdf, axis_name=None):
        """Co-SLAM free-space + sdf losses (model/utils.py:117-185):
        full-tensor MSE with mask-as-weight times the count-balance weights.
        `axis_name`: mesh axes to reduce over when rays are sharded — the
        count-balance weights and means are then computed over the GLOBAL
        ray batch, so the sharded loss equals the unsharded one."""
        truncation = self.trunc * self.sc_factor
        t = target_d.reshape(-1, 1)
        front_mask = (z_vals < (t - truncation)).astype(z_vals.dtype)
        back_mask = (z_vals > (t + truncation)).astype(z_vals.dtype)
        depth_mask = (t > 0.0).astype(z_vals.dtype)
        sdf_mask = (1.0 - front_mask) * (1.0 - back_mask) * depth_mask

        num_fs = self._psum(front_mask, axis_name)
        num_sdf = self._psum(sdf_mask, axis_name)
        num = jnp.maximum(num_fs + num_sdf, 1.0)
        fs_weight = 1.0 - num_fs / num
        sdf_weight = 1.0 - num_sdf / num

        fs_loss = self._pmean(
            jnp.square(sdf * front_mask - front_mask), axis_name) * fs_weight
        sdf_loss = self._pmean(
            jnp.square((z_vals + sdf * truncation) * sdf_mask - t * sdf_mask),
            axis_name) * sdf_weight
        return fs_loss, sdf_loss

    def eslam_sdf_losses(self, z_vals, target_d, sdf, axis_name=None):
        """ESLAM three-band losses (scene_rep.py:475-511) as masked means
        (boolean indexing -> sum/count for static shapes). Rays with invalid
        depth are excluded via the depth mask. `axis_name` globalizes the
        masked means over sharded ray batches."""
        tr = self.truncation_model
        t = target_d.reshape(-1, 1)
        ray_valid = (t.reshape(-1) > 0).astype(z_vals.dtype)[:, None]

        front = (z_vals < (t - tr)).astype(z_vals.dtype) * ray_valid
        back = (z_vals > (t + tr)).astype(z_vals.dtype) * ray_valid
        center = (
            (z_vals > (t - 0.4 * tr)) & (z_vals < (t + 0.4 * tr))
        ).astype(z_vals.dtype) * ray_valid
        tail = (1 - front) * (1 - back) * (1 - center) * ray_valid

        def masked_mean(x, m):
            return self._psum(x * m, axis_name) / jnp.maximum(
                self._psum(m, axis_name), 1.0)

        fs_loss = masked_mean(jnp.square(sdf - 1.0), front)
        est_d = z_vals + sdf * tr
        center_loss = masked_mean(jnp.square(est_d - t), center)
        tail_loss = masked_mean(jnp.square(est_d - t), tail)
        return fs_loss, center_loss, tail_loss

    def forward(
        self,
        params: Dict,
        rays_o: jax.Array,
        rays_d: jax.Array,
        target_rgb: jax.Array,
        target_d: jax.Array,
        key: Optional[jax.Array] = None,
        axis_name=None,
        rng_block=None,
    ) -> Dict[str, jax.Array]:
        """Training forward: render + full loss dict (scene_rep.py:549-611).

        `axis_name`: mesh axis name(s) when rays_o/… are the local shard of
        a sharded ray batch (the shard_map row-sharded mapper) — every loss
        reduction is then psum-globalized so the returned losses equal the
        unsharded batch's values on every device. `rng_block=(n_total,
        offset)` makes the per-ray sampling randomness slice-consistent
        with the unsharded batch."""
        rend = self.render_rays(params, rays_o, rays_d, target_d=target_d,
                                key=key, rng_block=rng_block)

        t = target_d.reshape(-1)
        valid_depth = ((t > 0.0) & (t < self.depth_trunc)).astype(rays_o.dtype)
        n_valid = jnp.maximum(self._psum(valid_depth, axis_name), 1.0)

        rgb_loss = self._pmean(jnp.square(rend["rgb"] - target_rgb), axis_name)
        psnr = -10.0 * jnp.log(jnp.maximum(rgb_loss, 1e-12)) / jnp.log(10.0)
        depth_loss = self._psum(
            jnp.square(rend["depth"] - t) * valid_depth, axis_name) / n_valid
        if "rgb0" in rend:  # coarse-pass losses (scene_rep.py:579-581)
            rgb_loss = rgb_loss + self._pmean(
                jnp.square(rend["rgb0"] - target_rgb), axis_name)
            depth_loss = depth_loss + self._psum(
                jnp.square(rend["depth0"] - t) * valid_depth, axis_name) / n_valid

        sdf = rend["raw"][..., 3]
        z_vals = rend["z_vals"]
        co_fs_loss, co_sdf_loss = self.co_sdf_losses(
            z_vals, target_d, sdf, axis_name=axis_name)
        e_fs_loss, e_center_loss, e_tail_loss = self.eslam_sdf_losses(
            z_vals, target_d, sdf, axis_name=axis_name)

        return {
            "rgb": rend["rgb"],
            "depth": rend["depth"],
            "rgb_loss": rgb_loss,
            "depth_loss": depth_loss,
            "co_sdf_loss": co_sdf_loss,
            "co_fs_loss": co_fs_loss,
            "e_fs_loss": e_fs_loss,
            "e_center_loss": e_center_loss,
            "e_tail_loss": e_tail_loss,
            "psnr": psnr,
        }

    def get_loss_from_ret(
        self, ret: Dict, rgb=True, sdf=True, depth=True, smooth_loss=None
    ) -> jax.Array:
        """Weighted total loss (mneslam_mp.py:350-372)."""
        tr = self.config["training"]
        # the reference keeps is_co_sdf at the config top level (§5.6)
        is_co = bool(self.config.get("is_co_sdf", tr.get("is_co_sdf", True)))
        loss = 0.0
        if rgb:
            loss += tr["rgb_weight"] * ret["rgb_loss"]
        if depth:
            loss += tr["depth_weight"] * ret["depth_loss"]
        if sdf:
            if is_co:
                loss += tr["sdf_weight"] * ret["co_sdf_loss"] + tr["fs_weight"] * ret["co_fs_loss"]
            else:
                mp = self.config["mapping"]
                loss += (
                    mp["w_sdf_fs"] * ret["e_fs_loss"]
                    + mp["w_sdf_center"] * ret["e_center_loss"]
                    + mp["w_sdf_tail"] * ret["e_tail_loss"]
                )
        if smooth_loss is not None:
            loss += tr["smooth_weight"] * smooth_loss
        return loss

    def smoothness(self, params: Dict, key: jax.Array, sample_points=32,
                   voxel_size=0.1, margin=0.05) -> jax.Array:
        """TV smoothness over a random sub-grid of plane features
        (mneslam_mp.py:375-397)."""
        lo = self.bounding_box[:, 0]
        hi = self.bounding_box[:, 1]
        grid_size = (sample_points - 1) * voxel_size
        offset_max = hi - lo - grid_size - 2 * margin
        k1, k2 = jax.random.split(key)
        offset = jax.random.uniform(k1, (3,)) * offset_max + margin
        n = sample_points - 1
        idx = jnp.stack(
            jnp.meshgrid(jnp.arange(n), jnp.arange(n), jnp.arange(n), indexing="ij"),
            axis=-1,
        ).astype(jnp.float32)
        pts = (idx + jax.random.uniform(k2, (1, 1, 1, 3))) * voxel_size + lo + offset
        feat = self.query_plane_feature_grid(params, pts)
        tv_x = jnp.sum(jnp.square(feat[1:] - feat[:-1]))
        tv_y = jnp.sum(jnp.square(feat[:, 1:] - feat[:, :-1]))
        tv_z = jnp.sum(jnp.square(feat[:, :, 1:] - feat[:, :, :-1]))
        return (tv_x + tv_y + tv_z) / (sample_points ** 3)

    # ------------------------------------------------------------------
    # full-image rendering
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "chunk"))
    def render_image_rays(
        self,
        params: Dict,
        rays_o: jax.Array,
        rays_d: jax.Array,
        target_d: Optional[jax.Array] = None,
        chunk: int = 4096,
    ) -> Tuple[jax.Array, jax.Array]:
        """Chunked whole-image render (scene_rep.py:422-473): pads the ray
        set to a multiple of `chunk` and lax.maps fixed-size batches so one
        compiled program serves any image size."""
        n = rays_o.shape[0]
        n_pad = (chunk - n % chunk) % chunk
        ro = jnp.concatenate([rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], axis=0)
        rd = jnp.concatenate([rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], axis=0)
        if target_d is not None:
            td = jnp.concatenate([target_d.reshape(-1), jnp.zeros((n_pad,))])
            td = td.reshape(-1, chunk)
        ro = ro.reshape(-1, chunk, 3)
        rd = rd.reshape(-1, chunk, 3)

        def body(args):
            if target_d is not None:
                o, d, t = args
                out = self.render_rays(params, o, d, target_d=t)
            else:
                o, d = args
                out = self.render_rays(params, o, d)
            return out["depth"], out["rgb"]

        args = (ro, rd, td) if target_d is not None else (ro, rd)
        depth, rgb = jax.lax.map(body, args)
        return depth.reshape(-1)[:n], rgb.reshape(-1, 3)[:n]
