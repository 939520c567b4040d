"""Bilinear grid sampling (the `F.grid_sample` workhorse of the tri-plane map).

TPU-native replacement for the torch `grid_sample(padding_mode='border',
align_corners=True)` calls in the reference's plane sampler
(`/root/reference/model/scene_rep.py:43-48`). Implemented as a gather-based
bilinear interpolation in pure JAX: XLA lowers the corner gathers to
dynamic-gathers, and the surrounding arithmetic fuses into the decoder
matmuls. The hot mapping path uses `pack_corners` + `grid_sample_2d_packed`
(one gather per point instead of four — 2.6x faster mapping on v5e).

Conventions match torch exactly so the reference's numerical behavior can be
unit-tested against scipy: sample coordinates in [-1, 1], align_corners=True
(grid corners map to pixel centers 0 and size-1), border clamping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(plane: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample of a feature plane.

    plane  [C, H, W]  feature image
    coords [N, 2]     (x, y) in [-1, 1]; x indexes W, y indexes H
    returns [N, C]

    TPU note: four per-corner ROW gathers from a [H*W, C] layout (channels
    in the lane dimension). Measured alternatives on v5e: lane-dim gathers
    from [C, HW] are ~10x slower; a [2, 2, C] slab `dynamic_slice` per point
    is ~60x slower (tiny windowed gathers lower to a serialized loop).
    """
    C, H, W = plane.shape
    # border padding: clamp the continuous coordinate itself
    x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    flat = plane.reshape(C, H * W).T
    g00 = flat[y0i * W + x0i]
    g01 = flat[y0i * W + x1i]
    g10 = flat[y1i * W + x0i]
    g11 = flat[y1i * W + x1i]

    return (
        g00 * ((1 - wx) * (1 - wy))[:, None]
        + g01 * (wx * (1 - wy))[:, None]
        + g10 * ((1 - wx) * wy)[:, None]
        + g11 * (wx * wy)[:, None]
    )


def pack_corners(plane: jax.Array) -> jax.Array:
    """Pre-shift a feature plane so one row holds all 4 bilinear corners.

    plane [C, H, W] -> packed [H*W, 4C] where row (y*W + x) is
    concat(plane[:, y, x], plane[:, y, x+1], plane[:, y+1, x],
    plane[:, y+1, x+1]) with border clamping (x+1 -> W-1 at the edge),
    matching `grid_sample_2d`'s corner clamp exactly.

    TPU note: the XLA row-gather floor on v5e is ~18 ns per *index*
    regardless of row width (latency-bound, not bandwidth-bound — a 128 B
    row at 18 ns is ~7 GB/s against ~800 GB/s HBM). Packing the 4 corners
    into one 4C-wide row therefore cuts the gather (and backward scatter)
    index count 4x for free. The pack itself is dense shifted copies,
    O(4 * plane bytes) once per step, amortized over ~1e5 sample gathers.
    """
    return pack_corners_hwc(jnp.transpose(plane, (1, 2, 0)))


def pack_corners_hwc(hwc: jax.Array) -> jax.Array:
    """`pack_corners` on an [H, W, C] feature image (no transpose).

    This 2D slice-concat form is the FAST pack on v5e: an equivalent
    flat-row formulation that replaced the border clamps with
    iota-mask `where` selects measured ~6x slower in the mapping step
    (tools/prof_zero2 6.86 vs prof_zero3 F3 1.12 ms/iter at full
    reference tables) — the selects materialize every shifted piece
    before the lane concat, while pure slice-concats fuse."""
    H, W, C = hwc.shape
    sx = jnp.concatenate([hwc[:, 1:], hwc[:, -1:]], axis=1)
    sy = jnp.concatenate([hwc[1:], hwc[-1:]], axis=0)
    sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
    packed = jnp.concatenate([hwc, sx, sy, sxy], axis=-1)
    return packed.reshape(H * W, 4 * C)


def _fold_b_rows(d_rows: jax.Array):
    """The y-shift operand of the corner fold on whole y-rows:
    b = d10 + shift_back_x(d11), computed row-locally (the x-shift never
    crosses y-rows). d_rows [Hb, W, 4C] -> [Hb, W, C]."""
    C = d_rows.shape[-1] // 4
    d10 = d_rows[..., 2 * C:3 * C]
    d11 = d_rows[..., 3 * C:4 * C]
    return d10 + _shift_back_x(d11)


def _shift_back_x(a):
    main = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    return main.at[:, -1].add(a[:, -1])


def fold_corners_rows(d_rows: jax.Array, H: int, W: int, y0=0,
                      halo_row: jax.Array | None = None) -> jax.Array:
    """Adjoint of `pack_corners_hwc` on a block of whole y-rows.

    d_rows [Hb*W, 4C]: packed-table cotangent rows for global y in
    [y0, y0+Hb) (rows with y >= H must be zero — the row-sharding pad).
    halo_row [W, C] or None: the y-shift contribution entering from row
    y0-1 — the previous block's last `_fold_b_rows` row (None = zeros,
    correct for y0 == 0 or single-block use). Returns the raw-plane
    cotangent rows [Hb*W, C], pad rows zero.

    Block-composable: folding consecutive blocks with the proper halos
    equals folding the full table, because the x-shift is y-row-internal
    and the y-shift moves exactly ONE y-row. This is the row-local fold
    of the row-sharded mapper's backward (the reduce-scattered packed
    cotangent block folds with a one-row halo; `y0` is traced —
    jax.lax.axis_index-derived — inside shard_map). Like the pack, the
    2D slice/concat form measures far cheaper on v5e than a flat
    iota-masked formulation (BASELINE.md round 4)."""
    Hb = d_rows.shape[0] // W
    C = d_rows.shape[1] // 4
    d = d_rows.reshape(Hb, W, 4 * C)
    zdt = d_rows.dtype
    d00 = d[..., 0 * C:1 * C]
    d01 = d[..., 1 * C:2 * C]

    b = _fold_b_rows(d)
    halo = (jnp.zeros((1, W, C), zdt) if halo_row is None
            else halo_row.reshape(1, W, C).astype(zdt))
    shifted = jnp.concatenate([halo, b[:-1]], axis=0)
    y = y0 + jax.lax.broadcasted_iota(jnp.int32, (Hb, 1, 1), 0)
    out = d00 + _shift_back_x(d01) + shifted + \
        jnp.where(y == H - 1, b, jnp.zeros((), zdt))
    if not (isinstance(y0, int) and y0 == 0 and Hb == H):
        out = jnp.where(y < H, out, jnp.zeros((), zdt))
    return out.reshape(Hb * W, C)


def grid_sample_2d_packed(packed: jax.Array, shape, coords: jax.Array) -> jax.Array:
    """Bilinear sample from a `pack_corners` table: ONE gather per point.

    packed [H*W, 4C] from `pack_corners`; shape = (C, H, W) of the original
    plane; coords [N, 2] (x, y) in [-1, 1]. Bit-identical to
    `grid_sample_2d(plane, coords)` (same corner values, same weights).
    """
    C, H, W = shape
    x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)

    g = packed[y0i * W + x0i]                          # [N, 4C]
    return (
        g[:, 0 * C:1 * C] * ((1 - wx) * (1 - wy))[:, None]
        + g[:, 1 * C:2 * C] * (wx * (1 - wy))[:, None]
        + g[:, 2 * C:3 * C] * ((1 - wx) * wy)[:, None]
        + g[:, 3 * C:4 * C] * (wx * wy)[:, None]
    )


def _unpack_corners_adjoint(d_packed: jax.Array, C: int, H: int, W: int) -> jax.Array:
    """Adjoint of `pack_corners`: route the packed-table cotangent [H*W, 4C]
    back to the plane [C, H, W]. Each plane texel received 4 copies in the
    pack (as corner 00 of its own row, 01 of its left neighbor, 10 of the
    row above, 11 of the upper-left), with border rows duplicating the last
    column/row — the shifts below are the exact transpose of that.

    NOTE: mathematically this equals
    `transpose(fold_corners_rows(d_packed, H, W).reshape(H, W, C))` (the
    block-composable fold at y0=0, Hb=H, no halo) — a change to either
    must be mirrored in the other (both are transposes of
    pack_corners_hwc, pinned by the sampler-VJP brute-force tests). They
    are deliberately NOT consolidated: fold_corners_rows' traced-y0
    iota-masked border handling costs +3.2 ms/iter at full table size on
    v5e (16.87 -> 20.05 ms/iter full mapping step at reference sampling,
    round-5 A/B), while the static `.at[-1].add` border here is free."""
    d = d_packed.reshape(H, W, 4 * C)
    d00 = d[..., 0 * C:1 * C]
    d01 = d[..., 1 * C:2 * C]
    d10 = d[..., 2 * C:3 * C]
    d11 = d[..., 3 * C:4 * C]

    def shift_back_x(a):  # adjoint of concat([p[:, 1:], p[:, -1:]], axis=1)
        main = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
        return main.at[:, -1].add(a[:, -1])

    def shift_back_y(a):  # adjoint of concat([p[1:], p[-1:]], axis=0)
        main = jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)
        return main.at[-1].add(a[-1])

    out = d00 + shift_back_x(d01) + shift_back_y(d10 + shift_back_x(d11))
    return jnp.transpose(out, (2, 0, 1))


@jax.custom_vjp
def sample_plane_packed(plane: jax.Array, coords: jax.Array) -> jax.Array:
    """`pack_corners` + `grid_sample_2d_packed` as one differentiable op.

    plane [C, H, W], coords [N, 2] in [-1, 1] -> [N, C], bit-identical to
    `grid_sample_2d(plane, coords)`.

    The custom VJP exists for the backward: XLA's autodiff of the packed
    path re-packs the table, re-gathers the corners, and schedules the 6
    per-plane scatter-adds poorly — the mapping super-step spent ~12 of
    15 ms there (tools/prof_mapping9.py). The manual backward reuses the
    forward-gathered corner rows for the coordinate gradient and emits
    exactly one scatter-add (the corner cotangents, [N, 4C] rows) plus the
    dense pack adjoint. Layout note: a [H*W, 4, C] sublane-corner variant
    of the whole table measured 4x SLOWER end-to-end on v5e ((1,4,C) slab
    gathers are pathological) — the corner axis must stay folded into the
    lane dimension.
    """
    out, _ = _sample_plane_fwd_impl(plane, coords)
    return out


def _sample_plane_fwd_impl(plane, coords):
    C, H, W = plane.shape
    x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(plane.dtype)
    wy = (y - y0).astype(plane.dtype)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    idx = y0i * W + x0i

    g = pack_corners(plane)[idx]                       # [N, 4C]
    out = (
        g[:, 0 * C:1 * C] * ((1 - wx) * (1 - wy))[:, None]
        + g[:, 1 * C:2 * C] * (wx * (1 - wy))[:, None]
        + g[:, 2 * C:3 * C] * ((1 - wx) * wy)[:, None]
        + g[:, 3 * C:4 * C] * (wx * wy)[:, None]
    )
    return out, (g, wx, wy, idx)


def _sample_plane_fwd(plane, coords):
    out, (g, wx, wy, idx) = _sample_plane_fwd_impl(plane, coords)
    # `plane` in the residuals is an alias (no copy) — only its shape/dtype
    # are read in the backward
    return out, (g, wx, wy, idx, coords, plane)


def _sample_plane_bwd(res, dout):
    g, wx, wy, idx, coords, plane = res
    C, H, W = plane.shape
    dout = dout.astype(plane.dtype)

    # --- plane cotangent: one scatter of the 4 corner contributions ---
    vals = jnp.concatenate([
        dout * ((1 - wx) * (1 - wy))[:, None],
        dout * (wx * (1 - wy))[:, None],
        dout * ((1 - wx) * wy)[:, None],
        dout * (wx * wy)[:, None],
    ], axis=-1)                                        # [N, 4C]
    from . import pallas_kernels
    d_packed = pallas_kernels.scatter_add_rows(idx, vals, H * W)
    d_plane = _unpack_corners_adjoint(d_packed, C, H, W)

    # --- coordinate cotangent (pose-render alignment differentiates
    # through the sample positions) ---
    g00, g01, g10, g11 = (g[:, i * C:(i + 1) * C] for i in range(4))
    gx = (g01 - g00) * (1 - wy)[:, None] + (g11 - g10) * wy[:, None]
    gy = (g10 - g00) * (1 - wx)[:, None] + (g11 - g01) * wx[:, None]
    # clip passes gradient on [min, max] inclusive (jnp.clip VJP semantics)
    mx = ((coords[:, 0] >= -1.0) & (coords[:, 0] <= 1.0)).astype(dout.dtype)
    my = ((coords[:, 1] >= -1.0) & (coords[:, 1] <= 1.0)).astype(dout.dtype)
    dx = jnp.sum(gx * dout, axis=-1) * (0.5 * (W - 1)) * mx
    dy = jnp.sum(gy * dout, axis=-1) * (0.5 * (H - 1)) * my
    d_coords = jnp.stack([dx, dy], axis=-1).astype(coords.dtype)
    return d_plane, d_coords


sample_plane_packed.defvjp(_sample_plane_fwd, _sample_plane_bwd)


class PackedPlane:
    """A `pack_corners` table standing in for a plane inside a params tree.

    Registered as a pytree whose single child is the packed table
    [H*W, 4C] and whose aux data is the original plane shape (C, H, W).
    Used by the row-sharded mapping path (parallel ZeRO-style plane
    gradients): the table is the differentiable leaf, so its cotangent is
    the raw packed scatter — the dense `pack_corners` adjoint fold then
    runs wherever the caller placed the pack (on the row-sharded side of
    the collective seam), instead of per-device at full table size inside
    `sample_plane_packed`'s VJP."""

    __slots__ = ("packed", "shape")

    def __init__(self, packed, shape):
        self.packed = packed
        self.shape = tuple(int(s) for s in shape)

    def __repr__(self):
        return f"PackedPlane(shape={self.shape})"


jax.tree_util.register_pytree_node(
    PackedPlane,
    lambda p: ((p.packed,), p.shape),
    lambda shape, children: PackedPlane(children[0], shape),
)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def sample_packed_table(packed: jax.Array, coords: jax.Array, shape) -> jax.Array:
    """Bilinear sample where the PACKED table is the differentiable input.

    packed [H*W, 4C] (a `pack_corners` table), coords [N, 2] in [-1, 1],
    shape = (C, H, W) static. Forward is bit-identical to
    `grid_sample_2d_packed`. The backward emits the packed-table cotangent
    directly (one zeros+scatter-add of the [N, 4C] corner rows) WITHOUT
    the dense unpack fold — the caller owns `pack_corners` and its
    transpose. This is the seam the row-sharded mapper needs: per-device
    partial packed cotangents reduce-scatter over table rows before the
    (then row-local) fold + Adam (BASELINE.md round-3 ray-sharding
    analysis)."""
    out, _ = _sample_packed_fwd_impl(packed, coords, shape)
    return out


def _sample_packed_fwd_impl(packed, coords, shape):
    C, H, W = shape
    x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(packed.dtype)
    wy = (y - y0).astype(packed.dtype)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    idx = y0i * W + x0i

    g = packed[idx]                                    # [N, 4C]
    out = (
        g[:, 0 * C:1 * C] * ((1 - wx) * (1 - wy))[:, None]
        + g[:, 1 * C:2 * C] * (wx * (1 - wy))[:, None]
        + g[:, 2 * C:3 * C] * ((1 - wx) * wy)[:, None]
        + g[:, 3 * C:4 * C] * (wx * wy)[:, None]
    )
    return out, (g, wx, wy, idx)


def _sample_packed_fwd(packed, coords, shape):
    out, (g, wx, wy, idx) = _sample_packed_fwd_impl(packed, coords, shape)
    return out, (g, wx, wy, idx, coords)


def _sample_packed_bwd(shape, res, dout):
    g, wx, wy, idx, coords = res
    C, H, W = shape
    n_rows = H * W  # contract: packed is exactly [H*W, 4C]
    dout = dout.astype(g.dtype)

    vals = jnp.concatenate([
        dout * ((1 - wx) * (1 - wy))[:, None],
        dout * (wx * (1 - wy))[:, None],
        dout * ((1 - wx) * wy)[:, None],
        dout * (wx * wy)[:, None],
    ], axis=-1)                                        # [N, 4C]
    from . import pallas_kernels
    d_packed = pallas_kernels.scatter_add_rows(idx, vals, n_rows)

    g00, g01, g10, g11 = (g[:, i * C:(i + 1) * C] for i in range(4))
    gx = (g01 - g00) * (1 - wy)[:, None] + (g11 - g10) * wy[:, None]
    gy = (g10 - g00) * (1 - wx)[:, None] + (g11 - g01) * wx[:, None]
    mx = ((coords[:, 0] >= -1.0) & (coords[:, 0] <= 1.0)).astype(dout.dtype)
    my = ((coords[:, 1] >= -1.0) & (coords[:, 1] <= 1.0)).astype(dout.dtype)
    dx = jnp.sum(gx * dout, axis=-1) * (0.5 * (W - 1)) * mx
    dy = jnp.sum(gy * dout, axis=-1) * (0.5 * (H - 1)) * my
    d_coords = jnp.stack([dx, dy], axis=-1).astype(coords.dtype)
    return d_packed, d_coords


sample_packed_table.defvjp(_sample_packed_fwd, _sample_packed_bwd)


def upsample_exact(plane: jax.Array, k: int) -> jax.Array:
    """Bilinear-exact k-times upsampling of a feature plane under
    align_corners semantics: [C, H, W] -> [C, k(H-1)+1, k(W-1)+1].

    Output node j along an axis sits at coarse coordinate j/k, so the
    upsampled grid's nodes subdivide every coarse cell evenly. Bilinear
    interpolation of the result is then EXACTLY bilinear interpolation of
    the original plane (a bilinear function restricted to a nested sub-cell
    is still bilinear and is determined by its corner values) — the basis
    of the fused coarse+fine sampling path (one gather for both levels).
    """
    if k == 1:
        return plane
    C, H, W = plane.shape
    w = (jnp.arange(k, dtype=plane.dtype) / k)[None, None, :, None]

    rows = plane[:, :-1, None, :] * (1 - w) + plane[:, 1:, None, :] * w
    rows = rows.reshape(C, k * (H - 1), W)
    rows = jnp.concatenate([rows, plane[:, -1:, :]], axis=1)   # [C, k(H-1)+1, W]

    wc = (jnp.arange(k, dtype=plane.dtype) / k)[None, None, None, :]
    cols = rows[:, :, :-1, None] * (1 - wc) + rows[:, :, 1:, None] * wc
    cols = cols.reshape(C, rows.shape[1], k * (W - 1))
    return jnp.concatenate([cols, rows[:, :, -1:]], axis=2)


def grid_sample_3d(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinear sample of a feature volume.

    vol    [C, D, H, W]
    coords [N, 3]  (x, y, z) in [-1, 1]; x indexes W, y indexes H, z indexes D
    returns [N, C]
    """
    C, D, H, W = vol.shape
    # border padding: clamp the continuous coordinate itself
    x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    z = jnp.clip((coords[:, 2] + 1.0) * 0.5 * (D - 1), 0.0, D - 1)

    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    wx = x - x0; wy = y - y0; wz = z - z0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1); x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1); y1i = jnp.clip(y0i + 1, 0, H - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, D - 1); z1i = jnp.clip(z0i + 1, 0, D - 1)

    flat = vol.reshape(C, D * H * W)

    def g(zi, yi, xi):
        return flat[:, (zi * H + yi) * W + xi]

    out = (
        g(z0i, y0i, x0i) * ((1 - wx) * (1 - wy) * (1 - wz))
        + g(z0i, y0i, x1i) * (wx * (1 - wy) * (1 - wz))
        + g(z0i, y1i, x0i) * ((1 - wx) * wy * (1 - wz))
        + g(z0i, y1i, x1i) * (wx * wy * (1 - wz))
        + g(z1i, y0i, x0i) * ((1 - wx) * (1 - wy) * wz)
        + g(z1i, y0i, x1i) * (wx * (1 - wy) * wz)
        + g(z1i, y1i, x0i) * ((1 - wx) * wy * wz)
        + g(z1i, y1i, x1i) * (wx * wy * wz)
    )
    return out.T


def bilinear_sampler(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample [C, H, W] at pixel coordinates [N, 2] (x, y), zero padding.

    Torch `grid_sample(align_corners=True, padding_mode='zeros')` semantics
    in pixel units — used by correlation-volume lookups
    (`tracker/modules/corr.py`).
    """
    C, H, W = img.shape
    x, y = coords[:, 0], coords[:, 1]
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = x - x0; wy = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    def g(yi, xi):
        inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = img.reshape(C, H * W)[:, yi_c * W + xi_c]
        return vals * inb[None, :]

    out = (
        g(y0i, x0i) * ((1 - wx) * (1 - wy))
        + g(y0i, x0i + 1) * (wx * (1 - wy))
        + g(y0i + 1, x0i) * ((1 - wx) * wy)
        + g(y0i + 1, x0i + 1) * (wx * wy)
    )
    return out.T
