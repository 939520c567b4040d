"""Correlation-volume features for the recurrent tracker (pure XLA).

TPU-native replacement for the reference's CUDA correlation kernels
(`/root/reference/src/lib/correlation_kernels.cu`, `altcorr_kernel.cu`,
wrapped by `tracker/modules/corr.py`): all-pairs feature correlation over a
4-level average-pooled pyramid, sampled in a (2r+1)^2 window around
per-pixel lookup centers with bilinear interpolation and zero padding.

Semantics match the CUDA sampler bit-for-bit where it matters for the
pretrained weights:
  * window channel layout is [x_offset, y_offset] flattened (x slower),
    levels concatenated -> 4*49 = 196 channels;
  * bilinear corners falling outside the volume contribute zero;
  * features are pre-scaled by 1/4 on each side (corr.py:71-72), i.e. /16
    on the product.

Design: the "alt" (on-the-fly) formulation throughout — no O(buffer * HW^2)
volume is ever stored. On TPU the default is the fused multi-level Pallas
kernel (`pallas_kernels.corr_window_int_multilevel`: target feature levels
VMEM-resident, per-pixel windows as sublane slices — 49x the naive XLA
volume-gather formulation); `alt_corr_xla` is the CPU/test fallback using
contiguous slab gathers.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp


def build_pyramid(fmaps: jax.Array, num_levels: int = 4) -> List[jax.Array]:
    """[N, C, H, W] -> list of [N, C, H/2^i, W/2^i], inputs scaled by 1/4.

    Correlation always runs fp32 — the reference casts features to float
    before its altcorr kernel (corr.py:125), and Mosaic's VMEM row slicing
    requires fp32 tiling anyway."""
    f = fmaps.astype(jnp.float32) / 4.0
    pyr = [f]
    for _ in range(num_levels - 1):
        f = jax.lax.reduce_window(
            f, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0
        pyr.append(f)
    return pyr


def _corr_edge_level(
    f1_rows: jax.Array,   # [HW1, C] level-0 features of frame ii (row layout)
    f2_rows: jax.Array,   # [H2W2, C] level-l features of frame jj (row layout)
    H2: int,
    W2: int,
    coords: jax.Array,    # [HW1, 2] lookup centers in level coordinates
    radius: int,
) -> jax.Array:
    """One (edge, level) correlation window -> [HW1, (2r+1)^2].

    TPU-shaped formulation: instead of materializing the all-pairs volume
    and gathering scalars from it (lane-dimension gathers — measured 45x
    slower), gather whole 128-channel feature ROWS of fmap2 at each of the
    (2r+2)^2 integer offsets (full-lane-width gathers) and reduce against
    fmap1 on the VPU. Bilinear weights are shared across the window since
    offsets are integral, so the 4-corner combination happens on the
    (2r+1)^2 scalar field, not on features.
    """
    HW1, C = f1_rows.shape
    rd = 2 * radius + 1
    nx = rd + 1  # integer offsets per axis
    x0f = jnp.floor(coords[:, 0])
    y0f = jnp.floor(coords[:, 1])
    fx = coords[:, 0] - x0f   # [HW1]
    fy = coords[:, 1] - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # Gather CONTIGUOUS x-segments: for each y-offset j, one gather of
    # [HW1, nx, C] slabs (nx*C*4 = 4 KB contiguous HBM reads) instead of
    # nx scattered row gathers — the dominant cost is HBM random access,
    # so bigger contiguous slices win.
    #
    # dynamic_slice clamps out-of-range starts (which would silently SHIFT
    # the fetched window), so x0 is pre-clamped to the range where any
    # window overlap with [0, W2) is possible, and the validity mask is
    # computed from the clamped start. Fully out-of-range centers get an
    # all-zero mask.
    f2_img = f2_rows.reshape(H2, W2, C)
    padl, padr = 2 * radius + 1, nx
    f2_pad = jnp.pad(f2_img, ((0, 0), (padl, padr), (0, 0)))
    x0c = jnp.clip(x0, -(radius + 1), W2 + radius)
    fully_out = (x0 < -(radius + 1)) | (x0 > W2 + radius)
    xs = x0c - radius + padl                           # padded segment start

    def slab(y_idx):
        def one(y, x):
            return jax.lax.dynamic_slice(f2_pad, (y, x, 0), (1, nx, C))[0]
        return jax.vmap(one)(y_idx, xs)                # [HW1, nx, C]

    x_off = jnp.arange(nx) - radius                    # [-r .. r+1]
    x_pos = x0c[:, None] + x_off
    x_inb = (x_pos >= 0) & (x_pos < W2) & (~fully_out)[:, None]

    corr_cols = []
    for j in range(nx):                                # y offset index
        yi = y0 + (j - radius)
        y_inb = (yi >= 0) & (yi < H2)
        rows = slab(jnp.clip(yi, 0, H2 - 1))           # [HW1, nx, C]
        dot = jnp.einsum("pnc,pc->pn", rows, f1_rows)  # [HW1, nx]
        corr_cols.append(dot * (x_inb & y_inb[:, None]))
    corr_int = jnp.stack(corr_cols, axis=-1)           # [HW1, nx(i), nx(j)]

    w00 = ((1 - fx) * (1 - fy))[:, None, None]
    w10 = (fx * (1 - fy))[:, None, None]
    w01 = ((1 - fx) * fy)[:, None, None]
    w11 = (fx * fy)[:, None, None]
    out = (
        corr_int[:, :rd, :rd] * w00
        + corr_int[:, 1:, :rd] * w10
        + corr_int[:, :rd, 1:] * w01
        + corr_int[:, 1:, 1:] * w11
    )
    return out.reshape(HW1, rd * rd)


def _corr_edge(
    fmap1: jax.Array,             # [C, H, W]   level-0 features of frame ii
    pyr2: Tuple[jax.Array, ...],  # per level [C, Hi, Wi] features of frame jj
    coords: jax.Array,            # [H, W, 2] lookup centers (level-0 pixels)
    radius: int,
) -> jax.Array:
    """All levels for one edge -> [L*(2r+1)^2, H, W]."""
    C, H, W = fmap1.shape
    f1_rows = fmap1.reshape(C, H * W).T
    out = []
    for lvl, f2 in enumerate(pyr2):
        _, H2, W2 = f2.shape
        c = coords.reshape(-1, 2) / (2 ** lvl)
        out.append(_corr_edge_level(
            f1_rows, f2.reshape(C, H2 * W2).T, H2, W2, c, radius))
    corr = jnp.concatenate(out, axis=-1)            # [HW, L*49]
    return corr.T.reshape(-1, H, W)


@partial(jax.jit, static_argnames=("radius", "interpret", "mxu"))
def alt_corr_pallas_ml(
    fmaps: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
    coords: jax.Array,
    radius: int = 3,
    interpret: bool = False,
    mask: jax.Array | None = None,
    mxu: bool = False,
) -> jax.Array:
    """Single-kernel (all 4 pyramid levels fused) Pallas correlation.

    `mask` [E] (optional): edges with 0 are padding — the kernel skips
    their per-pixel loop and zeroes their outputs. `mxu`: batched-matmul
    window dots (MNESLAM_CORR_IMPL=pallas_mxu)."""
    from . import pallas_kernels

    pyr = build_pyramid(fmaps)
    N, C, H, W = pyr[0].shape
    HW = H * W
    E = ii.shape[0]
    rd = 2 * radius + 1
    nx = rd + 1
    padl = 2 * radius + 1

    f1_rows = pyr[0].transpose(0, 2, 3, 1).reshape(N, HW, C)
    cflat = coords.reshape(E, HW, 2)

    f2_levels, w2ps, xs_levels, fracs = [], [], [], []
    for lvl, f2 in enumerate(pyr):
        H2, W2 = f2.shape[2], f2.shape[3]
        w2p = W2 + padl + nx
        f2_img = f2.transpose(0, 2, 3, 1)
        f2_pad = jnp.pad(f2_img, ((0, 0), (padl, nx), (padl, nx), (0, 0)))
        f2_levels.append(f2_pad.reshape(N, -1, C))
        w2ps.append(w2p)

        c = cflat / (2 ** lvl)
        x0 = jnp.floor(c[..., 0])
        y0 = jnp.floor(c[..., 1])
        fracs.append((c[..., 0] - x0, c[..., 1] - y0))
        x0c = jnp.clip(x0.astype(jnp.int32), -(radius + 1), W2 + radius)
        y0c = jnp.clip(y0.astype(jnp.int32), -(radius + 1), H2 + radius)
        xs_levels.append((y0c - radius + padl) * w2p + (x0c - radius + padl))

    xs = jnp.stack(xs_levels, axis=-1)                       # [E, HW, 4]
    corr_int = pallas_kernels.corr_window_int_multilevel(
        f1_rows, f2_levels, ii.astype(jnp.int32), jj.astype(jnp.int32),
        xs, nx, w2ps, mask=mask, interpret=interpret, mxu=mxu,
    ).reshape(E, HW, 4, nx, nx)

    out_levels = []
    for lvl, (fx, fy) in enumerate(fracs):
        ci = corr_int[:, :, lvl]
        w00 = ((1 - fx) * (1 - fy))[..., None, None]
        w10 = (fx * (1 - fy))[..., None, None]
        w01 = ((1 - fx) * fy)[..., None, None]
        w11 = (fx * fy)[..., None, None]
        out = (ci[..., :rd, :rd] * w00 + ci[..., :rd, 1:] * w10
               + ci[..., 1:, :rd] * w01 + ci[..., 1:, 1:] * w11)
        out_levels.append(out.transpose(0, 1, 3, 2).reshape(E, HW, rd * rd))

    corr = jnp.concatenate(out_levels, axis=-1)
    return corr.transpose(0, 2, 1).reshape(E, -1, H, W)


@partial(jax.jit, static_argnames=("radius", "interpret"))
def alt_corr_pallas(
    fmaps: jax.Array,   # [N, C, H, W] feature buffer (unscaled)
    ii: jax.Array,      # [E]
    jj: jax.Array,      # [E]
    coords: jax.Array,  # [E, H, W, 2]
    radius: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Pallas-backed correlation features -> [E, L*(2r+1)^2, H, W].

    The per-pixel integer-window dot products run in a Pallas kernel with
    the target frame's feature level VMEM-resident (`pallas_kernels.py`);
    the bilinear 4-corner combination of the scalar field stays in XLA.
    """
    from . import pallas_kernels

    pyr = build_pyramid(fmaps)
    N, C, H, W = pyr[0].shape
    HW = H * W
    E = ii.shape[0]
    rd = 2 * radius + 1
    nx = rd + 1

    f1_rows = pyr[0].transpose(0, 2, 3, 1).reshape(N, HW, C)
    cflat = coords.reshape(E, HW, 2)

    out_levels = []
    for lvl, f2 in enumerate(pyr):
        H2, W2 = f2.shape[2], f2.shape[3]
        padl = 2 * radius + 1
        w2p = W2 + padl + nx
        f2_img = f2.transpose(0, 2, 3, 1)                       # [N, H2, W2, C]
        f2_pad = jnp.pad(f2_img, ((0, 0), (padl, nx), (padl, nx), (0, 0)))
        f2_rows = f2_pad.reshape(N, -1, C)

        c = cflat / (2 ** lvl)
        x0 = jnp.floor(c[..., 0])
        y0 = jnp.floor(c[..., 1])
        fx = c[..., 0] - x0
        fy = c[..., 1] - y0
        # clamp so every slab read stays inside the zero pad
        x0c = jnp.clip(x0.astype(jnp.int32), -(radius + 1), W2 + radius)
        y0c = jnp.clip(y0.astype(jnp.int32), -(radius + 1), H2 + radius)
        xs = (y0c - radius + padl) * w2p + (x0c - radius + padl)

        # kernel output is j-major: corr_int[..., j, i]
        corr_int = pallas_kernels.corr_window_int(
            f1_rows, f2_rows, ii.astype(jnp.int32), jj.astype(jnp.int32),
            xs, nx, w2p, interpret=interpret,
        ).reshape(E, HW, nx, nx)

        w00 = ((1 - fx) * (1 - fy))[..., None, None]
        w10 = (fx * (1 - fy))[..., None, None]
        w01 = ((1 - fx) * fy)[..., None, None]
        w11 = (fx * fy)[..., None, None]
        out = (
            corr_int[..., :rd, :rd] * w00
            + corr_int[..., :rd, 1:] * w10     # i+1 (minor axis)
            + corr_int[..., 1:, :rd] * w01     # j+1 (major axis)
            + corr_int[..., 1:, 1:] * w11
        )
        # [E, HW, j, i] -> channel layout i*rd + j (x-offset slower)
        out_levels.append(out.transpose(0, 1, 3, 2).reshape(E, HW, rd * rd))

    corr = jnp.concatenate(out_levels, axis=-1)                 # [E, HW, 196]
    return corr.transpose(0, 2, 1).reshape(E, -1, H, W)


def alt_corr(
    fmaps: jax.Array,
    ii: jax.Array,
    jj: jax.Array,
    coords: jax.Array,
    radius: int = 3,
    chunk: int = 8,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Correlation features for an edge set -> [E, L*(2r+1)^2, H, W].

    Dispatches to the Pallas kernel on TPU (4x the XLA formulation, 40x
    the original volume-gather version; direct-timed, prof_corr4) and the
    XLA slab-gather formulation on CPU. Override with
    MNESLAM_CORR_IMPL=pallas|xla. `mask` [E] marks padded edges (0): the
    Pallas kernel skips their whole pixel loop; the XLA/per-level paths
    compute them and zero the outputs afterwards, so padded-slot corr (and
    the GRU hidden state fed from it) is identical across backends.
    """
    import os

    impl = os.environ.get("MNESLAM_CORR_IMPL")
    if impl is None:
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl in ("pallas", "pallas_mxu"):
        return alt_corr_pallas_ml(fmaps, ii, jj, coords, radius=radius,
                                  mask=mask, mxu=impl == "pallas_mxu")
    if impl == "pallas_per_level":
        out = alt_corr_pallas(fmaps, ii, jj, coords, radius=radius)
    else:
        out = alt_corr_xla(fmaps, ii, jj, coords, radius=radius, chunk=chunk)
    if mask is not None:
        out = out * mask.astype(out.dtype)[:, None, None, None]
    return out


@partial(jax.jit, static_argnames=("radius", "chunk"))
def alt_corr_xla(
    fmaps: jax.Array,   # [N, C, H, W] feature buffer (unscaled)
    ii: jax.Array,      # [E]
    jj: jax.Array,      # [E]
    coords: jax.Array,  # [E, H, W, 2]
    radius: int = 3,
    chunk: int = 8,
) -> jax.Array:
    """Correlation features for an edge set -> [E, L*(2r+1)^2, H, W].

    Gathers per-edge pyramids and maps `_corr_edge` in chunks so peak memory
    is one chunk of per-edge volumes.
    """
    pyr = build_pyramid(fmaps)
    E = ii.shape[0]
    pad = (chunk - E % chunk) % chunk
    iip = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)])
    jjp = jnp.concatenate([jj, jnp.zeros(pad, jj.dtype)])
    cp = jnp.concatenate([coords, jnp.zeros((pad,) + coords.shape[1:], coords.dtype)])

    def body(args):
        i, j, c = args
        f1 = pyr[0][i]                       # [chunk, C, H, W]
        p2 = tuple(lv[j] for lv in pyr)
        return jax.vmap(lambda a, *bs: _corr_edge(a, bs[:-1], bs[-1], radius))(
            f1, *p2, c
        )

    out = jax.lax.map(
        body,
        (iip.reshape(-1, chunk), jjp.reshape(-1, chunk), cp.reshape(-1, chunk, *coords.shape[1:])),
    )
    out = out.reshape(-1, *out.shape[2:])[:E]
    return out


def self_corr(fmap_prev: jax.Array, fmap_new: jax.Array, radius: int = 3) -> jax.Array:
    """Single-pair correlation at the identity grid — the motion-filter path
    (motion_filter.py:70-74). Returns [1, 196, H, W]."""
    from . import projective

    _, H, W = fmap_prev.shape
    coords0 = projective.coords_grid(H, W)[None]
    return alt_corr(
        jnp.stack([fmap_prev, fmap_new]),
        jnp.asarray([0]), jnp.asarray([1]), coords0, radius=radius, chunk=1,
    )
