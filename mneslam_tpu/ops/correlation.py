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

Design: the "alt" (on-the-fly) formulation is the default — the per-edge
volume is one [HW, H2W2] matmul (MXU) computed inside a `lax.map` over
edges, so memory stays bounded by one edge's pyramid level while the MXU
does the heavy lifting. No O(buffer * HW^2) volume is ever stored.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp


def build_pyramid(fmaps: jax.Array, num_levels: int = 4) -> List[jax.Array]:
    """[N, C, H, W] -> list of [N, C, H/2^i, W/2^i], inputs scaled by 1/4."""
    f = fmaps / 4.0
    pyr = [f]
    for _ in range(num_levels - 1):
        f = jax.lax.reduce_window(
            f, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0
        pyr.append(f)
    return pyr


def _window_lookup(vol: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Sample vol [HW1, H2, W2] at a (2r+1)^2 window around coords [HW1, 2].

    Returns [HW1, (2r+1)^2] with x-offset as the slower window axis,
    matching corr_index_forward_kernel's output layout.
    """
    HW1, H2, W2 = vol.shape
    rd = 2 * radius + 1
    x0 = jnp.floor(coords[:, 0])
    y0 = jnp.floor(coords[:, 1])
    fx = coords[:, 0] - x0   # [HW1]
    fy = coords[:, 1] - y0

    dx = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    dy = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    # integer corner grids [HW1, rd]
    xs = x0.astype(jnp.int32)[:, None] + dx
    ys = y0.astype(jnp.int32)[:, None] + dy

    volf = vol.reshape(HW1, H2 * W2)
    rows = jnp.arange(HW1)[:, None, None]

    def corner(xi, yi):
        """Gather vol at integer (yi, xi): [HW1, rd(x), rd(y)], OOB -> 0."""
        inb = (xi[:, :, None] >= 0) & (xi[:, :, None] < W2) & \
              (yi[:, None, :] >= 0) & (yi[:, None, :] < H2)
        flat = jnp.clip(yi[:, None, :], 0, H2 - 1) * W2 + jnp.clip(xi[:, :, None], 0, W2 - 1)
        vals = jnp.take_along_axis(volf, flat.reshape(HW1, -1), axis=1).reshape(HW1, rd, rd)
        return vals * inb

    # bilinear at (x0+fx - r + i, y0+fy - r + j) = corners (xs+{0,1}, ys+{0,1})
    out = (
        corner(xs, ys) * ((1 - fx) * (1 - fy))[:, None, None]
        + corner(xs + 1, ys) * (fx * (1 - fy))[:, None, None]
        + corner(xs, ys + 1) * ((1 - fx) * fy)[:, None, None]
        + corner(xs + 1, ys + 1) * (fx * fy)[:, None, None]
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
    f1 = fmap1.reshape(C, H * W)
    out = []
    for lvl, f2 in enumerate(pyr2):
        _, H2, W2 = f2.shape
        vol = jnp.einsum(
            "cp,cq->pq", f1, f2.reshape(C, H2 * W2),
            preferred_element_type=jnp.float32,
        ).reshape(H * W, H2, W2)
        c = (coords.reshape(-1, 2)) / (2 ** lvl)
        out.append(_window_lookup(vol, c, radius))
    corr = jnp.concatenate(out, axis=-1)            # [HW, L*49]
    return corr.T.reshape(-1, H, W)


@partial(jax.jit, static_argnames=("radius", "chunk"))
def alt_corr(
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
