"""Multi-resolution hash-grid encoding (Instant-NGP semantics, pure JAX).

Parity for the reference's tinycudann HashGrid/Dense grid paths
(`/root/reference/model/encodings.py:13-46`) — retained in its config
surface (`grid.enc: HashGrid`) although the runtime default replaces them
with tri-planes. Trainable table pytree + trilinear interpolation; per-level
corner hashing uses the standard spatial-hash primes with dense indexing
for levels whose grid fits the table.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(n_levels: int = 16, base_resolution: int = 16,
                      desired_resolution: int = 512) -> List[int]:
    """Geometric growth (encodings.py:15,33)."""
    if n_levels == 1:
        return [base_resolution]
    scale = np.exp2(np.log2(desired_resolution / base_resolution) / (n_levels - 1))
    return [int(np.floor(base_resolution * scale ** l)) for l in range(n_levels)]


def init_hash_grid(
    key,
    n_levels: int = 16,
    n_features_per_level: int = 2,
    log2_hashmap_size: int = 16,
    base_resolution: int = 16,
    desired_resolution: int = 512,
) -> Tuple[Dict, List[int]]:
    """-> (params {"table": [L, T, F]}, resolutions). U(-1e-4, 1e-4) init."""
    T = 2 ** log2_hashmap_size
    table = jax.random.uniform(
        key, (n_levels, T, n_features_per_level), minval=-1e-4, maxval=1e-4
    )
    res = level_resolutions(n_levels, base_resolution, desired_resolution)
    return {"table": table}, res


def _corner_index(cx: jax.Array, cy: jax.Array, cz: jax.Array,
                  res: int, T: int) -> jax.Array:
    """Dense index when the level grid fits the table, else spatial hash."""
    if (res + 1) ** 3 <= T:
        return (cx * (res + 1) + cy) * (res + 1) + cz
    # spatial hash in uint32 (primes exceed int32 range)
    h = (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
         ^ cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
         ^ cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    return (h % jnp.uint32(T)).astype(jnp.int32)


def hash_grid_encode(params: Dict, x: jax.Array, resolutions: List[int]) -> jax.Array:
    """x [..., 3] in [0, 1] -> [..., L * F] trilinear hash features."""
    table = params["table"]
    L, T, F = table.shape
    flat = x.reshape(-1, 3)
    N = flat.shape[0]

    outs = []
    for lvl, res in enumerate(resolutions):
        p = jnp.clip(flat, 0.0, 1.0) * res
        p0 = jnp.floor(p).astype(jnp.int32)
        w = p - p0
        p0 = jnp.clip(p0, 0, res)

        acc = jnp.zeros((N, F), table.dtype)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx = jnp.minimum(p0[:, 0] + dx, res)
                    cy = jnp.minimum(p0[:, 1] + dy, res)
                    cz = jnp.minimum(p0[:, 2] + dz, res)
                    idx = _corner_index(cx, cy, cz, res, T)
                    wgt = (
                        (w[:, 0] if dx else 1 - w[:, 0])
                        * (w[:, 1] if dy else 1 - w[:, 1])
                        * (w[:, 2] if dz else 1 - w[:, 2])
                    )
                    acc = acc + table[lvl, idx] * wgt[:, None]
        outs.append(acc)

    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*x.shape[:-1], L * F)
