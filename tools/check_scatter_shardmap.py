"""Validate the production Pallas scatter INSIDE shard_map on the real chip.

The row-sharded deployment runs `ops/pallas_kernels.scatter_add_rows`
inside a shard_map per-device program; CPU-mesh tests always take the XLA
fallback (the dispatcher is backend-gated), so Pallas-under-shard_map has
never executed anywhere but this check. A 1-device TPU mesh executes the
exact per-device program (same primitive nesting as N devices).

Checks, at the production 8-shard shape (fine table 160801 rows, 11567
updates, width 128, fp32):
  1. scatter_add_rows inside shard_map == XLA scatter outside (exact)
  2. the full sampler VJP (sample_packed_table grad) inside shard_map ==
     outside (the dispatcher engages in both on TPU)
Exit 0 = both match. Usage: python tools/check_scatter_shardmap.py
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mneslam_tpu.ops import interp, pallas_kernels


def main():
    n_rows, nu, width = 160801, 11567, 128
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (nu,), 0, n_rows, jnp.int32)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (nu, width),
                             jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    ref = np.asarray(jnp.zeros((n_rows, width), jnp.float32)
                     .at[idx].add(vals))

    # 1a) raw kernel under shard_map, replicated inputs (vma = {})
    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P())
    def scatter_sm(idx, vals):
        return pallas_kernels.scatter_add_rows(idx, vals, n_rows)

    got = np.asarray(scatter_sm(idx, vals))
    err = np.abs(got - ref).max()
    print(f"kernel-in-shard_map (replicated) max err: {err:.3g}", flush=True)
    assert err < 1e-4 * max(1.0, np.abs(ref).max()), err

    # 1b) VARYING inputs (vma = {rows}) — the production situation: every
    # device scatters its own ray shard's cotangents
    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P("rows"), P("rows")),
             out_specs=P("rows"))
    def scatter_sm_v(idx, vals):
        return pallas_kernels.scatter_add_rows(idx, vals, n_rows)

    got_v = np.asarray(scatter_sm_v(idx, vals))
    err_v = np.abs(got_v - ref).max()
    print(f"kernel-in-shard_map (varying) max err: {err_v:.3g}", flush=True)
    assert err_v < 1e-4 * max(1.0, np.abs(ref).max()), err_v

    # 2) sampler VJP under shard_map (C=32 -> 4C=128, fine-plane shape)
    C, H, W = 32, 401, 401
    packed = jax.random.normal(jax.random.fold_in(key, 2),
                               (H * W, 4 * C), jnp.float32)
    coords = jax.random.uniform(jax.random.fold_in(key, 3), (nu, 2),
                                minval=-1.0, maxval=1.0)

    def loss(packed, coords):
        out = interp.sample_packed_table(packed, coords, (C, H, W))
        return jnp.sum(jnp.sin(out))

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P())
    def grad_sm(packed, coords):
        return jax.grad(loss)(packed, coords)

    g_sm = np.asarray(grad_sm(packed, coords))
    g_ref = np.asarray(jax.jit(jax.grad(loss))(packed, coords))
    gerr = np.abs(g_sm - g_ref).max()
    print(f"sampler-VJP-in-shard_map max err: {gerr:.3g}", flush=True)
    assert gerr < 1e-4 * max(1.0, np.abs(g_ref).max()), gerr
    print("OK", flush=True)


if __name__ == "__main__":
    main()
