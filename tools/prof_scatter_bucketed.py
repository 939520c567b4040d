"""Extend the VMEM-resident serial scatter past its 16k-update range via
row-range bucketing (round 5 — VERDICT r4 next #2).

Design under test: argsort the update rows, permute the payload once, and
run the serial-accumulate kernel per ROW-RANGE BUCKET — grid=(B,), each
grid step owning rows [b*blk, (b+1)*blk) and walking only its own sorted
update range [off[b], off[b+1]) (dynamic fori_loop bounds from
scalar-prefetched searchsorted offsets). The sorted payload is one
VMEM-resident block revisited across grid steps.

Expectation check (honest arithmetic BEFORE the run): the serial walk is
~26-30 ns/update and does NOT shrink with bucketing — bucketing only
shrinks the per-block zero+DMA, which is already ~0.1 ms. The routing
(argsort + payload permute) ADDS ~12 ns/row. So the projection is a
LOSS at 23k (route ~0.3 + walk ~0.65 vs XLA 0.414) and at 92k (route
~1.2 + walk ~2.6 vs XLA 1.5); VERDICT r4's ~4.5-vs-7.8 projection
compared one plane's bucketed cost against the six-plane trace total.
This probe settles it on silicon either way, plus two cheap levers the
arithmetic can't rule out: deeper unroll (U16/U32) and bucketing WITHOUT
the permute cost (pre-sorted inputs) to decompose route vs walk.

Protocol: CLAUDE.md direct timing (K-rep chain -> scalar; vals scaled by
rep index so the call cannot be hoisted), median of 5 fetch-synced walls.
Usage: python tools/prof_scatter_bucketed.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 200
N_WALL = 5


def timed(name, fn, *args):
    float(np.asarray(fn(*args)).ravel()[0])
    walls = []
    for _ in range(N_WALL):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        walls.append(time.perf_counter() - t0)
    per = float(np.median(walls)) / K * 1e3
    print(f"{name:44s} {per:8.3f} ms/call", flush=True)
    return per


def make_serial(n_rows, nu, width, dtype, unroll):
    """The production single-block kernel at a configurable unroll depth."""
    from mneslam_tpu.ops.pallas_kernels import _scatter_rows_kernel

    padded = -(-n_rows // 8) * 8
    kernel = functools.partial(_scatter_rows_kernel, nu=nu, unroll=unroll)

    def scatter(idx, vals):
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((nu, width), lambda b, idx: (0, 0))],
                out_specs=pl.BlockSpec((padded, width), lambda b, idx: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((padded, width), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(idx.astype(jnp.int32), vals)
        return out[:n_rows]

    return scatter


def make_bucketed(n_rows, nu, width, dtype, n_buckets, presorted=False):
    blk = -(-n_rows // n_buckets)
    blk = -(-blk // 8) * 8

    def kernel(off_ref, idx_ref, vals_ref, out_ref):
        b = pl.program_id(0)
        out_ref[:] = jnp.zeros_like(out_ref)
        base = b * blk

        def body(i, _):
            r = idx_ref[i] - base
            out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(off_ref[b], off_ref[b + 1], body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_buckets,),
        in_specs=[pl.BlockSpec((nu, width), lambda b, off, idx: (0, 0))],
        out_specs=pl.BlockSpec((blk, width), lambda b, off, idx: (b, 0)),
    )
    edges = jnp.arange(n_buckets + 1, dtype=jnp.int32) * blk

    def call(off, idx_s, vals_s):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((blk * n_buckets, width), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(off, idx_s, vals_s)
        return out[:n_rows]

    if presorted:
        def scatter(idx_s, vals_s):
            off = jnp.searchsorted(idx_s, edges).astype(jnp.int32)
            return call(off, idx_s, vals_s)
    else:
        def scatter(idx, vals):
            perm = jnp.argsort(idx)
            idx_s = idx[perm].astype(jnp.int32)
            vals_s = vals[perm]
            off = jnp.searchsorted(idx_s, edges).astype(jnp.int32)
            return call(off, idx_s, vals_s)

    return scatter


def main():
    dtype = jnp.float32
    width = 128
    results = {}
    print(f"device={jax.devices()[0]}  K={K}  width={width}", flush=True)

    shapes = [("fine@11.5k", 160801, 11567), ("fine@23k", 160801, 23134),
              ("fine@92k", 160801, 92536)]
    for tag, n_rows, nu in shapes:
        key = jax.random.PRNGKey(0)
        idx = jax.random.randint(key, (nu,), 0, n_rows, jnp.int32)
        vals = jax.random.normal(jax.random.fold_in(key, 1),
                                 (nu, width)).astype(dtype)
        idx_s = jnp.sort(idx)
        vals_s = vals[jnp.argsort(idx)]

        def chain(scatter_fn):
            @jax.jit
            def f(idx, vals):
                def body(i, acc):
                    v = vals * (1.0 + 1e-6 * i)
                    out = scatter_fn(idx, v)
                    return acc + out[0, 0].astype(jnp.float32)

                return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

            return f

        def xla_scatter(idx, v):
            return jnp.zeros((n_rows, width), dtype).at[idx].add(v)

        ref = np.asarray(xla_scatter(idx, vals), np.float32)

        variants = [("xla", xla_scatter, idx, vals)]
        if nu <= 30_000:
            for u in (8, 16, 32):
                variants.append((f"serialU{u}",
                                 make_serial(n_rows, nu, width, dtype, u),
                                 idx, vals))
        bs = (2, 4, 8) if nu <= 30_000 else (8, 16)
        for b in bs:
            variants.append((f"bucket{b}",
                             make_bucketed(n_rows, nu, width, dtype, b),
                             idx, vals))
            variants.append((f"bucket{b}_presorted",
                             make_bucketed(n_rows, nu, width, dtype, b,
                                           presorted=True),
                             idx_s, vals_s))

        for name, fn, a_idx, a_vals in variants:
            full = f"{tag}/{name}"
            try:
                got = np.asarray(fn(a_idx, a_vals), np.float32)
                err = float(np.abs(got - ref).max())
                if err > 1e-4 * max(1.0, np.abs(ref).max()):
                    print(f"{full:44s} WRONG (max err {err:.3g})", flush=True)
                    results[full] = f"wrong:{err:.3g}"
                    continue
                results[full] = timed(full, chain(fn), a_idx, a_vals)
            except Exception as e:  # noqa: BLE001 — probe records failures
                msg = str(e).split("\n")[0][:160]
                print(f"{full:44s} FAILED: {msg}", flush=True)
                results[full] = f"failed:{msg}"

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
