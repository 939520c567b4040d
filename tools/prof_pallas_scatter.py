"""Can a Pallas kernel beat XLA's sort-based scatter-add at the mapping
backward's exact shapes?

Round-4 motivation: prof_zero7 shows the random scatter costs 1.76 of the
3.91 ms/iter row-sharded per-device step at 8 shards (45%) — the single
remaining lever on the v5e-8 >5 Hz north-star. Every XLA formulation was
measured at or above the default (prof_scatter5/6); this probe measures
what XLA cannot express: a VMEM-RESIDENT serial accumulate — zero a VMEM
table, walk the updates with dynamic-sublane RMW, DMA the table out once.
No sort, no comparison network; cost = Nu scalar-loop iterations + one
table write.

Shapes (row-sharded mapper at 8 shards, reference sampling): per plane
Nu = 11,567 updates of [128] fp32 rows into R = 160,801 (fine) / 40,401
(coarse) rows. Fine table = 82 MB -> also probes v5e VMEM capacity; the
grid-blocked variant (B) covers the table in row blocks and re-walks the
updates per block with predicated writes, for when one block exceeds
VMEM.

Variants:
  xla        jnp.zeros.at[idx].add(vals)            (production default)
  pallas1    whole table in one VMEM block, serial accumulate
  pallasB<k> k row-blocks, updates re-walked per block
  pallasU    pallas1 with an 8-wide manually unrolled loop

Protocol: CLAUDE.md direct timing (K-rep chain -> scalar; vals scaled by
the rep index so the call cannot be hoisted), median of 5 fetch-synced
walls. Usage: python tools/prof_pallas_scatter.py [--bf16]
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


def make_pallas_scatter(n_rows, nu, width, dtype, n_blocks=1, unroll=1):
    blk = -(-n_rows // n_blocks)           # ceil
    blk = -(-blk // 8) * 8                 # sublane multiple

    def kernel(idx_ref, vals_ref, out_ref):
        b = pl.program_id(0)
        base = b * blk
        out_ref[:] = jnp.zeros_like(out_ref)

        if unroll == 1:
            def body(i, _):
                r = idx_ref[i] - base
                in_blk = (r >= 0) & (r < blk)
                rc = jnp.where(in_blk, r, 0)

                @pl.when(in_blk)
                def _():
                    out_ref[pl.ds(rc, 1), :] += vals_ref[pl.ds(i, 1), :]

                return 0

            jax.lax.fori_loop(0, nu, body, 0)
        else:
            def body(j, _):
                for u in range(unroll):
                    i = j * unroll + u
                    r = idx_ref[i] - base
                    in_blk = (r >= 0) & (r < blk)
                    rc = jnp.where(in_blk, r, 0)

                    @pl.when(in_blk)
                    def _():
                        out_ref[pl.ds(rc, 1), :] += vals_ref[pl.ds(i, 1), :]
                return 0

            jax.lax.fori_loop(0, nu // unroll, body, 0)
            for i in range((nu // unroll) * unroll, nu):
                r = idx_ref[i] - base
                in_blk = (r >= 0) & (r < blk)
                rc = jnp.where(in_blk, r, 0)

                @pl.when(in_blk)
                def _():
                    out_ref[pl.ds(rc, 1), :] += vals_ref[pl.ds(i, 1), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((nu, width), lambda b, idx: (0, 0))],
        out_specs=pl.BlockSpec((blk, width), lambda b, idx: (b, 0)),
    )

    padded_rows = blk * n_blocks

    def scatter(idx, vals):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((padded_rows, width), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(idx, vals)
        return out[:n_rows]

    return scatter


def main():
    bf16 = "--bf16" in sys.argv
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    width = 128
    results = {"bf16": bf16}
    print(f"device={jax.devices()[0]}  K={K}  width={width}  "
          f"dtype={jnp.dtype(dtype).name}", flush=True)

    shapes = [("fine@11.5k", 160801, 11567), ("coarse@11.5k", 40401, 11567),
              ("fine@5.8k", 160801, 5784), ("fine@23k", 160801, 23134),
              ("fine@92k", 160801, 92536)]
    for tag, n_rows, nu in shapes:
        key = jax.random.PRNGKey(0)
        idx = jax.random.randint(key, (nu,), 0, n_rows, jnp.int32)
        vals = jax.random.normal(jax.random.fold_in(key, 1),
                                 (nu, width)).astype(dtype)

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

        variants = [("xla", xla_scatter),
                    ("pallasU8", make_pallas_scatter(n_rows, nu, width, dtype,
                                                     unroll=8))]
        if bf16:
            # bf16 RMW never compiles; accumulate in fp32, cast at the edges
            f32k = make_pallas_scatter(n_rows, nu, width, jnp.float32,
                                       unroll=8)
            variants.append(("pallasF32acc", lambda i, v: f32k(
                i, v.astype(jnp.float32)).astype(jnp.bfloat16)))

        for name, fn in variants:
            full = f"{tag}/{name}"
            try:
                got = np.asarray(fn(idx, vals), np.float32)
                err = float(np.abs(got - ref).max())
                ok = err <= (1e-2 if bf16 else 1e-4) * max(1.0, np.abs(ref).max())
                if not ok:
                    print(f"{full:44s} WRONG (max err {err:.3g})", flush=True)
                    results[full] = f"wrong:{err:.3g}"
                    continue
                results[full] = timed(full, chain(fn), idx, vals)
            except Exception as e:  # noqa: BLE001 — probe records failures
                msg = str(e).split("\n")[0][:160]
                print(f"{full:44s} FAILED: {msg}", flush=True)
                results[full] = f"failed:{msg}"

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
