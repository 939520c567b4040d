"""Pallas TPU kernels for the gather-heavy hot ops.

The correlation window lookup (`/root/reference/src/lib/altcorr_kernel.cu`'s
job) is fundamentally 49 data-dependent reads per pixel — XLA lowers this to
a serialized gather loop from HBM (~latency-bound). The Pallas kernel keeps
the target frame's whole feature level resident in VMEM (<= 1.6 MB at
tracking resolution) and performs the per-pixel window reads as on-chip
sublane slices, with the edge dimension as the grid and feature/coord blocks
routed by scalar-prefetched frame indices (ii/jj).

Falls back transparently to the XLA formulation in `correlation.py` when
Pallas is unavailable (interpret mode covers CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_window_kernel(
    ii_ref,      # scalar prefetch [E]
    jj_ref,      # scalar prefetch [E]
    f1_ref,      # [1, HW, C]    features of frame ii[e] (row layout)
    f2_ref,      # [1, H2W2p, C] padded features of frame jj[e]
    xs_ref,      # [1, HW, 1] precomputed padded slab row starts (int32)
    out_ref,     # [1, HW, NX * NX] integer-offset correlations
    *,
    hw: int,
    nx: int,
    w2p: int,
):
    """Integer-offset correlation: out[p, i*nx+j] = dot(f1[p], f2[slab])."""

    def body(p, _):
        start = xs_ref[0, p, 0]
        f1p = f1_ref[0, p, :]                                  # [C]
        # the nx x nx integer window as nx sublane slices (zero padding in
        # f2 makes out-of-bounds reads contribute 0, matching the CUDA
        # sampler's within_bounds semantics)
        rows = [f2_ref[0, pl.ds(start + j * w2p, nx), :] for j in range(nx)]
        slab = jnp.concatenate(rows, axis=0)                   # [nx*nx, C] j-major
        dots = jnp.sum(slab * f1p[None, :], axis=-1)           # [nx*nx] j-major
        # stored j-major; the host-side bilinear combine accounts for it
        out_ref[0, p, :] = dots
        return 0

    jax.lax.fori_loop(0, hw, body, 0)


def _corr_window_kernel_ml(
    ii_ref, jj_ref, mask_ref,
    f1_ref,       # [1, HW, C]
    f2_0, f2_1, f2_2, f2_3,   # [1, H2W2p_l, C] per level
    xs_0, xs_1, xs_2, xs_3,   # [1, HW, 1] padded slab row starts per level
    out_0, out_1, out_2, out_3,   # [1, HW, NX * NX] per level
    *,
    hw: int,
    nx: int,
    w2ps,         # tuple of 4 padded widths
):
    f2_refs = (f2_0, f2_1, f2_2, f2_3)
    xs_refs = (xs_0, xs_1, xs_2, xs_3)
    out_refs = (out_0, out_1, out_2, out_3)

    # manual unroll: processing U pixels per loop step overlaps their
    # dynamic-slice reads and batches the output stores — 55 -> 30 ms at
    # the frontend shapes (tools/prof_corr6.py; lax.fori_loop's own unroll
    # is unsupported in Pallas TPU lowering)
    U = next(u for u in (16, 8, 4, 2, 1) if hw % u == 0)

    def run():
        def body(pb, _):
            outs = [[] for _ in range(4)]
            for u in range(U):
                p = pb * U + u
                f1p = f1_ref[0, p, :]
                for lvl in range(4):
                    start = xs_refs[lvl][0, p, 0]
                    rows = [f2_refs[lvl][0, pl.ds(start + j * w2ps[lvl], nx), :]
                            for j in range(nx)]
                    slab = jnp.concatenate(rows, axis=0)   # [nx*nx, C] j-major
                    outs[lvl].append(jnp.sum(slab * f1p[None, :], axis=-1))
            for lvl in range(4):
                if U == 1:
                    out_refs[lvl][0, pb, :] = outs[lvl][0]
                else:
                    out_refs[lvl][0, pl.ds(pb * U, U), :] = jnp.stack(outs[lvl])
            return 0

        jax.lax.fori_loop(0, hw // U, body, 0)

    # padded edges (mask 0) skip the whole per-pixel loop — the edge table
    # is a fixed-capacity buffer, typically ~20% padding. Outputs are
    # zeroed (not left stale): uninitialized VMEM could hold NaNs, and a
    # NaN survives the downstream mask-multiplies (NaN * 0 = NaN) into the
    # damping segment means.
    e = pl.program_id(0)

    @pl.when(mask_ref[e] != 0)
    def _():
        run()

    @pl.when(mask_ref[e] == 0)
    def _():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)


def _corr_window_kernel_ml_mxu(
    ii_ref, jj_ref, mask_ref,
    f1_ref,
    f2_0, f2_1, f2_2, f2_3,
    xs_0, xs_1, xs_2, xs_3,
    out_0, out_1, out_2, out_3,
    *,
    hw: int,
    nx: int,
    w2ps,
):
    """MXU variant: batch U pixels' window dots into one matmul per level.

    Per block of U pixels and level l: assemble S [U*nx*nx, C] from the
    same sublane slices as the VPU kernel, compute S @ f1_blockᵀ on the
    MXU ([U*nx², C] x [C, U] — U-fold redundant flops, but the MXU's
    throughput advantage over the VPU lane-reduce can absorb >U x), then
    pick each pixel's own column with a one-hot contraction."""
    f2_refs = (f2_0, f2_1, f2_2, f2_3)
    xs_refs = (xs_0, xs_1, xs_2, xs_3)
    out_refs = (out_0, out_1, out_2, out_3)

    U = next(u for u in (16, 8, 4, 2, 1) if hw % u == 0)
    nn = nx * nx

    def run():
        eye = jax.lax.broadcasted_iota(jnp.int32, (U, U), 0) == \
            jax.lax.broadcasted_iota(jnp.int32, (U, U), 1)

        def body(pb, _):
            f1b = f1_ref[0, pl.ds(pb * U, U), :]               # [U, C]
            for lvl in range(4):
                rows = []
                for u in range(U):
                    p = pb * U + u
                    start = xs_refs[lvl][0, p, 0]
                    rows += [f2_refs[lvl][0, pl.ds(start + j * w2ps[lvl], nx), :]
                             for j in range(nx)]
                S = jnp.concatenate(rows, axis=0)              # [U*nn, C]
                dots = jax.lax.dot_general(
                    S, f1b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [U*nn, U]
                d4 = dots.reshape(U, nn, U)
                res = jnp.sum(d4 * eye[:, None, :].astype(d4.dtype), axis=-1)
                out_refs[lvl][0, pl.ds(pb * U, U), :] = res.astype(
                    out_refs[lvl].dtype)
            return 0

        jax.lax.fori_loop(0, hw // U, body, 0)

    e = pl.program_id(0)

    @pl.when(mask_ref[e] != 0)
    def _():
        run()

    @pl.when(mask_ref[e] == 0)
    def _():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)


def corr_window_int_multilevel(
    f1_rows: jax.Array,        # [N, HW, C]
    f2_levels,                 # list of 4 [N, H2W2p_l, C]
    ii: jax.Array,
    jj: jax.Array,
    xs: jax.Array,             # [E, HW, 4]
    nx: int,
    w2ps,                      # tuple of 4 padded widths
    mask: jax.Array | None = None,   # [E] int, 0 = padded edge (skipped)
    interpret: bool = False,
    mxu: bool = False,
) -> jax.Array:
    """All 4 pyramid levels in one kernel -> [E, HW, 4*nx*nx] (j-major per
    level). Amortizes the per-pixel loop overhead and the f1 row read 4x
    versus one kernel per level. Edges with mask 0 skip the per-pixel loop
    (zeroed outputs) — the fixed-capacity edge table is typically ~20%
    padding (measured 64 -> 55 ms at 75/91 real edges, tools/prof_corr4.py).
    `mxu`: batched-matmul window dots (see _corr_window_kernel_ml_mxu)."""
    E = ii.shape[0]
    N, HW, C = f1_rows.shape
    if mask is None:
        mask = jnp.ones((E,), jnp.int32)

    def idx_e(e, s_ii, s_jj, s_m):
        return (e, 0, 0)

    in_specs = [
        pl.BlockSpec((1, HW, C), lambda e, s_ii, s_jj, s_m: (s_ii[e], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for lv in f2_levels:
        H2W2p = lv.shape[1]
        in_specs.append(
            pl.BlockSpec((1, H2W2p, C),
                         lambda e, s_ii, s_jj, s_m: (s_jj[e], 0, 0),
                         memory_space=pltpu.VMEM))
    for _ in range(4):
        in_specs.append(pl.BlockSpec((1, HW, 1), idx_e, memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(E,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, HW, nx * nx), idx_e, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
    )
    kfn = _corr_window_kernel_ml_mxu if mxu else _corr_window_kernel_ml
    kernel = functools.partial(kfn, hw=HW, nx=nx, w2ps=tuple(w2ps))
    xs_args = [xs[..., l:l + 1].astype(jnp.int32) for l in range(4)]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((E, HW, nx * nx), f1_rows.dtype) for _ in range(4)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,  # all 4 levels resident
        ),
        interpret=interpret,
    )(ii, jj, mask.astype(jnp.int32), f1_rows, *f2_levels, *xs_args)
    return jnp.stack(outs, axis=2)  # [E, HW, 4, nx*nx]


def corr_window_int(
    f1_rows: jax.Array,   # [N, HW, C]
    f2_rows_pad: jax.Array,  # [N, H2W2p, C] x/y padded row layout
    ii: jax.Array,        # [E]
    jj: jax.Array,        # [E]
    xs: jax.Array,        # [E, HW] padded slab row starts
    nx: int,
    w2p: int,
    interpret: bool = False,
) -> jax.Array:
    """-> [E, HW, nx*nx] integer-offset correlations via Pallas."""
    E = ii.shape[0]
    N, HW, C = f1_rows.shape
    H2W2p = f2_rows_pad.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda e, s_ii, s_jj: (s_ii[e], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2W2p, C), lambda e, s_ii, s_jj: (s_jj[e], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HW, 1), lambda e, s_ii, s_jj: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, nx * nx), lambda e, s_ii, s_jj: (e, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_corr_window_kernel, hw=HW, nx=nx, w2p=w2p)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, HW, nx * nx), f1_rows.dtype),
        interpret=interpret,
    )(ii, jj, f1_rows, f2_rows_pad, xs[..., None].astype(jnp.int32))


# ---------------------------------------------------------------------------
# VMEM-resident scatter-add (the mapping backward's plane-cotangent scatter)
# ---------------------------------------------------------------------------

def _scatter_rows_kernel(idx_ref, vals_ref, out_ref, *, nu: int, unroll: int):
    """Serial accumulate: zero the VMEM-resident output block, then walk the
    update list with dynamic-sublane read-modify-writes. No sort, no
    comparison network — cost is nu scalar-loop iterations plus one table
    DMA, which beats XLA's sort-based scatter when nu is small relative to
    the table (measured crossover ~16k updates on a 160801-row table,
    tools/prof_pallas_scatter.py)."""
    out_ref[:] = jnp.zeros_like(out_ref)

    def accumulate(i):
        r = idx_ref[i]
        out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(i, 1), :]

    def body(j, _):
        for u in range(unroll):
            accumulate(j * unroll + u)
        return 0

    jax.lax.fori_loop(0, nu // unroll, body, 0)
    for i in range((nu // unroll) * unroll, nu):
        accumulate(i)


def scatter_add_rows_pallas(idx: jax.Array, vals: jax.Array, n_rows: int,
                            interpret: bool = False,
                            unroll: int = 8) -> jax.Array:
    """`jnp.zeros((n_rows, width), vals.dtype).at[idx].add(vals)` as a
    single-block Pallas kernel with the whole output table VMEM-resident
    (v5e VMEM fits the 82 MB fine packed-plane cotangent; probed up to
    120 MB). idx [nu] int32 in [0, n_rows); vals [nu, width].

    PRECONDITION: every idx must be in [0, n_rows). Unlike XLA's
    `.at[idx].add` (which DROPS out-of-range updates), the kernel's pl.ds
    CLAMPS — a negative index would corrupt row 0 and idx >= the padded
    row count would pile onto the last pad row. All production callers
    (ops/interp.py sampler VJPs) clip indices in-range before calling."""
    nu, width = vals.shape
    padded = -(-n_rows // 8) * 8  # sublane multiple
    kernel = functools.partial(_scatter_rows_kernel, nu=nu, unroll=unroll)
    try:
        # under shard_map the output must declare its varying mesh axes
        # (check_vma) — it varies exactly where the inputs do
        vma = frozenset(jax.typeof(idx).vma) | frozenset(jax.typeof(vals).vma)
    except (AttributeError, TypeError):  # older jax: no vma tracking
        vma = None
    out_shape = (jax.ShapeDtypeStruct((padded, width), vals.dtype)
                 if vma is None else
                 jax.ShapeDtypeStruct((padded, width), vals.dtype, vma=vma))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((nu, width), lambda b, idx: (0, 0))],
            out_specs=pl.BlockSpec((padded, width), lambda b, idx: (0, 0)),
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(idx.astype(jnp.int32), vals)
    return out[:n_rows]


def scatter_add_rows(idx: jax.Array, vals: jax.Array, n_rows: int) -> jax.Array:
    """Dispatching `zeros.at[idx].add(vals)`: Pallas serial-accumulate where
    it measured faster, XLA's scatter otherwise. Override with
    MNESLAM_SCATTER_IMPL=pallas|xla. Requires idx in [0, n_rows) (see
    scatter_add_rows_pallas; the XLA path drops OOB updates, the Pallas
    path clamps them).

    MNESLAM_SCATTER_IMPL=pallas is a single-device/shard_map override
    only: the heuristic's range gates are also what keeps pallas_call out
    of GSPMD-partitioned (pjit ray-sharded) and vmapped (agent-stacked
    fleet) contexts, where a scalar-prefetch pallas_call may fail to
    partition/batch or silently replicate the table per device. Do not
    force it globally in those deployments.

    Measured on v5e (tools/prof_pallas_scatter.py, K=200 direct timing,
    width 128): fine table (160801 rows) Pallas 0.449 vs XLA 0.727 ms at
    nu=11.5k fp32 (the 8-shard row-sharded mapper shape), 0.431 vs 0.716
    bf16, and 0.371/0.346 vs 0.439/0.424 at 16 shards; XLA wins on the
    coarse table (40401 rows: 0.342 vs 0.262) and at single-chip nu=92k.
    Round 5 (tools/prof_scatter_bucketed.py): a deeper unroll extends the
    win to nu=23k — the 4-shard row-sharded shape — where unroll=32 is
    0.395 vs XLA 0.411 (unroll=8 loses, 0.426), so the dispatcher uses
    unroll 32 above 16k updates and cuts over to XLA past 24k. Row-range
    BUCKETING of the kernel (grid over row blocks walking sorted update
    ranges) was measured and REJECTED for the larger counts: the bucketed
    walk itself wins at 92k (1.13 vs XLA 1.51) but only on PRE-SORTED
    updates, and the required argsort+permute routing costs ~0.67 ms —
    net 1.80 vs 1.51, a loss (VERDICT r4 next #2's ~4.5-vs-7.8 projection
    had compared one plane's bucketed cost against the six-plane trace
    total). A bf16 RMW kernel never compiles on this toolchain
    (persistent, not flaky) — bf16 inputs accumulate through the fp32
    kernel with casts at the edges, which is also numerically tighter
    than a bf16 accumulation."""
    import os

    nu, width = vals.shape
    impl = os.environ.get("MNESLAM_SCATTER_IMPL")
    if impl is None:
        use_pallas = (
            jax.default_backend() not in ("cpu",)
            and vals.dtype in (jnp.float32, jnp.bfloat16)
            and n_rows >= 100_000
            and nu <= 24_000
            and width % 128 == 0
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        interpret = jax.default_backend() == "cpu"  # env-forced CPU testing
        unroll = 32 if nu > 16_000 else 8
        if vals.dtype == jnp.bfloat16:
            return scatter_add_rows_pallas(
                idx, vals.astype(jnp.float32), n_rows,
                interpret=interpret, unroll=unroll).astype(jnp.bfloat16)
        return scatter_add_rows_pallas(idx, vals, n_rows,
                                       interpret=interpret, unroll=unroll)
    return jnp.zeros((n_rows, width), vals.dtype).at[idx].add(vals)
