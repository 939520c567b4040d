"""Correlation-kernel variants: VPU lane-reduce dot vs MXU dot, and
masked-edge skipping. Direct timing protocol (see prof_scatter3 header).

Shapes: E edges (incl. padding), HW=3200 pixels, C=128, 4 levels, nx=8.
The production kernel (`pallas_kernels._corr_window_kernel_ml`) spends its
time in per-pixel [64,128]*[128] multiply + lane-reduction on the VPU
(~12 GFLOP per 75-edge update). Variants here re-express the dot on the
MXU and skip masked (padding) edges entirely.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def direct(name, f, args, n_inner, reps=5):
    out = f(*args)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:58s} {med:8.2f} ms", flush=True)
    return med


def kernel_dot(ii_ref, jj_ref, mask_ref, f1_ref, f2_0, f2_1, f2_2, f2_3,
               xs_0, xs_1, xs_2, xs_3, out_0, out_1, out_2, out_3,
               *, hw, nx, w2ps, use_mxu, skip_masked):
    f2_refs = (f2_0, f2_1, f2_2, f2_3)
    xs_refs = (xs_0, xs_1, xs_2, xs_3)
    out_refs = (out_0, out_1, out_2, out_3)

    def run():
        def body(p, _):
            f1p = f1_ref[0, p, :]
            for lvl in range(4):
                start = xs_refs[lvl][0, p, 0]
                rows = [f2_refs[lvl][0, pl.ds(start + j * w2ps[lvl], nx), :]
                        for j in range(nx)]
                slab = jnp.concatenate(rows, axis=0)       # [nx*nx, C]
                if use_mxu:
                    dots = jax.lax.dot_general(
                        slab, f1p[:, None],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)[:, 0]
                else:
                    dots = jnp.sum(slab * f1p[None, :], axis=-1)
                out_refs[lvl][0, p, :] = dots
            return 0

        jax.lax.fori_loop(0, hw, body, 0)

    if skip_masked:
        e = pl.program_id(0)

        @pl.when(mask_ref[e] != 0)
        def _():
            run()
    else:
        run()


def make_call(E, HW, C, f2_shapes, nx, w2ps, use_mxu, skip_masked):
    def idx_e(e, s_ii, s_jj, s_m):
        return (e, 0, 0)

    in_specs = [pl.BlockSpec((1, HW, C), lambda e, si, sj, sm: (si[e], 0, 0),
                             memory_space=pltpu.VMEM)]
    for H2W2p in f2_shapes:
        in_specs.append(pl.BlockSpec((1, H2W2p, C),
                                     lambda e, si, sj, sm: (sj[e], 0, 0),
                                     memory_space=pltpu.VMEM))
    for _ in range(4):
        in_specs.append(pl.BlockSpec((1, HW, 1), idx_e, memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(E,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec((1, HW, nx * nx), idx_e,
                                     memory_space=pltpu.VMEM) for _ in range(4)),
    )
    kernel = functools.partial(kernel_dot, hw=HW, nx=nx, w2ps=tuple(w2ps),
                               use_mxu=use_mxu, skip_masked=skip_masked)

    def call(ii, jj, mask, f1_rows, f2_levels, xs_args):
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(jax.ShapeDtypeStruct((E, HW, nx * nx), jnp.float32)
                            for _ in range(4)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(ii, jj, mask, f1_rows, *f2_levels, *xs_args)
        return outs[0]

    return call


def main():
    N, C, H, W = 64, 128, 40, 80
    HW = H * W
    E = 91
    n_real = 75
    radius = 3
    nx = 2 * radius + 1 + 1
    key = jax.random.PRNGKey(0)

    f1_rows = jax.random.normal(key, (N, HW, C)) * 0.1
    f2_levels, w2ps, f2_shapes = [], [], []
    for lvl in range(4):
        H2, W2 = H >> lvl, W >> lvl
        padl = 2 * radius + 1
        w2p = W2 + padl + nx
        h2p = H2 + padl + nx
        f2 = jax.random.normal(jax.random.fold_in(key, lvl),
                               (N, h2p * w2p, C)) * 0.1
        f2_levels.append(f2)
        w2ps.append(w2p)
        f2_shapes.append(h2p * w2p)

    ii = jnp.asarray(np.random.default_rng(0).integers(0, N, E), jnp.int32)
    jj = jnp.asarray(np.random.default_rng(1).integers(0, N, E), jnp.int32)
    mask = jnp.asarray((np.arange(E) < n_real).astype(np.int32))
    xs_args = []
    for lvl in range(4):
        H2, W2 = H >> lvl, W >> lvl
        xs = np.random.default_rng(2 + lvl).integers(
            0, (H2 + 2) * w2ps[lvl], (E, HW, 1)).astype(np.int32)
        xs_args.append(jnp.asarray(xs))

    print(f"device={jax.devices()[0]}  E={E} real={n_real} HW={HW}", flush=True)

    for use_mxu in (False, True):
        for skip in (False, True):
            call = make_call(E, HW, C, f2_shapes, nx, w2ps, use_mxu, skip)
            jc = jax.jit(lambda *a, c=call: c(*a))
            tag = f"{'mxu' if use_mxu else 'vpu'}{' +skip-masked' if skip else ''}"
            try:
                direct(f"corr 4-level kernel [{tag}]", jc,
                       (ii, jj, mask, f1_rows, f2_levels, xs_args), 1)
            except Exception as ex:
                print(f"corr [{tag}] FAILED: {type(ex).__name__}: {str(ex)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
