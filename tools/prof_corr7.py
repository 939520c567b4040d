"""Correlation benchmarks, correctly protocoled.

Earlier corr benches (prof_corr2/prof_corr3) fetched the full [E,196,H,W]
output (~228 MB) through the remote tunnel — fetch-bound garbage. Here
every timed program reduces to a SCALAR on device and chains k corr
evaluations in one jitted fori_loop (outputs feed a running sum, inputs
perturbed per iteration so nothing hoists), fetch at the end.

Measures: production alt_corr_pallas_ml, alt_corr_xla, the pl.when
masked-edge skip variant, and the MXU-dot variant, at frontend shapes.
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

K = 8


def direct(name, chain_fn, args, k=K, reps=5):
    f = jax.jit(chain_fn)
    float(np.asarray(f(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:58s} {med / k:8.2f} ms/call  (chain {med:.0f} ms)",
          flush=True)
    return med / k


def main():
    from mneslam_tpu.ops import correlation
    from mneslam_tpu.ops import pallas_kernels

    N, C, H, W = 64, 128, 40, 80
    E, n_real = 91, 75
    key = jax.random.PRNGKey(0)
    fmaps = jax.random.normal(key, (N, C, H, W)) * 0.1
    coords0 = (jnp.stack(jnp.meshgrid(jnp.arange(W), jnp.arange(H),
                                      indexing="xy"), axis=-1)
               .astype(jnp.float32)[None]
               + jax.random.normal(jax.random.fold_in(key, 1), (E, H, W, 2)))

    n_kf = 26
    ii = np.concatenate([np.arange(0, n_kf - 1), np.arange(1, n_kf),
                         np.arange(0, n_kf - 2), np.arange(2, n_kf)])[:E]
    jj = np.concatenate([np.arange(1, n_kf), np.arange(0, n_kf - 1),
                         np.arange(2, n_kf), np.arange(0, n_kf - 2)])[:E]
    iij = jnp.asarray(ii, jnp.int32)
    jjj = jnp.asarray(jj, jnp.int32)
    print(f"device={jax.devices()[0]}  E={E} real={n_real}", flush=True)

    def chain(corr_fn):
        def f(fmaps, coords):
            def body(i, acc):
                c = coords + 1e-6 * i
                out = corr_fn(fmaps, iij, jjj, c)
                return acc + out.sum()
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f

    direct("alt_corr_pallas_ml (production)",
           chain(correlation.alt_corr_pallas_ml), (fmaps, coords0))
    direct("alt_corr_xla",
           chain(correlation.alt_corr_xla), (fmaps, coords0))

    # --- masked-skip + MXU variants over the production kernel ---
    def make_variant(use_mxu, skip_masked, mask_np, unroll=1):
        radius = 3
        rd = 2 * radius + 1
        nx = rd + 1
        padl = rd
        mask = jnp.asarray(mask_np, jnp.int32)

        def kernel(ii_ref, jj_ref, mask_ref, f1_ref,
                   f2_0, f2_1, f2_2, f2_3, xs_0, xs_1, xs_2, xs_3,
                   out_0, out_1, out_2, out_3, *, hw, w2ps):
            f2_refs = (f2_0, f2_1, f2_2, f2_3)
            xs_refs = (xs_0, xs_1, xs_2, xs_3)
            out_refs = (out_0, out_1, out_2, out_3)

            def run():
                U = unroll

                def body(pb, _):
                    outs = [[] for _ in range(4)]
                    for u in range(U):
                        p = pb * U + u
                        f1p = f1_ref[0, p, :]
                        for lvl in range(4):
                            start = xs_refs[lvl][0, p, 0]
                            rows = [f2_refs[lvl][0, pl.ds(start + j * w2ps[lvl], nx), :]
                                    for j in range(nx)]
                            slab = jnp.concatenate(rows, axis=0)
                            outs[lvl].append(jnp.sum(slab * f1p[None, :], axis=-1))
                    for lvl in range(4):
                        if U == 1:
                            out_refs[lvl][0, pb, :] = outs[lvl][0]
                        else:
                            out_refs[lvl][0, pl.ds(pb * U, U), :] = jnp.stack(outs[lvl])
                    return 0
                jax.lax.fori_loop(0, hw // U, body, 0)

            if skip_masked:
                e = pl.program_id(0)

                @pl.when(mask_ref[e] != 0)
                def _():
                    run()
            else:
                run()

        def corr_fn(fmaps, ii, jj, coords):
            pyr = correlation.build_pyramid(fmaps)
            Nn, Cc, Hh, Ww = pyr[0].shape
            HW = Hh * Ww
            Ee = ii.shape[0]
            f1_rows = pyr[0].transpose(0, 2, 3, 1).reshape(Nn, HW, Cc)
            cflat = coords.reshape(Ee, HW, 2)
            f2_levels, w2ps, xs_args, shapes = [], [], [], []
            for lvl, f2 in enumerate(pyr):
                H2, W2 = f2.shape[2], f2.shape[3]
                w2p = W2 + padl + nx
                f2_pad = jnp.pad(f2.transpose(0, 2, 3, 1),
                                 ((0, 0), (padl, nx), (padl, nx), (0, 0)))
                f2_levels.append(f2_pad.reshape(Nn, -1, Cc))
                w2ps.append(w2p)
                shapes.append(f2_levels[-1].shape[1])
                c = cflat / (2 ** lvl)
                x0 = jnp.clip(jnp.floor(c[..., 0]).astype(jnp.int32),
                              -(radius + 1), W2 + radius)
                y0 = jnp.clip(jnp.floor(c[..., 1]).astype(jnp.int32),
                              -(radius + 1), H2 + radius)
                xs_args.append(((y0 - radius + padl) * w2p
                                + (x0 - radius + padl))[..., None])

            def idx_e(e, si, sj, sm):
                return (e, 0, 0)

            in_specs = [pl.BlockSpec((1, HW, Cc),
                                     lambda e, si, sj, sm: (si[e], 0, 0),
                                     memory_space=pltpu.VMEM)]
            for s in shapes:
                in_specs.append(pl.BlockSpec(
                    (1, s, Cc), lambda e, si, sj, sm: (sj[e], 0, 0),
                    memory_space=pltpu.VMEM))
            for _ in range(4):
                in_specs.append(pl.BlockSpec((1, HW, 1), idx_e,
                                             memory_space=pltpu.VMEM))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3, grid=(Ee,), in_specs=in_specs,
                out_specs=tuple(pl.BlockSpec((1, HW, nx * nx), idx_e,
                                             memory_space=pltpu.VMEM)
                                for _ in range(4)))
            outs = pl.pallas_call(
                functools.partial(kernel, hw=HW, w2ps=tuple(w2ps)),
                grid_spec=grid_spec,
                out_shape=tuple(jax.ShapeDtypeStruct((Ee, HW, nx * nx),
                                                     jnp.float32)
                                for _ in range(4)),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(ii, jj, mask, f1_rows, *f2_levels,
              *[x.astype(jnp.int32) for x in xs_args])
            return jnp.stack(outs, axis=2)

        return corr_fn

    mask_np = (np.arange(E) < n_real).astype(np.int32)
    for unroll in (8, 16, 32):
        tag = f"vpu+skip u{unroll}"
        fn = make_variant(False, True, mask_np, unroll=unroll)
        try:
            direct(f"int-window kernel [{tag}]", chain(fn), (fmaps, coords0))
        except Exception as ex:
            print(f"[{tag}] FAILED: {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
