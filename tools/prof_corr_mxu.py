"""A/B the VPU lane-reduce corr kernel vs the MXU-batched variant.

Frontend shapes (E edges at 320x640 -> 1/8-res 40x80, bf16 features).
Protocol: K-chained jitted fori_loop -> scalar, median of 5 fetch-synced
walls (CLAUDE.md).

Usage: python tools/prof_corr_mxu.py [E] [K]   (default 91 20)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mneslam_tpu.ops import correlation, projective


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 91
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    N, C, H, W = 32, 128, 40, 80

    rng = np.random.default_rng(0)
    fmaps = (jnp.asarray(rng.standard_normal((N, C, H, W), np.float32)) * 0.1
             ).astype(jnp.bfloat16)
    ii = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    jj = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    coords0 = projective.coords_grid(H, W)
    coords = (jnp.broadcast_to(coords0, (E, H, W, 2))
              + jnp.asarray(rng.uniform(-3, 3, (E, H, W, 2)), jnp.float32))
    mask = jnp.asarray((np.arange(E) < int(E * 0.8)).astype(np.int32))

    print(f"device={jax.devices()[0]}  E={E} HW={H*W} K={K}", flush=True)
    results = {}

    for tag, mxu in (("vpu", False), ("mxu", True)):
        @jax.jit
        def chain(fm, co):
            def body(i, acc):
                c = correlation.alt_corr_pallas_ml(
                    fm, ii, jj, co + 1e-6 * i, mask=mask, mxu=mxu)
                return acc + jnp.sum(c[:, 0, 0, 0].astype(jnp.float32))
            return jax.lax.fori_loop(0, K, body, 0.0)

        float(np.asarray(chain(fmaps, coords)))
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(chain(fmaps, coords)))
            walls.append(time.perf_counter() - t0)
        results[tag] = round(float(np.median(walls)) / K * 1e3, 2)
        print(f"{tag}: {results[tag]} ms/call", flush=True)

    # bitwise agreement (same integer-offset dots up to matmul accum order)
    a = correlation.alt_corr_pallas_ml(fmaps, ii, jj, coords, mask=mask)
    b = correlation.alt_corr_pallas_ml(fmaps, ii, jj, coords, mask=mask,
                                       mxu=True)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    results["max_abs_diff"] = err
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
