"""Isolate why the standalone corr-kernel repro ran 100x slower than the
production measurement: edge ordering (block-DMA reuse) vs harness bugs.
Times the PRODUCTION alt_corr_pallas_ml plus the XLA formulation, with
sorted (frontend-like) and random edge tables. Direct timing protocol.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def direct(name, f, args, reps=5):
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


def main():
    from mneslam_tpu.ops import correlation

    N, C, H, W = 64, 128, 40, 80
    E = 91
    key = jax.random.PRNGKey(0)
    fmaps = jax.random.normal(key, (N, C, H, W)) * 0.1
    coords = (jnp.stack(jnp.meshgrid(jnp.arange(W), jnp.arange(H),
                                     indexing="xy"), axis=-1)
              .astype(jnp.float32)[None]
              + jax.random.normal(jax.random.fold_in(key, 1), (E, H, W, 2)))

    n_kf = 26
    ii_s = np.concatenate([np.arange(0, n_kf - 1), np.arange(1, n_kf),
                           np.arange(0, n_kf - 2), np.arange(2, n_kf)])[:E]
    jj_s = np.concatenate([np.arange(1, n_kf), np.arange(0, n_kf - 1),
                           np.arange(2, n_kf), np.arange(0, n_kf - 2)])[:E]
    rng = np.random.default_rng(3)
    ii_r = rng.integers(0, N, E)
    jj_r = rng.integers(0, N, E)

    print(f"device={jax.devices()[0]}  E={E}", flush=True)
    for tag, ii, jj in (("sorted", ii_s, jj_s), ("random", ii_r, jj_r)):
        iij = jnp.asarray(ii, jnp.int32)
        jjj = jnp.asarray(jj, jnp.int32)
        direct(f"alt_corr_pallas_ml [{tag} edges]",
               correlation.alt_corr_pallas_ml, (fmaps, iij, jjj, coords))
        direct(f"alt_corr_xla [{tag} edges]",
               correlation.alt_corr_xla, (fmaps, iij, jjj, coords))


if __name__ == "__main__":
    main()
