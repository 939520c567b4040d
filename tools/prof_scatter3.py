"""Scatter width-vs-count calibration + merged-level backward prototype.

Protocol note: the k-slope marginal used in prof_scatter2 produced numbers
that did not reproduce under direct timing (tools/prof_hlo_diff.py) — all
timings here are DIRECT: one jitted k-iteration fori chain, warmed, median
of 5 fetch-synced wall times, k large enough that the ~30 ms dispatch/RTT
floor is <1 ms/iter.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

K = 40


def direct(name, f, args, k=K):
    float(np.asarray(f(*args)).ravel()[0])  # warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:58s} {med / k:7.3f} ms/iter  (chain {med:.0f} ms)",
          flush=True)
    return med / k


def main():
    HW_F, HW_C, R = 160801, 40401, 92364
    key = jax.random.PRNGKey(0)
    base = jax.random.randint(key, (2148,), 0, HW_F - 64)
    idx_f = (base[:, None] + jnp.arange(43)[None, :] % 64).reshape(-1)
    idx_c = idx_f % HW_C
    print(f"device={jax.devices()[0]}  {R} rows", flush=True)

    def chain(fn, width, dtype=jnp.float32):
        vals0 = jax.random.normal(jax.random.fold_in(key, width),
                                  (R, width)).astype(dtype)

        @jax.jit
        def f(vals):
            def body(i, acc):
                out = fn(vals + (1e-12 * i).astype(vals.dtype))
                return acc + out[0, 0].astype(jnp.float32) \
                    + out[HW_C // 2, 5].astype(jnp.float32)
            return jax.lax.fori_loop(0, K, body, 0.0)
        return f, (vals0,)

    # calibration: single scatters
    for width, dt, tag in ((128, jnp.float32, "fp32"),
                           (256, jnp.float32, "fp32"),
                           (128, jnp.bfloat16, "bf16"),
                           (256, jnp.bfloat16, "bf16")):
        f, a = chain(lambda v, w=width, d=dt:
                     jnp.zeros((HW_F, w), d).at[idx_f].add(v), width, dt)
        direct(f"single fine scatter {width}-wide {tag}", f, a)

    # 6 separate scatters (production backward shape)
    def six(v):
        o = None
        for i, (hw, idx) in enumerate(((HW_F, idx_f), (HW_F, (idx_f + 7) % HW_F),
                                       (HW_F, (idx_f + 13) % HW_F),
                                       (HW_C, idx_c), (HW_C, (idx_c + 7) % HW_C),
                                       (HW_C, (idx_c + 13) % HW_C))):
            s = jnp.zeros((hw, 128), v.dtype).at[idx].add(v + i)
            o = s[:HW_C] if o is None else o + s[:HW_C]
        return o

    f, a = chain(six, 128)
    direct("6 separate scatters fp32 (3 fine + 3 coarse)", f, a)

    # 3 merged scatters (coarse rides the fine grid, 256-wide)
    def three(v):
        o = None
        for i, idx in enumerate((idx_f, (idx_f + 7) % HW_F, (idx_f + 13) % HW_F)):
            s = jnp.zeros((HW_F, 256), v.dtype).at[idx].add(v + i)
            o = s[:HW_C, :128] if o is None else o + s[:HW_C, :128]
        return o

    f, a = chain(three, 256)
    direct("3 merged scatters fp32 (256-wide fine grid)", f, a)

    f, a = chain(three, 256, jnp.bfloat16)
    direct("3 merged scatters bf16", f, a)


if __name__ == "__main__":
    main()
