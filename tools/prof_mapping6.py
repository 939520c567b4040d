"""Gather/scatter cost surface: marginal in-program cost vs row width and
dtype, at the mapping workload's index count (92160 points).

Decides whether merging coarse+fine packed tables (6 -> 3 indices/point,
2x row bytes) wins: it does iff the cost is index-latency-bound, not
bandwidth-bound, at 256-512 float rows.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def marginal(name, make_fn, reps=(4, 16), R=8):
    keys = [jax.random.PRNGKey(i) for i in range(R)]
    times = []
    for k_reps in reps:
        f = make_fn(k_reps)
        out = f(keys[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for k in keys:
            out = f(k)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / R * 1e3)
    per = (times[1] - times[0]) / (reps[1] - reps[0])
    return per


def main():
    print(f"device={jax.devices()[0]}")
    N = 92160
    T = 161604

    for width in (128, 256, 512):
        for dtype in (jnp.float32, jnp.bfloat16):
            table = jax.random.normal(jax.random.PRNGKey(1), (T, width), dtype)

            def mk_gather(k_reps):
                @jax.jit
                def f(key):
                    def body(i, acc):
                        idx = jax.random.randint(
                            jax.random.fold_in(key, i), (N,), 0, T)
                        return acc + table[idx].sum(dtype=jnp.float32)
                    return jax.lax.fori_loop(0, k_reps, body, 0.0)
                return f

            per = marginal(f"g w{width} {dtype.__name__}", mk_gather)
            bw = N * width * table.dtype.itemsize / (per * 1e-3) / 1e9
            print(f"gather  [{T},{width}] {str(dtype.__name__):9s} "
                  f"{per:7.3f} ms  {per / N * 1e6:6.1f} ns/idx  {bw:6.0f} GB/s")

    for width in (128, 256, 512):
        for dtype in (jnp.float32, jnp.bfloat16):
            upd = jnp.ones((N, width), dtype)

            def mk_scatter(k_reps):
                @jax.jit
                def f(key):
                    def body(i, acc):
                        idx = jax.random.randint(
                            jax.random.fold_in(key, i), (N,), 0, T)
                        return acc.at[idx].add(upd)
                    z = jnp.zeros((T, width), dtype)
                    return jax.lax.fori_loop(0, k_reps, body, z).sum(
                        dtype=jnp.float32)
                return f

            per = marginal(f"s w{width} {dtype.__name__}", mk_scatter)
            bw = N * width * upd.dtype.itemsize / (per * 1e-3) / 1e9
            print(f"scatter [{T},{width}] {str(dtype.__name__):9s} "
                  f"{per:7.3f} ms  {per / N * 1e6:6.1f} ns/idx  {bw:6.0f} GB/s")


if __name__ == "__main__":
    main()
