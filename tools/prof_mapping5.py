"""Marginal in-program gather cost (the number that matters in production).

Standalone gather programs show a ~3 ms wall floor on the remote backend;
this measures the SLOPE: k chained gathers inside one jit, cost(k2)-cost(k1).
Also: does re-using one index array vs fresh arrays change dispatch cost
(host->device transfer latency test).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(name, f, args_list):
    out = f(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list:
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / len(args_list) * 1e3
    print(f"{name:56s} {ms:8.2f} ms")
    return ms


def main():
    print(f"device={jax.devices()[0]}")
    R = 10
    table = jax.random.normal(jax.random.PRNGKey(1), (161604, 128))
    keys = [jax.random.PRNGKey(i) for i in range(R)]

    def chain(k_reps, n):
        @jax.jit
        def f(key):
            def body(i, acc):
                idx = jax.random.randint(jax.random.fold_in(key, i), (n,),
                                         0, table.shape[0])
                return acc + table[idx].sum()
            return jax.lax.fori_loop(0, k_reps, body, 0.0)
        return f

    for n in (2048, 92160):
        t1 = timeit(f"fori x1   gather {n} rows", chain(1, n), [(k,) for k in keys])
        t4 = timeit(f"fori x4   gather {n} rows", chain(4, n), [(k,) for k in keys])
        t16 = timeit(f"fori x16  gather {n} rows", chain(16, n), [(k,) for k in keys])
        per = (t16 - t4) / 12.0
        print(f"  -> marginal per-gather({n}): {per:.3f} ms "
              f"({per / n * 1e6:.1f} ns/idx)")

    # scatter-add marginal (the backward of the gather)
    def chain_sc(k_reps, n):
        upd = jnp.ones((n, 128))

        @jax.jit
        def f(key):
            def body(i, acc):
                idx = jax.random.randint(jax.random.fold_in(key, i), (n,),
                                         0, table.shape[0])
                return acc.at[idx].add(upd)
            return jax.lax.fori_loop(0, k_reps, body, jnp.zeros_like(table)).sum()
        return f

    for n in (2048, 92160):
        t4 = timeit(f"fori x4   scatter {n} rows", chain_sc(4, n), [(k,) for k in keys])
        t16 = timeit(f"fori x16  scatter {n} rows", chain_sc(16, n), [(k,) for k in keys])
        per = (t16 - t4) / 12.0
        print(f"  -> marginal per-scatter({n}): {per:.3f} ms "
              f"({per / n * 1e6:.1f} ns/idx)")

    # dispatch-transfer test: same arg array vs fresh arg arrays
    idx_same = jax.random.randint(jax.random.PRNGKey(0), (2048,), 0, table.shape[0])
    idx_fresh = [(jax.random.randint(k, (2048,), 0, table.shape[0]),) for k in keys]
    g = jax.jit(lambda i: table[i].sum())
    timeit("gather, SAME idx arg x10", g, [(idx_same,)] * R)
    jax.block_until_ready([a[0] for a in idx_fresh])
    timeit("gather, FRESH idx args (pre-synced)", g, idx_fresh)


if __name__ == "__main__":
    main()
