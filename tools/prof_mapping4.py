"""Separate RNG (threefry) cost from gather cost in the mapping step.

Every slow micro-test in prof_mapping3 contained a `jax.random` call; the
RNG-free Adam test was fast. This times RNG primitives alone, and the same
gathers with precomputed indices.
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
    print(f"{name:56s} {(time.perf_counter() - t0) / len(args_list) * 1e3:8.2f} ms")


def main():
    print(f"device={jax.devices()[0]}")
    R = 10
    keys = [jax.random.PRNGKey(i) for i in range(R)]

    timeit("randint(2048) alone", jax.jit(
        lambda k: jax.random.randint(k, (2048,), 0, 81920).sum()),
        [(k,) for k in keys])
    timeit("randint(92160) alone", jax.jit(
        lambda k: jax.random.randint(k, (92160,), 0, 81920).sum()),
        [(k,) for k in keys])
    timeit("uniform(92160) alone", jax.jit(
        lambda k: jax.random.uniform(k, (92160,)).sum()),
        [(k,) for k in keys])
    timeit("split(3) + fold_in alone", jax.jit(
        lambda k: jax.random.split(jax.random.fold_in(k, 3), 3).sum()),
        [(k,) for k in keys])
    timeit("uniform(2148, 43) alone (perturb shape)", jax.jit(
        lambda k: jax.random.uniform(k, (2148, 43)).sum()),
        [(k,) for k in keys])

    # gathers with precomputed indices
    rays8 = jax.random.normal(jax.random.PRNGKey(1), (81920, 8))
    rays128 = jax.random.normal(jax.random.PRNGKey(2), (81920, 128))
    idx_list = [(jax.random.randint(k, (2048,), 0, 81920),) for k in keys]
    big_idx = [(jax.random.randint(k, (92160,), 0, 81920),) for k in keys]

    timeit("gather 2048 rows from [81920, 8], precomp idx", jax.jit(
        lambda i: rays8[i].sum()), idx_list)
    timeit("gather 2048 rows from [81920, 128], precomp idx", jax.jit(
        lambda i: rays128[i].sum()), idx_list)
    timeit("gather 92160 rows from [81920, 128], precomp idx", jax.jit(
        lambda i: rays128[i].sum()), big_idx)

    poses_flat = jnp.tile(jnp.eye(4).reshape(1, 16), (8, 1))
    sid_list = [(jax.random.randint(k, (2048,), 0, 8),) for k in keys]
    timeit("pose [16] row gather, precomp idx", jax.jit(
        lambda i: poses_flat[i].sum()), sid_list)
    timeit("pose one-hot matmul, precomp idx", jax.jit(
        lambda i: (jax.nn.one_hot(i, 8, dtype=jnp.float32) @ poses_flat).sum()),
        sid_list)

    # a chained program: does one leading RNG op serialize everything after?
    @jax.jit
    def rng_then_gather(k):
        i = jax.random.randint(k, (2048,), 0, 81920)
        return rays8[i].sum()

    timeit("randint(2048) -> gather (chained)", rng_then_gather,
           [(k,) for k in keys])


if __name__ == "__main__":
    main()
