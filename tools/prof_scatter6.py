"""Round-3b scatter shootout: can FEWER, WIDER scatters beat the 6-plane
baseline?

prof_scatter5 established the per-plane scatter is comparison-bound
(sort-pipeline, payload width free: bf16 no gain).  If that holds, sharing
ONE scatter between the coarse and fine level of each orientation (the
coarse level exactly-upsampled onto the nested fine grid, so both levels
use the SAME cell index) should halve the sort count: 3 scatters of
[N, 8C=256] instead of 6 of [N, 4C=128].

Variants (direct protocol, K=40 chained fori_loop -> scalar, fresh indices
per iteration):

  W1 baseline   6 scatters: 3x [N,128]->[160801,128] + 3x ->[40401,128]
  W2 shared     3 scatters: [N,256] -> [160801,256]   (two-level shared)
  W3 fine3      3 scatters: [N,128] -> [160801,128]   (isolates count vs width)
  W4 permute    1 unique-indices permutation scatter [N,128] -> [N,128]
  W5 keysort    6x jnp.sort of [N] int32 keys alone   (sort floor)
  W6 ranks      6x counting-rank dest computation (256 buckets, chunked
                one-hot running count) -- the sort-free partition cost
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K, N_WALL = 40, 5
N = 92364
FINE, COARSE = 160801, 40401


def timed(name, fn, *args):
    float(np.asarray(fn(*args)).ravel()[0])
    walls = []
    for _ in range(N_WALL):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        walls.append(time.perf_counter() - t0)
    per = float(np.median(walls)) / K * 1e3
    print(f"{name:52s} {per:8.2f} ms/iter", flush=True)
    return per


def chain(body):
    @jax.jit
    def f(key):
        def it(i, acc):
            return acc + body(jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, K, it, 0.0)
    return f


def main():
    print(f"device={jax.devices()[0]}  N={N}  K={K}", flush=True)
    results = {}

    def mk(k, n_planes, width, table):
        ks = jax.random.split(k, 2 * n_planes)
        return ([jax.random.randint(ks[2 * p], (N,), 0, table) for p in range(n_planes)],
                [jax.random.normal(ks[2 * p + 1], (N, width)) for p in range(n_planes)])

    # W1: production baseline (3 fine + 3 coarse, 128-wide)
    def w1(k):
        idxs_f, vals_f = mk(jax.random.fold_in(k, 0), 3, 128, FINE)
        idxs_c, vals_c = mk(jax.random.fold_in(k, 1), 3, 128, COARSE)
        acc = 0.0
        for idx, v in zip(idxs_f, vals_f):
            tab = jnp.zeros((FINE, 128)).at[idx].add(v)
            acc = acc + tab[0, 0] + tab[-1, -1]
        for idx, v in zip(idxs_c, vals_c):
            tab = jnp.zeros((COARSE, 128)).at[idx].add(v)
            acc = acc + tab[0, 0] + tab[-1, -1]
        return acc

    results["w1_baseline6"] = timed("W1: 6 scatters (3 fine + 3 coarse), 128w",
                                    chain(w1), jax.random.PRNGKey(0))

    # W2: 3 shared two-level scatters, 256-wide
    def w2(k):
        idxs, vals = mk(k, 3, 256, FINE)
        acc = 0.0
        for idx, v in zip(idxs, vals):
            tab = jnp.zeros((FINE, 256)).at[idx].add(v)
            acc = acc + tab[0, 0] + tab[-1, -1]
        return acc

    results["w2_shared3_256"] = timed("W2: 3 shared scatters, 256w",
                                      chain(w2), jax.random.PRNGKey(0))

    # W3: 3 fine scatters, 128-wide (count-vs-width control)
    def w3(k):
        idxs, vals = mk(k, 3, 128, FINE)
        acc = 0.0
        for idx, v in zip(idxs, vals):
            tab = jnp.zeros((FINE, 128)).at[idx].add(v)
            acc = acc + tab[0, 0] + tab[-1, -1]
        return acc

    results["w3_fine3_128"] = timed("W3: 3 fine scatters, 128w",
                                    chain(w3), jax.random.PRNGKey(0))

    # W4: unique-indices permutation scatter (the sort-free "shuffle" cost)
    def w4(k):
        v = jax.random.normal(k, (N, 128))
        dest = jax.random.permutation(jax.random.fold_in(k, 7), N)
        tab = jnp.zeros((N, 128)).at[dest].set(v, unique_indices=True)
        return tab[0, 0] + tab[-1, -1]

    results["w4_unique_permute"] = timed("W4: unique permutation scatter [N,128]",
                                         chain(w4), jax.random.PRNGKey(0))

    # W5: key-only sort floor
    def w5(k):
        ks = jax.random.split(k, 6)
        acc = 0.0
        for p in range(6):
            idx = jax.random.randint(ks[p], (N,), 0, FINE)
            s = jnp.sort(idx)
            acc = acc + s[0].astype(jnp.float32) + s[-1].astype(jnp.float32)
        return acc

    results["w5_keysort6"] = timed("W5: 6x jnp.sort of [N] int32 keys",
                                   chain(w5), jax.random.PRNGKey(0))

    # W6: counting-rank dest (sort-free partition): bucket = idx >> 10
    # (157 buckets over FINE); rank via chunked running one-hot counts.
    CH = 4096
    NB = (FINE >> 10) + 1

    def ranks(idx):
        b = (idx >> 10).astype(jnp.int32)                       # [N]
        bc = b.reshape(-1, CH)                                   # [nc, CH]
        oh = jax.nn.one_hot(bc, NB, dtype=jnp.int32)             # [nc, CH, NB]
        within = jnp.cumsum(oh, axis=1) - oh                     # excl. rank in chunk
        per_chunk = oh.sum(axis=1)                               # [nc, NB]
        base = jnp.cumsum(per_chunk, axis=0) - per_chunk         # [nc, NB]
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(per_chunk.sum(0))[:-1]])
        rank = jnp.take_along_axis(within + base[:, None, :],
                                   bc[..., None], axis=-1)[..., 0]
        return (offs[b] + rank.reshape(-1)).astype(jnp.int32)

    def w6(k):
        ks = jax.random.split(k, 6)
        acc = 0.0
        for p in range(6):
            idx = jax.random.randint(ks[p], (N // CH * CH,), 0, FINE)
            d = ranks(idx)
            acc = acc + d[0].astype(jnp.float32) + d[-1].astype(jnp.float32)
        return acc

    results["w6_count_ranks6"] = timed("W6: 6x counting-rank dest (256-row buckets)",
                                       chain(w6), jax.random.PRNGKey(0))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
