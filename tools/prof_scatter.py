"""Scatter-add strategy shootout for the plane-gather backward.

prof_mapping9: the mapping backward is dominated by 6 scatter-adds of
~92k [4C]-rows into the packed plane tables (~19 ms with real cotangents,
vs 3 ms with a ones cotangent — XLA's TPU scatter hits a per-index floor
when the update values are a materialized array). Candidate replacements
measured here on the fine-plane shape ([160801, 128] table, 92364 rows).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def marginal(name, make_fn, args, reps=(2, 10)):
    ts = []
    for k in reps:
        f = make_fn(k)
        float(np.asarray(f(*args)).ravel()[0])  # warm
        t0 = time.perf_counter()
        for i in range(3):
            float(np.asarray(f(*args)).ravel()[0])
        ts.append((time.perf_counter() - t0) / 3)
    per = (ts[1] - ts[0]) / (reps[1] - reps[0]) * 1e3
    print(f"{name:58s} {per:8.2f} ms/rep", flush=True)
    return per


def main():
    HW, R, C4 = 160801, 92364, 128
    key = jax.random.PRNGKey(0)
    # clustered indices like ray samples: sorted-ish runs with jumps
    base = jax.random.randint(key, (2148,), 0, HW - 64)
    idx0 = (base[:, None] + jnp.arange(43)[None, :] % 64).reshape(-1)
    vals0 = jax.random.normal(jax.random.fold_in(key, 1), (R, C4))
    print(f"device={jax.devices()[0]}  {R} rows -> [{HW}, {C4}]", flush=True)

    def chain(fn):
        """Chain k reps through a value perturbation; fetch one scalar."""
        def mk(k):
            @jax.jit
            def f(idx, vals):
                def body(i, acc):
                    out = fn(idx, vals + 1e-12 * i)
                    return acc + out[0, 0] + out[HW // 2, 5]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        return mk

    # 1) plain scatter-add (what autodiff emits)
    marginal("(1) at[idx].add",
             chain(lambda i, v: jnp.zeros((HW, C4)).at[i].add(v)),
             (idx0, vals0))

    # 2) segment_sum, unsorted
    marginal("(2) segment_sum unsorted",
             chain(lambda i, v: jax.ops.segment_sum(v, i, num_segments=HW)),
             (idx0, vals0))

    # 3) sort + permute + sorted segment_sum
    def sorted_segsum(i, v):
        order = jnp.argsort(i)
        return jax.ops.segment_sum(v[order], i[order], num_segments=HW,
                                   indices_are_sorted=True)

    marginal("(3) argsort + permute + sorted segment_sum",
             chain(sorted_segsum), (idx0, vals0))

    # 4) sorted scatter via .at with hints
    def sorted_at(i, v):
        order = jnp.argsort(i)
        return jnp.zeros((HW, C4)).at[i[order]].add(
            v[order], indices_are_sorted=True)

    marginal("(4) argsort + at[].add(sorted)", chain(sorted_at), (idx0, vals0))

    # 5) bf16 values, plain scatter
    marginal("(5) at[idx].add bf16",
             chain(lambda i, v: jnp.zeros((HW, C4), jnp.bfloat16)
                   .at[i].add(v.astype(jnp.bfloat16)).astype(jnp.float32)),
             (idx0, vals0))

    # 6) sort cost alone (argsort + key-value permute)
    def just_sort(i, v):
        order = jnp.argsort(i)
        return v[order]

    marginal("(6) argsort + permute only", chain(just_sort), (idx0, vals0))

    # 7) pre-sorted input, sorted segment_sum only (no argsort)
    idx_sorted = jnp.sort(idx0)
    marginal("(7) sorted segment_sum only (pre-sorted idx)",
             chain(lambda i, v: jax.ops.segment_sum(
                 v, i, num_segments=HW, indices_are_sorted=True)),
             (idx_sorted, vals0))

    # 8) random (unclustered) indices, plain scatter — floor reference
    idx_rand = jax.random.randint(jax.random.fold_in(key, 9), (R,), 0, HW)
    marginal("(8) at[idx].add, random idx",
             chain(lambda i, v: jnp.zeros((HW, C4)).at[i].add(v)),
             (idx_rand, vals0))


if __name__ == "__main__":
    main()
