import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from mneslam_tpu.ops import ba as ba_lib
from mneslam_tpu.ops import lie

ht, wd, Nf, E = 40, 80, 32, 273
poses = lie.identity((Nf,))
disps = 0.5*jnp.ones((Nf, ht, wd))
key = jax.random.PRNGKey(0)
tgt = jax.random.uniform(key, (E, ht, wd, 2), maxval=40)
ii = jnp.asarray(np.random.randint(0, Nf, E)); jj = jnp.asarray(np.random.randint(0, Nf, E))
prob = ba_lib.BAProblem(target=tgt, weight=jnp.ones_like(tgt), eta=1e-4*jnp.ones((Nf,ht,wd)),
                        ii=ii, jj=jj, mask=jnp.ones(E))
intr = jnp.asarray([10.,10.,40.,20.])

def timeit(name, f, reps=10):
    o = f(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o = f()
    jax.block_until_ready(o)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

timeit("bundle_adjust segment_sum (2 it)", partial(ba_lib.bundle_adjust, poses, disps, intr, prob, iters=2))

# isolated: segment_sum vs one-hot matmul for the E assembly
Ei = jax.random.normal(key, (E, 6, ht*wd))
seg = ii*Nf + ii
f_seg = jax.jit(lambda: jax.ops.segment_sum(Ei, seg, num_segments=Nf*Nf).sum())
timeit("segment_sum E blocks", f_seg)
onehot = (seg[None, :] == jnp.arange(Nf*Nf)[:, None]).astype(jnp.float32)
f_oh = jax.jit(lambda: (onehot @ Ei.reshape(E, -1)).sum())
timeit("one-hot matmul E blocks", f_oh)
