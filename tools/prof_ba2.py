"""Is the windowed-BA in-context overhead the target/weight transposes?

bundle_adjust standalone (constant target/weight -> transposes hoisted)
runs 21 ms; inside update_step (fresh targets each call) the BA side costs
~44 ms. Chain bundle_adjust with per-iteration-varying targets to price
the non-hoistable layout conversion.
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.ops import ba as ba_lib

K = 10
N, ht, wd = 32, 40, 80
E = 182
key = jax.random.PRNGKey(0)
poses0 = jnp.tile(jnp.asarray([0.,0,0,0,0,0,1.]), (N,1)).at[:,0].set(jnp.arange(N)*0.02)
disps = jnp.ones((N, ht, wd)) * 0.7
intr = jnp.asarray([40., 40., 39.5, 19.5])
rng = np.random.default_rng(0)
ii = jnp.asarray(rng.integers(0, N-1, E), jnp.int32)
jj = jnp.asarray((np.asarray(ii)+1+rng.integers(0,3,E)) % N, jnp.int32)
emask = jnp.asarray((np.arange(E) < 150).astype(np.float32))
target0 = jnp.zeros((E, ht, wd, 2))
weight0 = jnp.ones((E, ht, wd, 2)) * 0.5
eta = jnp.ones((N, ht, wd)) * 1e-4

def direct(name, f, args):
    jf = jax.jit(f)
    float(np.asarray(jf(*args)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(np.asarray(jf(*args))); ts.append(time.perf_counter()-t0)
    print(f"{name:56s} {np.median(ts)/K*1e3:8.2f} ms/call", flush=True)

def chain_const(poses):
    prob = ba_lib.BAProblem(target=target0, weight=weight0, eta=eta, ii=ii, jj=jj, mask=emask)
    def body(i, p):
        np_, nd = ba_lib.bundle_adjust(p, disps, intr, prob, iters=2)
        return np_ + 1e-12 * nd.sum()
    return jax.lax.fori_loop(0, K, body, poses)[0, 0]

def chain_fresh(poses):
    def body(i, p):
        t = target0 + (1e-6 * i)
        w = weight0 + (1e-9 * i)
        prob = ba_lib.BAProblem(target=t, weight=w, eta=eta, ii=ii, jj=jj, mask=emask)
        np_, nd = ba_lib.bundle_adjust(p, disps, intr, prob, iters=2)
        return np_ + 1e-12 * nd.sum()
    return jax.lax.fori_loop(0, K, body, poses)[0, 0]

print(f"device={jax.devices()[0]}  E={E}", flush=True)
direct("bundle_adjust, constant targets (hoisted transpose)", chain_const, (poses0,))
direct("bundle_adjust, fresh targets each call", chain_fresh, (poses0,))
