import time, jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.config import make_config
from mneslam_tpu.models.scene_rep import SceneRep
from mneslam_tpu.models import decoder as dec_lib

cfg = make_config({
  "mapping": {"bound": [[-4,4]]*3, "marching_cubes_bound": [[-4,4]]*3},
  "planes_res": {"coarse": 0.04, "fine": 0.02, "bound_dividable": 0.04},
})
scene = SceneRep(cfg)
params = scene.init_params(jax.random.PRNGKey(0))
N = 92000
key = jax.random.PRNGKey(1)
pts = jax.random.uniform(key, (N,3), minval=-3, maxval=3)
p_nor = scene._normalize(pts)
pos = scene.pos_encode(scene._normalize01(pts))
embed_const = jax.random.normal(jax.random.fold_in(key,2), (N, 64))
cot = jax.random.normal(jax.random.fold_in(key,3), (N,))  # non-trivial cotangent

def timeit(name, fn, *a, reps=10):
    o = fn(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o = fn(*a)
    jax.block_until_ready(o)
    print(f"{name:48s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

g_a = jax.jit(lambda pl: jax.tree.reduce(lambda x,y: x+jnp.sum(y),
    jax.grad(lambda q: jnp.sum(cot[:,None]*scene.plane_features(q, p_nor)))(pl), 0.0))
timeit("a) grad planes only (real cotangent)", g_a, params["planes"])

g_b = jax.jit(lambda d: jax.tree.reduce(lambda x,y: x+jnp.sum(y),
    jax.grad(lambda q: jnp.sum(cot[:,None]*dec_lib.decoder_apply(q, embed_const, pos)))(d), 0.0))
timeit("b) grad decoder only", g_b, params["decoder"])

def chain(p):
    e = scene.plane_features(p["planes"], p_nor)
    return jnp.sum(cot[:,None]*dec_lib.decoder_apply(p["decoder"], e, pos))
g_c = jax.jit(lambda p: jax.tree.reduce(lambda x,y: x+jnp.sum(y), jax.grad(chain)(p), 0.0))
timeit("c) grad planes+decoder chain", g_c, params)

g_d = jax.jit(lambda p: jax.tree.reduce(lambda x,y: x+jnp.sum(y),
    jax.grad(lambda q: jnp.sum(cot[:,None]*scene.query_color_sdf(q, pts)))(p), 0.0))
timeit("d) grad full query (incl oneblob fwd)", g_d, params)

# e) same as (d) but oneblob precomputed outside
def query_nopos(p):
    pn = scene._normalize(pts)
    e = scene.plane_features(p["planes"], pn)
    return jnp.sum(cot[:,None]*dec_lib.decoder_apply(p["decoder"], e, pos))
g_e = jax.jit(lambda p: jax.tree.reduce(lambda x,y: x+jnp.sum(y), jax.grad(query_nopos)(p), 0.0))
timeit("e) grad query minus oneblob", g_e, params)
