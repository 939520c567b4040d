import time, jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.config import make_config
from mneslam_tpu.models.scene_rep import SceneRep

cfg = make_config({
  "mapping": {"bound": [[-4,4]]*3, "marching_cubes_bound": [[-4,4]]*3},
  "planes_res": {"coarse": 0.04, "fine": 0.02, "bound_dividable": 0.04},
})
scene = SceneRep(cfg)
params = scene.init_params(jax.random.PRNGKey(0))
R = 2148
key = jax.random.PRNGKey(1)
rays_o = 0.1*jax.random.normal(key, (R,3))
rays_d = jax.random.normal(jax.random.fold_in(key,1), (R,3))
rays_d = rays_d/jnp.linalg.norm(rays_d,axis=-1,keepdims=True)
rgb = jax.random.uniform(jax.random.fold_in(key,2), (R,3))
d = 1.0+jax.random.uniform(jax.random.fold_in(key,3), (R,1))

def timeit(name, f, *a, reps=10):
    o = f(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for i in range(reps): o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

fwd = jax.jit(lambda p: scene.get_loss_from_ret(scene.forward(p, rays_o, rays_d, rgb, d, key=key)))
timeit("forward loss", fwd, params)
bwd = jax.jit(lambda p: jax.tree.reduce(lambda a,b: a+jnp.sum(b), jax.grad(lambda q: scene.get_loss_from_ret(scene.forward(q, rays_o, rays_d, rgb, d, key=key)))(p), 0.0))
timeit("forward+backward", bwd, params)

# isolate: plane sampling fwd+bwd only
N = R*43
pts = jax.random.uniform(jax.random.fold_in(key,5), (N,3), minval=-3, maxval=3)
samp = jax.jit(lambda p: jnp.sum(scene.plane_features(p["planes"], scene._normalize(pts))))
timeit("plane sample fwd (92k)", samp, params)
samp_b = jax.jit(lambda p: jax.tree.reduce(lambda a,b: a+jnp.sum(b), jax.grad(samp)(p), 0.0))
timeit("plane sample fwd+bwd (92k)", samp_b, params)
# bf16 planes variant
pb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params["planes"])
samp16 = jax.jit(lambda p: jnp.sum(scene.plane_features(p, scene._normalize(pts)).astype(jnp.float32)))
timeit("plane sample fwd bf16", samp16, pb)
samp16b = jax.jit(lambda p: jax.tree.reduce(lambda a,b: a+jnp.sum(b), jax.grad(samp16)(p), 0.0).astype(jnp.float32))
timeit("plane sample fwd+bwd bf16", samp16b, pb)
