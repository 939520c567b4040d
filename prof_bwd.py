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

def timeit(name, loss_fn, reps=10):
    g = jax.jit(lambda p: jax.tree.reduce(lambda a,b: a+jnp.sum(b), jax.grad(loss_fn)(p), 0.0))
    o = g(params); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o = g(params)
    jax.block_until_ready(o)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

z = scene.sample_z_vals(d, R, None)
pts = (rays_o[:,None,:] + rays_d[:,None,:]*z[...,None]).reshape(-1,3)

timeit("grad: sum(raw) only (query path)", lambda p: jnp.sum(scene.query_color_sdf(p, pts)))
timeit("grad: render_rays rgb sum", lambda p: jnp.sum(scene.render_rays(p, rays_o, rays_d, d)["rgb"]))
timeit("grad: rgb+depth loss", lambda p: (lambda r: jnp.mean(jnp.square(r["rgb"]-rgb)) + jnp.mean(jnp.square(r["depth"]-d[:,0])))(scene.render_rays(p, rays_o, rays_d, d)))
def full(p):
    ret = scene.forward(p, rays_o, rays_d, rgb, d, key=None)
    return scene.get_loss_from_ret(ret)
timeit("grad: full forward (all losses)", full)
def full_nosdf(p):
    ret = scene.forward(p, rays_o, rays_d, rgb, d, key=None)
    return scene.get_loss_from_ret(ret, sdf=False)
timeit("grad: full minus sdf losses", full_nosdf)
