import time, jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.config import make_config
from mneslam_tpu.models.scene_rep import SceneRep

for dtype in ("float32", "bfloat16"):
    cfg = make_config({
      "mapping": {"bound": [[-4,4]]*3, "marching_cubes_bound": [[-4,4]]*3},
      "planes_res": {"coarse": 0.04, "fine": 0.02, "bound_dividable": 0.04},
      "training": {"render_dtype": dtype},
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
    bwd = jax.jit(lambda p: jax.tree.reduce(lambda a,b: a+jnp.sum(b),
        jax.grad(lambda q: scene.get_loss_from_ret(scene.forward(q, rays_o, rays_d, rgb, d, key=key)))(p), 0.0))
    o = bwd(params); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(10): o = bwd(params)
    jax.block_until_ready(o)
    print(f"{dtype}: fwd+bwd {(time.perf_counter()-t0)/10*1e3:.2f} ms")
