import glob, gzip, json, time, collections
import jax, jax.numpy as jnp
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
bwd = jax.jit(lambda p: jax.tree.reduce(lambda a,b: a+jnp.sum(b),
    jax.grad(lambda q: scene.get_loss_from_ret(scene.forward(q, rays_o, rays_d, rgb, d, key=key)))(p), 0.0))
o = bwd(params); jax.block_until_ready(o)
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(5):
        o = bwd(params)
    jax.block_until_ready(o)

files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if files:
    data = json.load(gzip.open(files[-1]))
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # find TPU device track events (op-level)
    agg = collections.Counter()
    for e in events:
        name = e.get("name", "")
        dur = e.get("dur", 0)
        agg[name] += dur
    for name, dur in agg.most_common(30):
        print(f"{dur/1e3/5:9.3f} ms  {name[:100]}")
