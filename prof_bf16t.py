import time, jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.models import droid_net
from mneslam_tpu.tracking.motion_filter import encode_frame, encode_context, flow_magnitude

params32 = droid_net.init_droid_net(jax.random.PRNGKey(0))
params16 = droid_net.cast_params(params32, jnp.bfloat16)
img = jnp.asarray(np.random.default_rng(0).random((3, 320, 640), np.float32))
net = jax.random.normal(jax.random.PRNGKey(1), (91, 128, 40, 80))
corr = jax.random.normal(jax.random.PRNGKey(2), (91, 196, 40, 80))
upd32 = jax.jit(lambda n, c: droid_net.update_apply(params32["update"], n, n, c))
upd16 = jax.jit(lambda n, c: droid_net.update_apply(params16["update"], n, n, c))

def timeit(name, f, *a, reps=10):
    o = f(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

timeit("update_apply fp32 (91 edges)", upd32, net, corr)
timeit("update_apply bf16 (91 edges)", upd16, net, corr)
# numeric agreement
a = upd32(net, corr); b = upd16(net, corr)
print("delta max diff:", float(jnp.max(jnp.abs(a[1]-b[1]))), " weight:", float(jnp.max(jnp.abs(a[2]-b[2]))))
timeit("fnet fp32", jax.jit(lambda x: encode_frame(params32, x)), img)
timeit("fnet bf16", jax.jit(lambda x: encode_frame(params16, x)), img)
f32m = encode_frame(params32, img); f16m = encode_frame(params16, img)
print("fmap rel err:", float(jnp.linalg.norm(f32m - f16m.astype(jnp.float32))/jnp.linalg.norm(f32m)))
