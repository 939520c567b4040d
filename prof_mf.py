"""Break down the 32 ms per-frame motion-filter step on the real chip."""
import time
import jax, jax.numpy as jnp, numpy as np
from mneslam_tpu.models import droid_net
from mneslam_tpu.ops import correlation
from mneslam_tpu.tracking.motion_filter import encode_frame, encode_and_flow

H, W = 320, 640
params = droid_net.init_droid_net(jax.random.PRNGKey(0))
params = droid_net.cast_params(params, jnp.bfloat16)
img = jnp.asarray(np.random.default_rng(0).random((3, H, W), np.float32))

fmap = encode_frame(params, img)
net, inp = (jnp.zeros((128, H // 8, W // 8)), jnp.zeros((128, H // 8, W // 8)))


@jax.jit
def corr_update(fmap_prev, gmap, net, inp):
    corr = correlation.self_corr(fmap_prev, gmap)
    _, delta, _ = droid_net.update_apply(params["update"], net[None], inp[None], corr)
    return jnp.mean(jnp.linalg.norm(delta, axis=-1))


@jax.jit
def corr_only(fmap_prev, gmap):
    return correlation.self_corr(fmap_prev, gmap)


def bench(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms")
    return r


bench("encode_frame (fnet conv encoder)", encode_frame, params, img)
gmap = encode_frame(params, img)
bench("self_corr only", corr_only, fmap, gmap)
bench("self_corr + update GRU", corr_update, fmap, gmap, net, inp)
bench("fused encode_and_flow (prod path)", encode_and_flow, params, fmap, net, inp, img)
