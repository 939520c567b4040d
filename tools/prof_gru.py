"""NCHW vs NHWC for the GRU/update conv stack (bf16, frontend shapes).

XLA TPU prefers NHWC convolutions; the torch-parity NCHW layout may be
paying per-conv relayouts. Times update_apply as-is vs an NHWC-internal
variant (weights transposed per call, activations converted at the
boundary), plus the boundary-transpose cost alone.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

K = 10


def direct(name, chain_fn, args, k=K, reps=5):
    f = jax.jit(chain_fn)
    float(np.asarray(f(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:58s} {med / k:8.2f} ms/call", flush=True)
    return med / k


def conv_nhwc(p, x, stride=1, padding=0):
    w = p["weight"].transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"][None, None, None, :]
    return out


def gru_nhwc(p, net, inp):
    net_inp = jnp.concatenate([net, inp], axis=-1)
    glo = jax.nn.sigmoid(conv_nhwc(p["w"], net)) * net
    glo = jnp.mean(glo, axis=(1, 2), keepdims=True)
    z = jax.nn.sigmoid(conv_nhwc(p["convz"], net_inp, padding=1)
                       + conv_nhwc(p["convz_glo"], glo))
    r = jax.nn.sigmoid(conv_nhwc(p["convr"], net_inp, padding=1)
                       + conv_nhwc(p["convr_glo"], glo))
    q = jnp.tanh(conv_nhwc(p["convq"], jnp.concatenate([r * net, inp], axis=-1),
                           padding=1)
                 + conv_nhwc(p["convq_glo"], glo))
    return (1 - z) * net + z * q


def update_nhwc(p, net, inp, corr, flow):
    c = jax.nn.relu(conv_nhwc(p["corr_encoder"][0], corr))
    c = jax.nn.relu(conv_nhwc(p["corr_encoder"][1], c, padding=1))
    f = jax.nn.relu(conv_nhwc(p["flow_encoder"][0], flow, padding=3))
    f = jax.nn.relu(conv_nhwc(p["flow_encoder"][1], f, padding=1))
    net = gru_nhwc(p["gru"], net, jnp.concatenate([inp, c, f], axis=-1))
    d = jax.nn.relu(conv_nhwc(p["delta"][0], net, padding=1))
    delta = conv_nhwc(p["delta"][1], d, padding=1)
    w = jax.nn.relu(conv_nhwc(p["weight"][0], net, padding=1))
    weight = jax.nn.sigmoid(conv_nhwc(p["weight"][1], w, padding=1))
    return net, delta.astype(jnp.float32), weight.astype(jnp.float32)


def main():
    from mneslam_tpu.models import droid_net

    E, h, w = 91, 40, 80
    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    params = droid_net.cast_params(params, jnp.bfloat16)
    p = params["update"]
    key = jax.random.PRNGKey(1)
    net = (jax.random.normal(key, (E, 128, h, w)) * 0.1).astype(jnp.bfloat16)
    inp = (jax.random.normal(jax.random.fold_in(key, 1), (E, 128, h, w)) * 0.1
           ).astype(jnp.bfloat16)
    corr = jax.random.normal(jax.random.fold_in(key, 2), (E, 196, h, w)) * 0.1
    flow = jax.random.normal(jax.random.fold_in(key, 3), (E, 4, h, w)) * 0.1
    print(f"device={jax.devices()[0]}  E={E}", flush=True)

    def chain_nchw(net0, inp, corr, flow):
        def body(i, n):
            n2, d, wt = droid_net.update_apply(p, n, inp, corr + (1e-6 * i), flow)
            return n2
        return jax.lax.fori_loop(0, K, body, net0)[0, 0, 0, 0].astype(jnp.float32)

    direct("update_apply NCHW (production)", chain_nchw, (net, inp, corr, flow))

    def chain_nhwc_boundary(net0, inp, corr, flow):
        def body(i, n):
            nt = n.transpose(0, 2, 3, 1)
            it = inp.transpose(0, 2, 3, 1)
            ct = (corr + (1e-6 * i)).transpose(0, 2, 3, 1).astype(jnp.bfloat16)
            ft = flow.transpose(0, 2, 3, 1).astype(jnp.bfloat16)
            n2, d, wt = update_nhwc(p, nt, it, ct, ft)
            return n2.transpose(0, 3, 1, 2)
        return jax.lax.fori_loop(0, K, body, net0)[0, 0, 0, 0].astype(jnp.float32)

    direct("update NHWC + boundary transposes", chain_nhwc_boundary,
           (net, inp, corr, flow))

    net_h = net.transpose(0, 2, 3, 1)
    inp_h = inp.transpose(0, 2, 3, 1)
    corr_h = corr.transpose(0, 2, 3, 1).astype(jnp.bfloat16)
    flow_h = flow.transpose(0, 2, 3, 1).astype(jnp.bfloat16)

    def chain_nhwc_native(net0, inp_h, corr_h, flow_h):
        def body(i, n):
            n2, d, wt = update_nhwc(p, n, inp_h, corr_h + (1e-6 * i), flow_h)
            return n2
        return jax.lax.fori_loop(0, K, body, net0)[0, 0, 0, 0].astype(jnp.float32)

    direct("update NHWC native (no boundary)", chain_nhwc_native,
           (net_h, inp_h, corr_h, flow_h))


if __name__ == "__main__":
    main()
