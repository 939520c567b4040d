"""Decompose the tracker update NET cost (GRU + encoders + heads + agg).

BASELINE round-2 attributed ~17 ms of the frontend update to "GRU + agg"
at E=91 bf16 40x80 — about 3x the ~6 ms bf16 MXU roofline of its ~1.2
TFLOP conv stack. This probe isolates the stages with the trusted direct
protocol (k-iteration jitted fori_loop chain reduced to a scalar, median
of >=5 fetch-synced walls) and measures fused-gate GRU variants:

  A  update_apply + agg_apply (production)
  B  update_apply only
  C  gru_apply only
  D  corr/flow encoders only
  E  delta/weight heads only
  F  agg only
  G  gru with convz+convr+convq decomposed into one conv over `inp`
     (3x128 out) + one conv over `net` (2x128) + one conv over r*net
     (fewer, fatter GEMMs; same math to float tolerance)
  H  update_apply with the G-variant gru

Usage: python tools/prof_gru.py [--edges 91] [--k 20]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mneslam_tpu.models import droid_net  # noqa: E402
from mneslam_tpu.models.nn import conv2d  # noqa: E402


def direct_time(name, make_step, k=20, trials=5):
    """make_step() -> (jitted fn, init carry). fn chains k reps in a
    fori_loop and returns ONE scalar (fetching anything larger would bill
    the remote tunnel's ~10-20 MB/s transfer into the timing)."""
    fn, carry0 = make_step()
    float(fn(carry0))  # warm + sync
    walls = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(carry0))
        walls.append(time.perf_counter() - t0)
    per = float(np.median(walls)) / k * 1e3
    print(f"{name:64s} {per:8.2f} ms/iter", flush=True)
    return per


gru_apply_fused = droid_net.gru_apply_fused  # the production fused variant


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=91)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--hw", default="40,80")
    args = ap.parse_args()
    E = args.edges
    ht, wd = (int(v) for v in args.hw.split(","))

    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    if jax.default_backend() != "cpu":
        params = droid_net.cast_params(params, jnp.bfloat16)
    up = params["update"]
    dt = up["gru"]["convz"]["weight"].dtype

    rng = np.random.default_rng(0)

    def rand(shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.1, dt)

    net0 = rand((E, 128, ht, wd))
    inp = rand((E, 128, ht, wd))
    corr = rand((E, droid_net.CORR_PLANES, ht, wd))
    ii = jnp.asarray(rng.integers(0, 32, E), jnp.int32)
    mask = jnp.ones((E,), jnp.float32)

    # numerical check of the fused gru
    ginp = rand((E, 320, ht, wd))
    ref = droid_net.gru_apply(up["gru"], net0, ginp)
    fused = gru_apply_fused(up["gru"], net0, ginp)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - fused.astype(jnp.float32))))
    print(f"fused-gru max abs err vs reference formulation: {err:.3e}")

    def chain(body):
        def make():
            @jax.jit
            def fn(carry):
                def step(_, c):
                    return body(c)
                out = jax.lax.fori_loop(0, args.k, step, carry)
                return jnp.sum(out.astype(jnp.float32))
            return fn, net0
        return make

    def full(c):
        net, delta, weight = droid_net.update_apply(
            up, c, inp, corr + (1e-12 * c[:, :1].sum()).astype(dt))
        eta, upmask = droid_net.agg_apply(up["agg"], net, ii, mask, 32)
        s = delta.sum() + weight.sum() + eta.sum() + upmask.sum().astype(jnp.float32)
        return net + (1e-12 * s).astype(dt)

    def update_only(c):
        net, delta, weight = droid_net.update_apply(
            up, c, inp, corr + (1e-12 * c[:, :1].sum()).astype(dt))
        return net + (1e-12 * (delta.sum() + weight.sum())).astype(dt)

    def gru_only(c):
        g = ginp + (1e-12 * c[:, :1].sum()).astype(dt)
        return droid_net.gru_apply(up["gru"], c, g)

    def gru_fused(c):
        g = ginp + (1e-12 * c[:, :1].sum()).astype(dt)
        return gru_apply_fused(up["gru"], c, g)

    def encoders_only(c):
        cc = jax.nn.relu(conv2d(
            up["corr_encoder"][0], corr + (1e-12 * c[:, :1].sum()).astype(dt)))
        cc = jax.nn.relu(conv2d(up["corr_encoder"][1], cc, padding=1))
        flow = c[:, :4] * 0.01  # depend on the carry so nothing hoists
        f = jax.nn.relu(conv2d(up["flow_encoder"][0], flow, padding=3))
        f = jax.nn.relu(conv2d(up["flow_encoder"][1], f, padding=1))
        return c + 0.01 * cc + (1e-12 * f.sum()).astype(dt)

    def heads_only(c):
        d = jax.nn.relu(conv2d(up["delta"][0], c, padding=1))
        delta = conv2d(up["delta"][1], d, padding=1)
        w_ = jax.nn.relu(conv2d(up["weight"][0], c, padding=1))
        weight = jax.nn.sigmoid(conv2d(up["weight"][1], w_, padding=1))
        return c + (1e-12 * (delta.sum() + weight.sum())).astype(dt)

    def agg_only(c):
        eta, upmask = droid_net.agg_apply(up["agg"], c, ii, mask, 32)
        s = eta.sum() + upmask.sum().astype(jnp.float32)
        return c + (1e-12 * s).astype(dt)

    def full_fused(c):
        # update_apply with the fused gru inline
        cc = jax.nn.relu(conv2d(
            up["corr_encoder"][0], corr + (1e-12 * c[:, :1].sum()).astype(dt)))
        cc = jax.nn.relu(conv2d(up["corr_encoder"][1], cc, padding=1))
        flow = jnp.zeros((E, 4, ht, wd), dt)
        f = jax.nn.relu(conv2d(up["flow_encoder"][0], flow, padding=3))
        f = jax.nn.relu(conv2d(up["flow_encoder"][1], f, padding=1))
        net = gru_apply_fused(up["gru"], c, jnp.concatenate([inp, cc, f], axis=1))
        d = jax.nn.relu(conv2d(up["delta"][0], net, padding=1))
        delta = conv2d(up["delta"][1], d, padding=1)
        w_ = jax.nn.relu(conv2d(up["weight"][0], net, padding=1))
        weight = jax.nn.sigmoid(conv2d(up["weight"][1], w_, padding=1))
        eta, upmask = droid_net.agg_apply(up["agg"], net, ii, mask, 32)
        s = delta.sum() + weight.sum() + eta.sum() + upmask.sum().astype(jnp.float32)
        return net + (1e-12 * s).astype(dt)

    print(f"E={E} bf16={dt == jnp.bfloat16} hw={ht}x{wd} k={args.k}")
    direct_time("A full update_apply + agg", chain(full), args.k)
    direct_time("B update_apply only", chain(update_only), args.k)
    direct_time("C gru only", chain(gru_only), args.k)
    direct_time("D corr/flow encoders only", chain(encoders_only), args.k)
    direct_time("E delta/weight heads only", chain(heads_only), args.k)
    direct_time("F agg only", chain(agg_only), args.k)
    direct_time("G gru fused gates", chain(gru_fused), args.k)
    direct_time("H full update (fused gru) + agg", chain(full_fused), args.k)


if __name__ == "__main__":
    main()
