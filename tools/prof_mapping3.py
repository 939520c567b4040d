"""Micro-profiles for the mapping-step pathologies found by prof_mapping2:

  * why does the Adam update cost ~5 ms for ~235 MB of state?
    (per-leaf kernels over lane-padded [C,402,402] arrays vs one fused
    flat-vector chain)
  * why does ray sampling cost ~2.4 ms? (pose [4,4] gathers along sublane
    dims, 7-wide ray rows)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(name, f, args_list):
    out = f(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list:
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter() - t0) / len(args_list) * 1e3:8.2f} ms")


def main():
    import optax

    from mneslam_tpu.config import make_config
    from mneslam_tpu.models.scene_rep import SceneRep

    bound, coarse, fine = 4.0, 0.04, 0.02
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": 320, "W": 640, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    params = scene.init_params(jax.random.PRNGKey(0))
    n_leaves = len(jax.tree.leaves(params))
    n_elems = sum(x.size for x in jax.tree.leaves(params))
    print(f"device={jax.devices()[0]}  params: {n_leaves} leaves, "
          f"{n_elems / 1e6:.1f} M elements ({n_elems * 4 / 1e6:.0f} MB)")
    R = 10

    # --- optimizer shapes ---
    opt = optax.adam(0.01, b1=0.9, b2=0.99, eps=1e-15)

    g = jax.tree.map(lambda x: 0.01 * jnp.ones_like(x), params)

    @jax.jit
    def upd_tree(p, s, gg):
        u, s = opt.update(gg, s, p)
        return optax.apply_updates(p, u), s

    s0 = opt.init(params)
    timeit("adam on param tree (per-leaf)", upd_tree, [(params, s0, g)] * R)

    flat = jnp.zeros((n_elems,))
    sf = opt.init(flat)
    gf = jnp.full((n_elems,), 0.01)

    @jax.jit
    def upd_flat(p, s, gg):
        u, s = opt.update(gg, s, p)
        return optax.apply_updates(p, u), s

    timeit("adam on ONE flat vector (same bytes)", upd_flat, [(flat, sf, gf)] * R)

    opt_fl = optax.flatten(opt)
    sfl = opt_fl.init(params)

    @jax.jit
    def upd_flatten(p, s, gg):
        u, s = opt_fl.update(gg, s, p)
        return optax.apply_updates(p, u), s

    timeit("adam via optax.flatten(tree)", upd_flatten, [(params, sfl, g)] * R)

    # donated flat
    upd_flat_don = jax.jit(upd_flat.__wrapped__, donate_argnums=(0, 1, 2))
    p2, s2, g2 = jnp.copy(flat), opt.init(flat), jnp.copy(gf)
    out = upd_flat_don(p2, s2, g2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(R):
        out = upd_flat_don(out[0], out[1], jnp.copy(gf))
    jax.block_until_ready(out)
    print(f"{'adam on flat vector (donated)':56s} "
          f"{(time.perf_counter() - t0) / R * 1e3:8.2f} ms  (incl g copy)")

    # --- sampling shapes ---
    n = 2048
    num_kf, rays_per_kf = 8, 10240
    rays7 = jax.random.normal(jax.random.PRNGKey(1), (num_kf * rays_per_kf, 7))
    rays8 = jnp.pad(rays7, ((0, 0), (0, 1)))
    poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1))
    keys = [jax.random.PRNGKey(i) for i in range(R)]

    @jax.jit
    def gather7(k):
        idx = jax.random.randint(k, (n,), 0, rays7.shape[0])
        return rays7[idx].sum()

    timeit("ray gather from [*, 7] table", gather7, [(k,) for k in keys])

    @jax.jit
    def gather8(k):
        idx = jax.random.randint(k, (n,), 0, rays8.shape[0])
        return rays8[idx].sum()

    timeit("ray gather from [*, 8] table", gather8, [(k,) for k in keys])

    @jax.jit
    def pose_gather(k):
        sid = jax.random.randint(k, (n,), 0, num_kf)
        return poses[sid].sum()

    timeit("pose [4,4] gather", pose_gather, [(k,) for k in keys])

    poses_flat = poses.reshape(num_kf, 16)

    @jax.jit
    def pose_onehot(k):
        sid = jax.random.randint(k, (n,), 0, num_kf)
        oh = jax.nn.one_hot(sid, num_kf, dtype=poses_flat.dtype)
        return (oh @ poses_flat).sum()

    timeit("pose one-hot matmul", pose_onehot, [(k,) for k in keys])

    @jax.jit
    def pose_rowgather(k):
        sid = jax.random.randint(k, (n,), 0, num_kf)
        return poses_flat[sid].sum()

    timeit("pose [16] row gather", pose_rowgather, [(k,) for k in keys])

    # the full einsum ray build
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))

    @jax.jit
    def ray_build_einsum(k):
        sid = jax.random.randint(k, (n,), 0, num_kf)
        c2w = poses[sid]
        rd = jnp.einsum("nc,nrc->nr", dirs, c2w[:, :3, :3])
        return rd.sum() + c2w[:, :3, 3].sum()

    timeit("pose gather + einsum rotate", ray_build_einsum, [(k,) for k in keys])

    @jax.jit
    def ray_build_oh(k):
        sid = jax.random.randint(k, (n,), 0, num_kf)
        oh = jax.nn.one_hot(sid, num_kf, dtype=poses_flat.dtype)
        c2w = (oh @ poses_flat).reshape(n, 4, 4)
        rd = jnp.einsum("nc,nrc->nr", dirs, c2w[:, :3, :3])
        return rd.sum() + c2w[:, :3, 3].sum()

    timeit("pose one-hot + einsum rotate", ray_build_oh, [(k,) for k in keys])


if __name__ == "__main__":
    main()
