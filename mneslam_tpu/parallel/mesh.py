"""Device-mesh utilities for multi-agent execution.

SURVEY.md §5.8: the TPU-native replacement for the reference's process-per-
agent fabric is one JAX process whose device mesh is partitioned into agent
slices. The framework's two parallel axes are:

  * `agent` — the reference's process/GPU-per-agent data parallelism
    (`multi_agents.py:44-49`): per-agent parameter stacks live sharded on
    the leading axis;
  * `ray`   — ray-batch sharding within an agent, the system's sequence-
    parallel analogue (SURVEY.md §5.7): Hessian/gradient assembly is a sum
    over rays/edges, so sharding the batch and letting XLA insert psum is
    mathematically exact.

Collective exchange replaces Manager lists / file polling: descriptor DBs
all-gather across the `agent` axis (ICI), and one agent's map parameters
are fetched from the sharded stack with a collective gather instead of
checkpoint files.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_agents: int, devices=None) -> Mesh:
    """(agent x ray) mesh over the available devices.

    When the device count is not divisible into ``n_agents`` slices the mesh
    degrades gracefully: the agent axis clamps to the largest divisor of the
    device count ≤ n_agents (worst case 1 — all agents share one replicated
    slice) rather than refusing to run. The caller can read the realized
    slicing off ``mesh.shape``."""
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    n_agents = max(1, min(int(n_agents), n_dev))
    while n_dev % n_agents != 0:
        n_agents -= 1
    return Mesh(np.asarray(devices).reshape(n_agents, n_dev // n_agents),
                ("agent", "ray"))


def agent_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over agent slices, replicated within a slice."""
    return NamedSharding(mesh, P("agent"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """[agent, ray, ...] batches: both leading axes sharded."""
    return NamedSharding(mesh, P("agent", "ray"))


def shard_agent_stack(tree, mesh: Mesh):
    """Place a per-agent parameter stack (leading axis = agent) on the mesh."""
    return jax.device_put(tree, jax.tree.map(lambda _: agent_sharding(mesh), tree))


def shard_ray_batch(tree, mesh: Mesh):
    return jax.device_put(tree, jax.tree.map(lambda _: ray_sharding(mesh), tree))


def make_multi_agent_train_step(scene, optimizer: optax.GradientTransformation):
    """Jitted sharded mapping train step over stacked per-agent state.

    params/opt_state: pytrees with a leading agent axis (sharded over
    `agent`); ray batches [n_agents, batch, ...] (sharded over both axes).
    XLA partitions the vmapped computation: each agent slice trains its own
    map, with ray-axis reductions riding ICI psum.
    """

    def agent_step(params, opt_state, ro, rd, rgb, d, key):
        def loss_fn(p):
            ret = scene.forward(p, ro, rd, rgb, d, key=key)
            return scene.get_loss_from_ret(ret)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def step(params, opt_state, ro, rd, rgb, d, keys):
        return jax.vmap(agent_step)(params, opt_state, ro, rd, rgb, d, keys)

    return step


def row_sharding(mesh: Mesh, ndim: int = 2, axis: int = 0,
                 names=None) -> NamedSharding:
    """Shard `axis` of an n-d table over the given mesh axes (default: EVERY
    mesh axis combined — the row-sharded plane/optimizer-state placement of
    the ZeRO-style mapping path)."""
    spec = [None] * ndim
    spec[axis] = tuple(names) if names is not None else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(*spec))


def make_row_sharded_pack(axis_names, axis_sizes, true_shape, pad_h: int,
                          compute_dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          fold: str = "after"):
    """The row-sharded mapper's collective seam (shard_map-internal,
    round 4): pack the LOCAL rows (one-y-row halo), all-gather the PACKED
    blocks, reduce-scatter the cotangent.

    Called INSIDE a shard_map over `axis_names` (sizes `axis_sizes`). Input:
    the device-local block [pad_h*W/N, C] of a plane in flat row-major
    layout (row r = y*W + x, rows >= H*W zero-padded). Output: the full
    replicated `pack_corners` table [H*W, 4C] in `compute_dtype`.

    Why explicit collectives: GSPMD given the equivalent
    with_sharding_constraint seam multiplies the gathers — at reference
    shapes its partitioning all-gathers each of the pack's shift pieces
    separately (4x the raw bytes) AND all-gathers the backward's 92k
    scatter values per fine plane (~460-690 MB/iter total, measured from
    the compiled CPU-mesh HLO, round 4). Writing the seam as
    lax.all_gather/psum_scatter pins the program to the designed payloads.

    Why pack BEFORE the gather (round-4 correction, tools/prof_zero5.py):
    the earlier gather-raw-then-pack-full forward was chosen for its 4x
    smaller ICI payload, but its per-device program measures 8.77 ms/iter
    vs 3.78 for pack-local-then-concat at reference shapes — the full-size
    pack's lane concat of computed shifted pieces costs ~4.7 ms/iter,
    dwarfing the ~1-3 ms/iter of extra all-gather payload it saves
    (packed blocks are 4x raw bytes; ~1.1 ms extra at bf16 on the
    ~100 GB/s v5e ICI estimate). The local pack needs the NEXT block's
    first y-row (the pack's y-shift moves exactly one y-row), exchanged
    with one small all-gather of first rows.

    Backward offers two exact orderings of the linear fold (`fold=`):
      * "after": reduce-scatter the PACKED cotangent [H*W, 4C], then fold
        the local rows/N block (1-y-row halo from the previous block).
        Minimal per-device compute; 4x the reduction payload.
      * "before": fold the full packed cotangent locally (fold is linear,
        so fold-then-reduce == reduce-then-fold exactly), then
        reduce-scatter the RAW [pad_h*W, C] cotangent. 4x less ICI; pays
        a full-size (flat, transpose-free) fold per device.
    Neither ordering is the forward's linear transpose applied naively,
    hence the custom VJP.

    The returned `f` also carries the two halves of the PIPELINED seam
    (`mapping.shard_prefetch`, round 4 — VERDICT r3 next #1(b)):
      * `f.gather(x)` — the forward alone (local pack + packed-block
        all-gather), differentiation-free. Issued at the TOP of loop
        iteration i for the table consumed at iteration i+1, it has no
        data dependence on iteration i's render/backward, so the
        latency-hiding scheduler can run the all-gather under a full
        iteration of compute (double-buffering across `fori_loop`
        iterations).
      * `f.consume(x_local, table)` — identity on `table` in the forward;
        its VJP routes the table cotangent through the SAME
        reduce-scatter + row-local fold as `f`'s backward to `x_local`
        (zero cotangent to `table`: the carried stale table is a buffer,
        not a parameter). `consume(x, f.gather(x))` == `f(x)` exactly;
        with a one-iteration-old table the gradient is the standard
        delayed/stale gradient of pipelined data-parallel training."""
    from ..ops import interp

    C, H, W = (int(s) for s in true_shape)
    R, Rp = H * W, int(pad_h) * W
    names = tuple(axis_names)
    sizes = tuple(int(s) for s in axis_sizes)
    n_dev = int(np.prod(sizes))
    assert Rp % n_dev == 0 and (Rp // n_dev) % W == 0, (Rp, n_dev, W)
    B = Rp // n_dev                      # local block: whole y-rows
    hb = B // W                          # local block: y-row count

    def _dev_index():
        d = jnp.zeros((), jnp.int32)
        for name, size in zip(names, sizes):
            d = d * size + jax.lax.axis_index(name)
        return d

    def _fold_block(blk):
        """Fold the reduce-scattered packed cotangent block [B, 4C] to the
        raw block [B, C]. Only the y-shift crosses block boundaries, by
        exactly one y-row, so the halo is each block's last `b` row
        (interp._fold_b_rows), exchanged with one small all-gather."""
        dev = _dev_index()
        b_tail = interp._fold_b_rows(blk[-W:].reshape(1, W, 4 * C))
        tails = jax.lax.all_gather(b_tail.reshape(W, C), names, axis=0,
                                   tiled=True)            # [n_dev*W, C]
        prev = jax.lax.dynamic_slice_in_dim(
            tails, jnp.maximum(dev - 1, 0) * W, W, axis=0)
        prev = jnp.where(dev > 0, prev, jnp.zeros((), blk.dtype))
        return interp.fold_corners_rows(blk, H, W, y0=dev * hb,
                                        halo_row=prev)

    def _pack_local(x):
        """pack_corners_hwc restricted to the local y-row block: identical
        values to rows [dev*B, dev*B+B) of the full pack for every global
        y < H (rows y >= H are pad, sliced off after the gather). The
        y-shift needs one halo row — the NEXT block's first y-row — and a
        y == H-1 border clamp (the full pack clamps at the TABLE's last
        valid row, which is block-internal only by luck)."""
        dev = _dev_index()
        xb = x.astype(compute_dtype).reshape(hb, W, C)
        firsts = jax.lax.all_gather(xb[0], names, axis=0, tiled=True)
        nxt = jax.lax.dynamic_slice_in_dim(
            firsts, jnp.minimum(dev + 1, n_dev - 1) * W, W, axis=0)
        ext = jnp.concatenate([xb, nxt.reshape(1, W, C)], axis=0)
        sx = jnp.concatenate([ext[:, 1:], ext[:, -1:]], axis=1)
        yy = dev * hb + jax.lax.broadcasted_iota(jnp.int32, (hb, 1, 1), 0)
        sy = jnp.where(yy == H - 1, xb, ext[1:])
        sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
        packed = jnp.concatenate([xb, sx[:hb], sy, sxy], axis=-1)
        return packed.reshape(B, 4 * C)

    def _gather(x):
        pk = jax.lax.all_gather(_pack_local(x), names, axis=0, tiled=True)
        return pk[:R]

    def _fold_cotangent(d_packed):
        d = d_packed
        if Rp > R:
            d = jnp.pad(d, ((0, Rp - R), (0, 0)))
        if fold == "before":
            full = interp.fold_corners_rows(d, H, W)             # [Rp, C]
            out = jax.lax.psum_scatter(full, names, scatter_dimension=0,
                                       tiled=True)
        else:
            blk = jax.lax.psum_scatter(d, names, scatter_dimension=0,
                                       tiled=True)               # [B, 4C]
            out = _fold_block(blk)
        return out.astype(param_dtype)

    @jax.custom_vjp
    def f(x):
        return _gather(x)

    def fwd(x):
        return f(x), None

    def bwd(_, d_packed):
        return (_fold_cotangent(d_packed),)

    f.defvjp(fwd, bwd)

    # pipelined-seam halves (see docstring): forward-only gather + a
    # consume whose VJP reroutes the table cotangent to the local rows
    @jax.custom_vjp
    def consume(x, table):
        return table

    def c_fwd(x, table):
        return table, None

    def c_bwd(_, d_packed):
        return (_fold_cotangent(d_packed),
                jnp.zeros((R, 4 * C), d_packed.dtype))

    consume.defvjp(c_fwd, c_bwd)
    f.gather = lambda x: _gather(jax.lax.stop_gradient(x))
    f.consume = consume
    return f


_GATHER_CACHE: dict = {}


def all_gather_descriptors(local: jax.Array, mesh: Mesh | None = None) -> jax.Array:
    """Descriptor DB exchange: [n_agents, K, D] stack sharded over `agent`
    -> fully replicated copy on every slice, via an explicit
    `lax.all_gather` over the agent axis (each slice contributes its own
    block across ICI).

    The collective analogue of the reference's Manager-list descriptor DB
    (`multi_agents.py:31-35`)."""
    if mesh is None:
        mesh = getattr(getattr(local, "sharding", None), "mesh", None)
    if not isinstance(mesh, Mesh):
        return local  # unsharded input: nothing to exchange

    # out is replicated over `agent` after the all_gather; the varying-axes
    # checker can't infer that, so it is disabled (check_vma/check_rep)
    #
    # the jitted gather is CACHED per mesh: a fresh jit(lambda ...) per
    # call misses jax's function-identity cache, and this runs once per
    # mapped keyframe (MeshComms.descriptors) — on the remote backend
    # that would be a ~30-60 s recompile per keyframe
    key = mesh
    fn = _GATHER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(jax.shard_map(
            lambda x: jax.lax.all_gather(x, "agent", axis=0, tiled=True),
            mesh=mesh, in_specs=P("agent"), out_specs=P(), check_vma=False,
        ))
        _GATHER_CACHE[key] = fn
    return fn(local)


def fetch_agent_slice(stacked, rank: int):
    """Fetch one agent's pytree from the sharded stack — the ICI
    replacement for reading a peer's latest_checkpoint file
    (`mp_slam/mapper.py:708-726`). XLA materializes the cross-slice
    transfer; the result stays on device for the consumer (loop-closure
    rendering / distillation)."""
    return jax.tree.map(lambda x: x[rank], stacked)


def cosine_similarity_matrix(descs_a: jax.Array, descs_b: jax.Array) -> jax.Array:
    """[Ka, D] x [Kb, D] -> [Ka, Kb] cosine similarities (jitted, on-mesh)."""
    a = descs_a / jnp.maximum(jnp.linalg.norm(descs_a, axis=-1, keepdims=True), 1e-12)
    b = descs_b / jnp.maximum(jnp.linalg.norm(descs_b, axis=-1, keepdims=True), 1e-12)
    return a @ b.T
