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


def row_sharding(mesh: Mesh, ndim: int = 2, axis: int = 0) -> NamedSharding:
    """Shard `axis` of an n-d table over EVERY mesh axis combined (the
    row-sharded plane/optimizer-state placement of the ZeRO-style mapping
    path)."""
    spec = [None] * ndim
    spec[axis] = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(*spec))


def gather_table_rows(mesh: Mesh):
    """Replicate-forward / shard-backward collective seam for parameter
    tables.

    Forward: constrain a row-sharded table to replicated — GSPMD inserts
    an all-gather over ICI (every device needs the full table for random
    row gathers). Backward: constrain the cotangent to row-sharded — the
    per-device partial scatter-adds feeding it then lower to a
    reduce-scatter instead of an all-reduce, and everything downstream of
    the cotangent (the `pack_corners` adjoint fold, Adam) runs on the
    local row shard only. A plain `with_sharding_constraint` can't express
    this: its transpose re-applies the FORWARD sharding to the cotangent,
    which would replicate the gradient and un-shard the fold."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))

    @jax.custom_vjp
    def f(x):
        return jax.lax.with_sharding_constraint(x, rep)

    def fwd(x):
        return jax.lax.with_sharding_constraint(x, rep), None

    def bwd(_, ct):
        return (jax.lax.with_sharding_constraint(ct, shard),)

    f.defvjp(fwd, bwd)
    return f


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
    gather = jax.shard_map(
        lambda x: jax.lax.all_gather(x, "agent", axis=0, tiled=True),
        mesh=mesh, in_specs=P("agent"), out_specs=P(), check_vma=False,
    )
    return jax.jit(gather)(local)


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
