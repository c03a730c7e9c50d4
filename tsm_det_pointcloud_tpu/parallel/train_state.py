"""Data-parallel training over a jax.sharding.Mesh.

Replaces the reference's DDP + NCCL stack (train.py:154-155,
common_utils.py:157-199, commu_utils.py): parameters/optimizer state are
replicated, batches are sharded on the batch axis, and XLA inserts the
gradient all-reduce (psum) automatically from the sharding annotations —
the "pick a mesh, annotate shardings, let XLA insert collectives" recipe.
Gradients ride the ICI, exactly where DDP's NCCL ring was.

Teacher freezing: the reference freezes params whose 2nd name segment
doesn't start with s_/S_ (train.py:117-122). Here that's an explicit optax
mask (`student_mask`) — zero updates for teacher subtrees (their grads are
already zero via stop_gradient; the mask additionally keeps Adam moments
and weight decay from touching them).

SyncBatchNorm parity: BatchNorm batch_stats are updated from per-replica
batches; cross-replica BN means can be enabled by mesh axis_name
(flax BatchNorm(axis_name="data")) when configs ask for --sync_bn.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any
    statistics: Any = flax.struct.field(default_factory=dict)


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(batch, mesh, axis="data"):
    """Place host batch on the mesh, sharded along the leading (batch) dim.
    Arrays whose leading dim isn't the batch size (dataset constants) are
    replicated; non-array entries (batch_size, metadata) pass through.
    When the mesh also has a `points` axis (tools/train.py --point_axis),
    per-point arrays additionally shard along it (SURVEY §5.7)."""
    sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    has_points = "points" in mesh.axis_names and axis != "points"
    pt_sharding = (NamedSharding(mesh, P(axis, "points"))
                   if has_points else sharding)
    bsz = int(batch.get("batch_size", 0))

    def put(x, key):
        if (isinstance(x, (np.ndarray, jnp.ndarray))
                and getattr(x, "ndim", 0) > 0 and x.dtype != object):
            if bsz and x.shape[0] != bsz:
                return jax.device_put(x, repl)
            if key in ("points", "points_mask") and x.ndim >= 2:
                return jax.device_put(x, pt_sharding)
            return jax.device_put(x, sharding)
        return x

    return {k: put(v, k) for k, v in batch.items()}


def student_mask(params):
    """True (trainable) for subtrees whose path has a segment starting with
    s_ — the student namespace (parity: train.py:117-122 name freezing)."""

    def label(path, _leaf):
        return any(
            str(getattr(p, "key", "")).startswith("s_") for p in path
        )

    return jax.tree_util.tree_map_with_path(label, params)


def wrap_student_only(tx, params):
    """optax wrapper that zeroes updates outside the student namespace."""
    mask = student_mask(params)
    return optax.chain(
        tx,
        optax.masked(
            optax.set_to_zero(),
            jax.tree_util.tree_map(lambda m: not m, mask),
        ),
    )


def device_batch(batch):
    """Keep only jit-compatible entries (parity: load_data_to_gpu,
    models/__init__.py:23 — the reference skips calib/frame_id/metadata
    when moving the batch to the device)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (int, float, bool)):
            out[k] = v
        elif isinstance(v, (np.ndarray, jnp.ndarray)) and v.dtype != object:
            out[k] = v
    return out


def create_train_step(model, tx, mesh=None, axis="data", donate=True):
    """Returns train_step(state, batch) -> (state, metrics); jit-compiled.
    Handles the mutable batch_stats AND statistics (TSM class-statistic
    buffers) collections."""

    def loss_fn(params, batch_stats, statistics, batch):
        variables = {"params": params}
        mutable = ["batch_stats"]
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if statistics:
            variables["statistics"] = statistics
            mutable.append("statistics")
        out, mutated = model.apply(
            variables, dict(batch), training=True, mutable=mutable
        )
        aux = (
            mutated.get("batch_stats", batch_stats),
            mutated.get("statistics", statistics),
            out.get("tb_dict", {}),
        )
        return out["loss"], aux

    def step_fn(state: TrainState, batch):
        (loss, (new_bs, new_stats, tb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, state.statistics, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1, statistics=new_stats,
        )
        metrics = {"loss": loss, **tb}
        return new_state, metrics

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step_with_filter(state, batch):
        return jitted(state, device_batch(batch))

    return step_with_filter


def replicate_state(state, mesh):
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)
