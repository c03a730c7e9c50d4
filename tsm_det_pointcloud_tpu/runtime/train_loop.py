"""Training loop (parity: tools/train_utils/train_utils.py:11-194).

Per-iteration: lr is a schedule inside optax (stepped by accumulated_iter
implicitly); loss/grads/update run as ONE jitted donated step; timing meters
mirror the reference's data/forward AverageMeters. Checkpoints rotate via
runtime/checkpoint.py.

Host/device overlap: metrics come back as device scalars and are only
fetched at `log_every` boundaries (and once at epoch end), so the host
never blocks on the step's result in the steady state — the next batch is
being loaded/sharded while the chip runs. (The reference blocks every
iteration on loss.item(); here a per-step fetch would serialize host and
device and was measured to cost real throughput.)

Multi-device: pass `mesh` to shard each host batch over the data axis
(parallel/train_state.shard_batch); gradients all-reduce over ICI via the
sharding annotations. With mesh=None batches go to the default device.
"""
from __future__ import annotations

import time

import jax
import numpy as np

from ..parallel.train_state import TrainState, create_train_step, shard_batch
from ..utils.common_utils import AverageMeter
from .checkpoint import save_checkpoint


def train_one_epoch(state, train_step, loader, logger, epoch, total_epochs,
                    log_every=50, lr_fn=None, mesh=None, metrics_writer=None):
    data_meter, step_meter = AverageMeter(), AverageMeter()
    device_losses = []  # device scalars; fetched once at epoch end
    t_end = time.time()
    n_batches = len(loader)
    for i, batch in enumerate(loader):
        data_meter.update(time.time() - t_end)
        t0 = time.time()
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, metrics = train_step(state, batch)
        step_meter.update(time.time() - t0)
        device_losses.append(metrics["loss"])
        if i % log_every == 0 or i + 1 == n_batches:
            # the only host<->device syncs in the loop
            fetched = {k: float(v) for k, v in jax.device_get(metrics).items()}
            lr = float(lr_fn(int(state.step))) if lr_fn else float("nan")
            if metrics_writer is not None:
                metrics_writer.write(
                    int(state.step), {**fetched, "learning_rate": lr}
                )
            if logger:
                logger.info(
                    "epoch %d/%d iter %d/%d loss %.4f lr %.6f "
                    "data %.3fs step %.3fs",
                    epoch, total_epochs, i, n_batches, fetched["loss"], lr,
                    data_meter.avg, step_meter.avg,
                )
        t_end = time.time()
    if not device_losses:
        return state, float("nan")
    return state, float(np.mean(jax.device_get(device_losses)))


def train_model(model, state, train_loader, optimizer, ckpt_dir,
                total_epochs, logger=None, start_epoch=0,
                max_ckpt_save_num=30, lr_fn=None, ckpt_save_interval=1,
                mesh=None, metrics_writer=None, log_every=50):
    train_step = create_train_step(model, optimizer)
    for epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(epoch)
        state, mean_loss = train_one_epoch(
            state, train_step, train_loader, logger, epoch, total_epochs,
            lr_fn=lr_fn, mesh=mesh, metrics_writer=metrics_writer,
            log_every=log_every,
        )
        if logger:
            logger.info("epoch %d done: mean loss %.4f", epoch, mean_loss)
        if metrics_writer is not None:
            metrics_writer.write(
                int(state.step), {"epoch": epoch, "mean_loss": mean_loss}
            )
        if (epoch + 1) % ckpt_save_interval == 0 or epoch + 1 == total_epochs:
            save_checkpoint(
                {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                    "statistics": jax.device_get(state.statistics),
                    "opt_state": jax.device_get(state.opt_state),
                    "epoch": epoch + 1,
                    "it": int(state.step),
                },
                ckpt_dir, epoch + 1, max_ckpt_save_num,
            )
    return state
