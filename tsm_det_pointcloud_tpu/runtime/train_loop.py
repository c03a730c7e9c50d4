"""Training loop (parity: tools/train_utils/train_utils.py:11-194).

Per-iteration: lr is a schedule inside optax (stepped by accumulated_iter
implicitly); loss/grads/update run as ONE jitted donated step; timing meters
mirror the reference's data/forward AverageMeters. Checkpoints rotate via
runtime/checkpoint.py.
"""
from __future__ import annotations

import time

import jax
import numpy as np

from ..parallel.train_state import TrainState, create_train_step
from ..utils.common_utils import AverageMeter
from .checkpoint import save_checkpoint


def train_one_epoch(state, train_step, loader, logger, epoch, total_epochs,
                    log_every=50, lr_fn=None):
    data_meter, step_meter = AverageMeter(), AverageMeter()
    losses = []
    t_end = time.time()
    for i, batch in enumerate(loader):
        data_meter.update(time.time() - t_end)
        t0 = time.time()
        state, metrics = train_step(state, batch)
        loss = float(metrics["loss"])
        step_meter.update(time.time() - t0)
        losses.append(loss)
        if logger and i % log_every == 0:
            lr = float(lr_fn(int(state.step))) if lr_fn else float("nan")
            logger.info(
                "epoch %d/%d iter %d/%d loss %.4f lr %.6f data %.3fs step %.3fs",
                epoch, total_epochs, i, len(loader), loss, lr,
                data_meter.avg, step_meter.avg,
            )
        t_end = time.time()
    return state, float(np.mean(losses)) if losses else float("nan")


def train_model(model, state, train_loader, optimizer, ckpt_dir,
                total_epochs, logger=None, start_epoch=0,
                max_ckpt_save_num=30, lr_fn=None, ckpt_save_interval=1):
    train_step = create_train_step(model, optimizer)
    for epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(epoch)
        state, mean_loss = train_one_epoch(
            state, train_step, train_loader, logger, epoch, total_epochs,
            lr_fn=lr_fn,
        )
        if logger:
            logger.info("epoch %d done: mean loss %.4f", epoch, mean_loss)
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
