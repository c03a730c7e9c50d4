"""Optimizer + LR schedule factory (optax).

Parity: tools/train_utils/optimization/__init__.py:11-63 — `adam_onecycle`
(fastai OptimWrapper + OneCycle cosine lr/momentum schedule,
learning_schedules_fastai.py:60-77), plain adam / sgd with LambdaLR-style
step decay, CosineWarmup. The fastai "true weight decay" == optax.adamw's
decoupled weight decay.

The OneCycle here reproduces the fastai annealing-phases schedule the
reference uses: [linear warmup lr/div_factor -> lr over pct_start,
cosine lr -> lr*1e-4 over the rest]; momentum mirrors [moms[0] -> moms[1],
moms[1] -> moms[0]].
"""
from __future__ import annotations

import numpy as np
import optax


def onecycle_lr_fn(lr_max, total_steps, moms, div_factor, pct_start):
    warmup = max(int(total_steps * pct_start), 1)
    rest = max(total_steps - warmup, 1)
    lr_start = lr_max / div_factor
    lr_end = lr_max * 1e-4

    def lr_fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        frac_w = jnp.clip(step / warmup, 0.0, 1.0)
        lr_warm = lr_start + (lr_max - lr_start) * frac_w
        frac_c = jnp.clip((step - warmup) / rest, 0.0, 1.0)
        lr_cos = lr_end + (lr_max - lr_end) * 0.5 * (1 + jnp.cos(jnp.pi * frac_c))
        return jnp.where(step < warmup, lr_warm, lr_cos)

    def mom_fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        frac_w = jnp.clip(step / warmup, 0.0, 1.0)
        m_warm = moms[0] + (moms[1] - moms[0]) * frac_w
        frac_c = jnp.clip((step - warmup) / rest, 0.0, 1.0)
        m_cos = moms[0] + (moms[1] - moms[0]) * 0.5 * (1 + jnp.cos(jnp.pi * frac_c))
        return jnp.where(step < warmup, m_warm, m_cos)

    return lr_fn, mom_fn


def decay_step_lr_fn(lr, decay_step_list, lr_decay, lr_clip, steps_per_epoch,
                     warmup_epoch=0, warmup_div=None):
    boundaries = [int(e * steps_per_epoch) for e in decay_step_list]

    def lr_fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        cur = jnp.asarray(lr, jnp.float32)
        for b in boundaries:
            cur = jnp.where(step >= b, cur * lr_decay, cur)
        return jnp.maximum(cur, lr_clip * lr)

    return lr_fn


def build_optimizer(optim_cfg, total_steps, steps_per_epoch=1000,
                    param_mask=None):
    """Returns (optax.GradientTransformation, lr_fn). `param_mask` is a
    pytree-of-bool (or callable) selecting trainable params — the functional
    replacement for the reference's requires_grad surgery (train.py:117-122);
    masked-out params receive zero updates."""
    name = optim_cfg["OPTIMIZER"]
    wd = float(optim_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(optim_cfg.get("GRAD_NORM_CLIP", 0.0))

    if name == "adam_onecycle":
        lr_fn, mom_fn = onecycle_lr_fn(
            float(optim_cfg["LR"]), total_steps,
            tuple(optim_cfg.get("MOMS", [0.95, 0.85])),
            float(optim_cfg.get("DIV_FACTOR", 10.0)),
            float(optim_cfg.get("PCT_START", 0.3)),
        )
        # adamw with scheduled lr; b1 scheduled via inject_hyperparams
        opt = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate=learning_rate, b1=b1, b2=0.99, weight_decay=wd
            )
        )(learning_rate=lr_fn, b1=mom_fn)
    elif name == "adam":
        lr_fn = decay_step_lr_fn(
            float(optim_cfg["LR"]), optim_cfg.get("DECAY_STEP_LIST", []),
            float(optim_cfg.get("LR_DECAY", 0.1)),
            float(optim_cfg.get("LR_CLIP", 1e-7)), steps_per_epoch,
        )
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_fn, weight_decay=wd
        )
    elif name == "sgd":
        lr_fn = decay_step_lr_fn(
            float(optim_cfg["LR"]), optim_cfg.get("DECAY_STEP_LIST", []),
            float(optim_cfg.get("LR_DECAY", 0.1)),
            float(optim_cfg.get("LR_CLIP", 1e-7)), steps_per_epoch,
        )
        opt = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(learning_rate, momentum=float(optim_cfg.get("MOMENTUM", 0.9))),
            )
        )(learning_rate=lr_fn)
    else:
        raise NotImplementedError(name)

    chain = []
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(opt)
    tx = optax.chain(*chain)
    if param_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_mask,
        )
    return tx, (lr_fn if name != "adam_onecycle" else lr_fn)
