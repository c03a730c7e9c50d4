"""Training CLI (parity: reference tools/train.py:21-214).

Same flags where meaningful; torch.distributed launchers are replaced by
JAX process initialization (single-process covers 1 chip; multi-host pods
initialize via jax.distributed when JAX_COORDINATOR is set).
"""
from __future__ import annotations

import argparse
import datetime
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument(
        "--profile_dir", type=str, default=None,
        help="capture a jax.profiler trace of the first epoch (xprof "
             "viewable; replaces the reference's AverageMeter-only timing)",
    )
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument(
        "--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER
    )
    args = parser.parse_args()

    from tsm_det_pointcloud_tpu.config import (
        cfg_from_list, cfg_from_yaml_file, log_config_to_file,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    cfg = EDict({"ROOT_DIR": Path(__file__).resolve().parent.parent,
                 "LOCAL_RANK": 0})
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()

    import jax

    from tsm_det_pointcloud_tpu.config import log_config_to_file
    from tsm_det_pointcloud_tpu.datasets import build_dataloader
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.parallel.train_state import (
        TrainState, wrap_student_only,
    )
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        latest_checkpoint, partial_load, restore_checkpoint,
    )
    from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer
    from tsm_det_pointcloud_tpu.runtime.train_loop import train_model
    from tsm_det_pointcloud_tpu.utils import common_utils

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = Path(cfg.ROOT_DIR) / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / (
        "log_train_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    )
    logger = common_utils.create_logger(log_file, rank=0)
    logger.info("**********************Start logging**********************")
    logger.info("JAX devices: %s", jax.devices())
    log_config_to_file(cfg, logger=logger)

    if args.fix_random_seed:
        np.random.seed(666)

    train_set, train_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, training=True, workers=args.workers,
        seed=666 if args.fix_random_seed else 0, logger=logger,
    )
    model = build_network(
        model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=train_set
    )

    # one host batch to init shapes
    first = next(iter(train_loader))
    variables = model.init(jax.random.PRNGKey(0), dict(first), training=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    statistics = variables.get("statistics", {})

    steps_per_epoch = len(train_loader)
    tx, lr_fn = build_optimizer(
        cfg.OPTIMIZATION, total_steps=steps_per_epoch * epochs,
        steps_per_epoch=steps_per_epoch,
    )
    # distillation runs train only the student namespace
    if str(cfg.MODEL.get("NAME", "")) == "3DSSD" and any(
        "Distillation" in str(v.get("NAME", ""))
        for v in (cfg.MODEL.get("BACKBONE_3D", {}), cfg.MODEL.get("POINT_HEAD", {}))
    ):
        tx = wrap_student_only(tx, params)
        logger.info("Distillation config: teacher namespace frozen (s_* trains)")

    if args.pretrained_model:
        loaded = restore_checkpoint(args.pretrained_model)
        params = partial_load(params, loaded.get("params", loaded), logger)
        if "statistics" in loaded:
            statistics = loaded["statistics"]
        logger.info("Loaded pretrained model from %s", args.pretrained_model)

    start_epoch = 0
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        step=0, statistics=statistics,
    )
    resume_from = args.ckpt or latest_checkpoint(ckpt_dir)
    if resume_from:
        target = {
            "params": params, "batch_stats": batch_stats,
            "statistics": statistics, "opt_state": tx.init(params),
            "epoch": 0, "it": 0,
        }
        loaded = restore_checkpoint(resume_from, target=target)
        state = TrainState(
            params=loaded["params"], batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"], step=int(loaded["it"]),
            statistics=loaded["statistics"],
        )
        start_epoch = int(loaded["epoch"])
        logger.info("Resumed from %s (epoch %d)", resume_from, start_epoch)

    logger.info(
        "*************** Start training %s/%s(%s) ***************",
        cfg.EXP_GROUP_PATH, cfg.TAG, args.extra_tag,
    )
    import contextlib

    prof = (
        jax.profiler.trace(args.profile_dir)
        if args.profile_dir else contextlib.nullcontext()
    )
    with prof:
        train_model(
            model, state, train_loader, tx, ckpt_dir, total_epochs=epochs,
            logger=logger, start_epoch=start_epoch,
            max_ckpt_save_num=args.max_ckpt_save_num, lr_fn=lr_fn,
            ckpt_save_interval=args.ckpt_save_interval,
        )
    logger.info("*************** Training finished ***************")


if __name__ == "__main__":
    main()
