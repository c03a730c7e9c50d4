"""Training CLI (parity: reference tools/train.py:21-214).

Same flags where meaningful; torch.distributed launchers are replaced by
JAX process initialization (single-process covers 1 chip; multi-host pods
initialize via jax.distributed when JAX_COORDINATOR is set).
"""
from __future__ import annotations

import os

# Training graphs tip the 256-channel bykey convs over the 16 MB scoped-
# VMEM stack at the plain model's picks (operand relayout copies from
# while-loop carries); the tight model degrades them one ladder rung.
os.environ.setdefault("TSM_BYKEY_TIGHT_VMEM", "1")

import argparse
import datetime
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
        "--launcher", choices=["none", "jax", "slurm"], default="none",
        help="'jax'/'slurm': call jax.distributed.initialize() before "
             "anything touches the backend (multi-host pods; coordinator "
             "and process ids come from the environment / SLURM). "
             "Replaces the reference's torch.distributed launchers.",
    )
    parser.add_argument(
        "--num_epochs_to_eval", type=int, default=0,
        help="evaluate the last N checkpoints on the val split after "
             "training (reference tools/train.py:192-209 defaults to 10; "
             "0 disables, e.g. when no val data is on disk)",
    )
    parser.add_argument(
        "--point_axis", type=int, default=0,
        help="shard the POINT axis of each scene over this many devices "
             "(SURVEY §5.7): layer-0 FPS/grouping run segment-local via "
             "parallel/point_sharding; remaining devices form the data "
             "axis. Also settable as PARALLEL.POINT_AXIS in the cfg. "
             "0 = off.",
    )
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

    if args.launcher != "none":
        # must run before the first backend touch; failures are real
        # configuration errors and must propagate, not be swallowed
        jax.distributed.initialize()

    from tsm_det_pointcloud_tpu.config import log_config_to_file
    from tsm_det_pointcloud_tpu.datasets import build_dataloader
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.parallel.train_state import (
        TrainState, make_mesh, replicate_state, wrap_student_only,
    )
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        latest_checkpoint, partial_load, restore_checkpoint,
        transfer_statistics,
    )
    from tsm_det_pointcloud_tpu.runtime.metrics import MetricsWriter
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

    # per-process loader shard (parity: the reference's DistributedSampler
    # rank-strided slices, datasets/__init__.py:24-44); per-process batch
    # is the per-device batch x local devices, matching the reference's
    # batch_size // total_gpus split (train.py:72-73)
    train_set, train_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, training=True, workers=args.workers,
        seed=666 if args.fix_random_seed else 0, logger=logger,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
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
        if "statistics" in loaded and statistics:
            # teacher/student statistics trees nest differently — merge by
            # buffer name, never structurally (zeros would silently kill
            # the multiplicative statistic conditioning)
            statistics = transfer_statistics(
                statistics, loaded["statistics"], logger
            )
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

    # single-process multi-device: largest local-device count dividing the
    # batch becomes the data-parallel mesh; params/opt state replicate and
    # XLA all-reduces grads over ICI. BatchNorm means are computed over the
    # global (sharded) batch under jit, so SyncBatchNorm semantics
    # (reference --sync_bn, train.py:129-130) hold by construction.
    import contextlib

    from tsm_det_pointcloud_tpu.parallel import point_sharding as point_axis

    n_local = len(jax.local_devices())
    pax = args.point_axis or int(cfg.get("PARALLEL", {}).get(
        "POINT_AXIS", 0) or 0)
    pax_ctx = contextlib.nullcontext()
    if pax > 1:
        # combined ("data", "points") mesh: scenes shard over `points`
        # (layer-0 FPS/grouping run segment-local, SURVEY §5.7), batch
        # over `data`
        n_data = max(d for d in range(1, n_local // pax + 1)
                     if batch_size % d == 0)
        mesh = point_axis.make_point_mesh(pax, n_data)
        state = replicate_state(state, mesh)
        pax_ctx = point_axis.activate(mesh, "points")
        logger.info("Training on a %dx%d (data x points) mesh", n_data, pax)
    else:
        n_mesh = max(d for d in range(1, n_local + 1) if batch_size % d == 0)
        mesh = make_mesh(n_mesh) if n_mesh > 1 else None
        if mesh is not None:
            state = replicate_state(state, mesh)
            logger.info("Training on a %d-device data mesh", n_mesh)

    metrics_writer = MetricsWriter(output_dir)

    logger.info(
        "*************** Start training %s/%s(%s) ***************",
        cfg.EXP_GROUP_PATH, cfg.TAG, args.extra_tag,
    )
    prof = (
        jax.profiler.trace(args.profile_dir)
        if args.profile_dir else contextlib.nullcontext()
    )
    with prof, pax_ctx:
        train_model(
            model, state, train_loader, tx, ckpt_dir, total_epochs=epochs,
            logger=logger, start_epoch=start_epoch,
            max_ckpt_save_num=args.max_ckpt_save_num, lr_fn=lr_fn,
            ckpt_save_interval=args.ckpt_save_interval,
            mesh=mesh, metrics_writer=metrics_writer,
        )
    logger.info("*************** Training finished ***************")

    if args.num_epochs_to_eval > 0:
        # in-train repeat-eval of the trailing checkpoints (parity:
        # reference tools/train.py:192-209)
        from tsm_det_pointcloud_tpu.runtime.eval_utils import (
            repeat_eval_ckpts,
        )

        test_set, test_loader, _ = build_dataloader(
            dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
            batch_size=batch_size, training=False, workers=args.workers,
            logger=logger,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
        )
        eval_model = build_network(
            model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
            dataset=test_set,
        )
        first_val = next(iter(test_loader))
        eval_vars = eval_model.init(
            jax.random.PRNGKey(0), dict(first_val), training=False
        )
        repeat_eval_ckpts(
            eval_model, eval_vars, test_loader, test_set, cfg, ckpt_dir,
            output_dir / "eval" / "eval_with_train", logger,
            args.num_epochs_to_eval, mesh=mesh,
            metrics_writer=metrics_writer,
        )
        logger.info("*************** In-train eval finished ***************")
    metrics_writer.close()


if __name__ == "__main__":
    main()
