"""Evaluation CLI (parity: reference tools/test.py:26-207 single-ckpt path;
the --eval_all poll-watcher is also provided).

Runs the jitted eval forward + on-device NMS per batch, converts fixed-size
device outputs to per-frame prediction dicts, and calls
dataset.evaluation() (official KITTI AP protocol, eval/kitti_eval.py).

Distributed: each JAX process evaluates a disjoint loader shard
(num_shards=process_count) and results merge via
parallel/comm.merge_results_dist (parity: tools/test.py:144-151); within
a process, batches shard over all local devices on a data mesh.
"""
from __future__ import annotations

import argparse
import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--eval_tag", type=str, default="default")
    parser.add_argument("--eval_all", action="store_true")
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--save_to_file", action="store_true")
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument(
        "--launcher", choices=["none", "jax", "slurm"], default="none",
        help="'jax'/'slurm': call jax.distributed.initialize() before "
             "anything touches the backend (multi-host pods).",
    )
    parser.add_argument(
        "--point_axis", type=int, default=0,
        help="shard the POINT axis over this many devices (SURVEY §5.7; "
             "see tools/train.py --point_axis). 0 = off.",
    )
    parser.add_argument(
        "--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER
    )
    args = parser.parse_args()

    from tsm_det_pointcloud_tpu.config import cfg_from_list, cfg_from_yaml_file
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
        jax.distributed.initialize()

    from tsm_det_pointcloud_tpu.datasets import build_dataloader
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.parallel.train_state import make_mesh
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        latest_checkpoint, restore_checkpoint,
    )
    from tsm_det_pointcloud_tpu.runtime.eval_utils import eval_one_ckpt
    from tsm_det_pointcloud_tpu.runtime.metrics import MetricsWriter
    from tsm_det_pointcloud_tpu.utils import common_utils

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    output_dir = (
        Path(cfg.ROOT_DIR) / "output" / cfg.EXP_GROUP_PATH / cfg.TAG
        / args.extra_tag
    )
    eval_dir = output_dir / "eval" / args.eval_tag
    eval_dir.mkdir(parents=True, exist_ok=True)
    log_file = eval_dir / (
        "log_eval_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    )
    logger = common_utils.create_logger(log_file, rank=0)
    logger.info("**********************Start logging**********************")

    test_set, test_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, training=False, workers=args.workers,
        logger=logger,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )
    model = build_network(
        model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set
    )

    # single-process multi-device: shard eval batches over the local mesh
    # (batch must divide evenly; ragged final batches are padded inside
    # eval_one_ckpt)
    import contextlib

    from tsm_det_pointcloud_tpu.parallel import point_sharding as point_axis

    n_local = len(jax.local_devices())
    pax = args.point_axis or int(cfg.get("PARALLEL", {}).get(
        "POINT_AXIS", 0) or 0)
    if pax > 1:
        n_data = max(d for d in range(1, n_local // pax + 1)
                     if batch_size % d == 0)
        mesh = point_axis.make_point_mesh(pax, n_data)
        logger.info("Eval on a %dx%d (data x points) mesh", n_data, pax)
    else:
        n_mesh = max(d for d in range(1, n_local + 1) if batch_size % d == 0)
        mesh = make_mesh(n_mesh) if n_mesh > 1 else None
        if mesh is not None:
            logger.info("Eval on a %d-device data mesh", n_mesh)

    metrics_writer = MetricsWriter(eval_dir)

    first = next(iter(test_loader))
    variables = model.init(jax.random.PRNGKey(0), dict(first), training=False)

    def load_and_eval(ckpt, epoch_id=0):
        nonlocal variables
        if ckpt:
            loaded = restore_checkpoint(ckpt)
            variables = dict(variables)
            for coll in ("params", "batch_stats", "statistics"):
                if coll in loaded and loaded[coll]:
                    variables[coll] = loaded[coll]
            logger.info("Loaded checkpoint %s", ckpt)
        else:
            logger.warning("No checkpoint found/given - evaluating random init")
        pax_ctx = (point_axis.activate(mesh, "points") if pax > 1
                   else contextlib.nullcontext())
        with pax_ctx:
            return eval_one_ckpt(
                model, variables, test_loader, test_set, cfg, logger,
                eval_dir, save_to_file=args.save_to_file, mesh=mesh,
                metrics_writer=metrics_writer, epoch_id=epoch_id,
            )

    if not args.eval_all:
        load_and_eval(args.ckpt or latest_checkpoint(output_dir / "ckpt"))
        return

    # watcher loop (parity: test.py repeat_eval_ckpt :91-138 - poll the ckpt
    # dir every 30s, skip already-evaluated epochs, give up after
    # max_waiting_mins without a new checkpoint)
    import re as _re

    eval_list = eval_dir / "eval_list_val.txt"
    evaluated = set(
        eval_list.read_text().split() if eval_list.exists() else []
    )
    waited = 0.0
    while waited < args.max_waiting_mins * 60:
        latest = latest_checkpoint(output_dir / "ckpt")
        epoch = (
            _re.findall(r"checkpoint_epoch_(\d+)", latest)[0]
            if latest else None
        )
        if latest and epoch not in evaluated:
            load_and_eval(latest, epoch_id=int(epoch))
            evaluated.add(epoch)
            with open(eval_list, "a") as f:
                f.write(epoch + "\n")
            waited = 0.0
        else:
            time.sleep(30)
            waited += 30


if __name__ == "__main__":
    main()
