"""Evaluation CLI (parity: reference tools/test.py:26-207 single-ckpt path;
the --eval_all poll-watcher is also provided).

Runs the jitted eval forward + on-device NMS per batch, converts fixed-size
device outputs to per-frame prediction dicts, and calls
dataset.evaluation() (official KITTI AP protocol, eval/kitti_eval.py).
"""
from __future__ import annotations

import argparse
import datetime
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


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


def eval_one_ckpt(model, variables, loader, dataset, cfg, logger,
                  result_dir, save_to_file=False):
    import jax

    from tsm_det_pointcloud_tpu.parallel.train_state import device_batch

    class_names = list(cfg.CLASS_NAMES)
    det_annos = []

    @jax.jit
    def infer(v, b):
        out = model.apply(v, b, training=False)
        pred, recall = model.apply(
            v, out, method=lambda m, bd: m.post_processing(bd)
        )
        return pred, recall

    total_time, n_frames = 0.0, 0
    recall_acc = {}
    for batch in loader:
        t0 = time.time()
        # calib/frame_id metadata stays on host (load_data_to_gpu parity)
        pred, recall = infer(variables, device_batch(batch))
        pred = jax.device_get(pred)  # forces execution (axon defers to fetch)
        dt = time.time() - t0
        total_time += dt
        bsz = int(batch["batch_size"])
        n_frames += bsz
        for k, v in jax.device_get(recall).items():
            recall_acc[k] = recall_acc.get(k, 0.0) + float(v)

        pred_dicts = []
        for b in range(bsz):
            cnt = int(pred["count"][b])
            pred_dicts.append({
                "pred_boxes": np.asarray(pred["pred_boxes"][b][:cnt]),
                "pred_scores": np.asarray(pred["pred_scores"][b][:cnt]),
                "pred_labels": np.asarray(pred["pred_labels"][b][:cnt]),
            })
        annos = dataset.generate_prediction_dicts(
            batch, pred_dicts, class_names,
            output_path=result_dir if save_to_file else None,
        )
        det_annos += annos

    sec_per_example = total_time / max(n_frames, 1)
    logger.info(
        "Generate label finished(sec_per_example: %.4f second).",
        sec_per_example,
    )
    gt_num = max(recall_acc.get("gt", 0.0), 1.0)
    for k in sorted(recall_acc):
        if k != "gt":
            logger.info("recall_%s: %f", k, recall_acc[k] / gt_num)

    with open(result_dir / "result.pkl", "wb") as f:
        pickle.dump(det_annos, f)

    result_str, result_dict = dataset.evaluation(det_annos, class_names)
    logger.info(result_str)
    result_dict["sec_per_example"] = sec_per_example
    return result_dict


def main():
    args, cfg = parse_config()

    import jax

    from tsm_det_pointcloud_tpu.datasets import build_dataloader
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        latest_checkpoint, restore_checkpoint,
    )
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
    )
    model = build_network(
        model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set
    )

    first = next(iter(test_loader))
    variables = model.init(jax.random.PRNGKey(0), dict(first), training=False)

    def load_and_eval(ckpt):
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
        return eval_one_ckpt(
            model, variables, test_loader, test_set, cfg, logger, eval_dir,
            save_to_file=args.save_to_file,
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
            load_and_eval(latest)
            evaluated.add(epoch)
            with open(eval_list, "a") as f:
                f.write(epoch + "\n")
            waited = 0.0
        else:
            time.sleep(30)
            waited += 30


if __name__ == "__main__":
    main()
