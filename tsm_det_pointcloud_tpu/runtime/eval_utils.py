"""Evaluation driver shared by tools/test.py and tools/train.py.

Parity: tools/eval_utils/eval_utils.py:27-140 (batch loop, recall stats,
sec_per_example, result.pkl, dataset.evaluation) and tools/test.py:91-138
(repeat-eval of trailing checkpoints). Distributed-eval parity:
tools/test.py:144-151 — each process evaluates a disjoint loader shard and
results are merged (reference: tmpdir pickles; here
parallel/comm.merge_results_dist over a real collective).

Single-process multi-device: pass `mesh` to shard eval batches over the
data axis; the final ragged batch is padded by repeating the last frame
and the padded frames' predictions are dropped on the host.
"""
from __future__ import annotations

import json
import pickle
import re
import time
from pathlib import Path

import numpy as np


def _pad_batch(batch, target_bsz):
    """Tile a ragged final batch up to target_bsz along the leading dim."""
    bsz = int(batch["batch_size"])
    if bsz == target_bsz:
        return batch
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0 \
                and v.shape[0] == bsz:
            out[k] = np.concatenate(
                [np.asarray(v)] + [np.asarray(v[-1:])] * (target_bsz - bsz),
                axis=0,
            )
        else:
            out[k] = v
    out["batch_size"] = target_bsz
    return out


def eval_one_ckpt(model, variables, loader, dataset, cfg, logger,
                  result_dir, save_to_file=False, mesh=None,
                  metrics_writer=None, epoch_id=None):
    import jax

    from ..parallel import comm
    from ..parallel.train_state import device_batch, shard_batch

    class_names = list(cfg.CLASS_NAMES)
    det_annos = []
    result_dir = Path(result_dir)
    result_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def infer(v, b):
        out = model.apply(v, b, training=False)
        pred, recall = model.apply(
            v, out, method=lambda m, bd: m.post_processing(bd)
        )
        return pred, recall

    full_bsz = loader.batch_size
    total_time, n_frames = 0.0, 0
    recall_acc = {}
    for batch in loader:
        t0 = time.time()
        bsz = int(batch["batch_size"])
        dev = _pad_batch(batch, full_bsz) if mesh is not None else batch
        dev = device_batch(dev)
        if mesh is not None:
            dev = shard_batch(dev, mesh)
        # calib/frame_id metadata stays on host (load_data_to_gpu parity)
        pred, recall = infer(variables, dev)
        pred = jax.device_get(pred)  # forces execution (axon defers to fetch)
        dt = time.time() - t0
        total_time += dt
        n_frames += bsz
        for k, v in jax.device_get(recall).items():
            recall_acc[k] = recall_acc.get(k, 0.0) + float(v)

        pred_dicts = []
        for b in range(bsz):  # padded frames [bsz:full_bsz] dropped here
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

    if comm.get_world_size() > 1:
        # disjoint rank-strided loader shards -> full ordered list
        det_annos = comm.merge_results_dist(det_annos, len(dataset))
        recall_acc = comm.reduce_dict(recall_acc, average=False)
        n_frames = len(det_annos)
        if comm.get_rank() != 0:
            return {}

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
    if metrics_writer is not None and epoch_id is not None:
        metrics_writer.write(int(epoch_id), result_dict, prefix="eval/")
    return result_dict


def repeat_eval_ckpts(model, variables, loader, dataset, cfg, ckpt_dir,
                      eval_root, logger, num_epochs_to_eval,
                      mesh=None, metrics_writer=None):
    """Evaluate the trailing checkpoints of a finished run (parity:
    tools/train.py:192-209 — in-train repeat-eval of the last N epochs).
    Writes one eval summary JSON per epoch under eval_root."""
    from .checkpoint import restore_checkpoint

    ckpt_dir = Path(ckpt_dir)
    found = []
    for p in sorted(ckpt_dir.glob("checkpoint_epoch_*")):
        m = re.search(r"checkpoint_epoch_(\d+)", p.name)
        if m:
            found.append((int(m.group(1)), p))
    found.sort()
    found = found[-num_epochs_to_eval:] if num_epochs_to_eval > 0 else []
    results = {}
    for epoch, ckpt in found:
        loaded = restore_checkpoint(str(ckpt))
        v = dict(variables)
        for coll in ("params", "batch_stats", "statistics"):
            if coll in loaded and loaded[coll]:
                v[coll] = loaded[coll]
        edir = Path(eval_root) / ("epoch_%d" % epoch) / "val"
        logger.info("*** In-train eval: epoch %d (%s) ***", epoch, ckpt)
        res = eval_one_ckpt(
            model, v, loader, dataset, cfg, logger, edir,
            mesh=mesh, metrics_writer=metrics_writer, epoch_id=epoch,
        )
        with open(edir / "eval_summary.json", "w") as f:
            json.dump({k: float(val) for k, val in res.items()
                       if isinstance(val, (int, float))}, f, indent=1)
        results[epoch] = res
    return results
