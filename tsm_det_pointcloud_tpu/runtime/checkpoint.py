"""Checkpoint save/load (orbax) with the reference's rotation semantics.

Parity: tools/train_utils/train_utils.py:147-194 (ckpt dict {epoch, it,
model_state, optimizer_state, version}, keep max_ckpt_save_num newest) and
Detector3DTemplate.load_params_from_file (:575-625, strict=False partial
load with logged mismatches).

Layout: <ckpt_dir>/checkpoint_epoch_<E>/ orbax trees:
  state = {params, batch_stats, statistics, opt_state, epoch, it}
"""
from __future__ import annotations

import glob
import os
import re
import shutil

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

VERSION = "tsm_det_pointcloud_tpu+0.1"


def _ckpt_path(ckpt_dir, epoch):
    return os.path.join(str(ckpt_dir), f"checkpoint_epoch_{epoch}")


def save_checkpoint(state, ckpt_dir, epoch, max_ckpt_save_num=30):
    """state: pytree dict. Rotates old checkpoints by epoch number."""
    os.makedirs(str(ckpt_dir), exist_ok=True)
    path = _ckpt_path(ckpt_dir, epoch)
    state = jax.tree_util.tree_map(np.asarray, state)
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
    else:  # dependency-gated fallback
        os.makedirs(path, exist_ok=True)
        flat, treedef = jax.tree_util.tree_flatten(state)
        np.savez(os.path.join(path, "state.npz"), *flat)
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
    # rotation (train_utils.py:147-152)
    ckpts = sorted(
        glob.glob(os.path.join(str(ckpt_dir), "checkpoint_epoch_*")),
        key=lambda p: int(re.findall(r"checkpoint_epoch_(\d+)", p)[0]),
    )
    while len(ckpts) > max_ckpt_save_num:
        shutil.rmtree(ckpts.pop(0), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir):
    ckpts = glob.glob(os.path.join(str(ckpt_dir), "checkpoint_epoch_*"))
    if not ckpts:
        return None
    return max(ckpts, key=lambda p: int(re.findall(r"checkpoint_epoch_(\d+)", p)[0]))


def restore_checkpoint(path, target=None):
    """Restore a pytree; with `target`, restores into its structure."""
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            target = jax.tree_util.tree_map(np.asarray, target)
            return ckptr.restore(os.path.abspath(path), item=target)
        return ckptr.restore(os.path.abspath(path))
    raise RuntimeError("orbax unavailable and no fallback reader implemented")


def partial_load(params, loaded, logger=None):
    """strict=False merge: copy leaves whose path+shape match
    (parity: detector3d_template.py:588-594)."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged, missed = {}, []
    for k, v in flat_p.items():
        lv = flat_l.get(k)
        if lv is not None and np.shape(lv) == np.shape(v):
            merged[k] = lv
        else:
            merged[k] = v
            missed.append(jax.tree_util.keystr(k))
    if logger and missed:
        logger.info("partial_load: %d/%d params not in ckpt: %s ...",
                    len(missed), len(flat_p), missed[:5])
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [merged[k] for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    )
