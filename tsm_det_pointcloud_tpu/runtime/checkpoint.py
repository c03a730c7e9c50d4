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
import pickle
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
    else:  # dependency-gated fallback: pickled numpy pytree (same trust
        # model as the reference's torch.save, train_utils.py:166)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "state.pkl"), "wb") as f:
            pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
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
    """Restore a pytree; with `target`, restores into its structure.

    Auto-detects the format: a `state.pkl` inside the directory is the
    dependency-gated fallback written when orbax is absent; anything else
    is an orbax PyTree checkpoint. A pkl checkpoint restores whether or
    not orbax is installed; an orbax checkpoint requires orbax (raises
    RuntimeError otherwise).
    """
    pkl = os.path.join(str(path), "state.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            state = pickle.load(f)
        if target is not None:
            tdef = jax.tree_util.tree_structure(target)
            return jax.tree_util.tree_unflatten(
                tdef, jax.tree_util.tree_leaves(state)
            )
        return state
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            target = jax.tree_util.tree_map(np.asarray, target)
            return ckptr.restore(os.path.abspath(path), item=target)
        return ckptr.restore(os.path.abspath(path))
    raise RuntimeError(
        "orbax unavailable and %s has no state.pkl fallback" % path
    )


def transfer_statistics(dst, src, logger=None):
    """Transfer the class-statistic buffers from a teacher checkpoint into
    a (differently-nested) student tree by LEAF NAME + shape.

    The teacher head owns its buffers inside its VoteHeadBranch submodule
    (statistics = {...: {'head': {object_*}}}) while the distillation head
    declares one shared set at its own scope ({...: {object_*}}), so a
    structural replacement either fails or — worse — parks the teacher's
    buffers at a dead path and lets the student's re-init to ZEROS, which
    silently turns the multiplicative statistic conditioning
    (`shared * statistic[i]`, point_head_vote.py) into a constant-zero
    classifier. Buffer leaf names (object_statistic_features /
    object_momentum / object_mean) are unique, so basename matching is
    exact. Parity: the reference moves these buffers through the state
    dict by full name (...distillation.py:85-87 + train.py:138-139)."""
    flat_src = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(src)[0]:
        name = getattr(path[-1], "key", str(path[-1]))
        flat_src.setdefault(str(name), leaf)
    dst_flat = jax.tree_util.tree_flatten_with_path(dst)
    merged, moved = [], []
    for path, leaf in dst_flat[0]:
        name = str(getattr(path[-1], "key", str(path[-1])))
        sv = flat_src.get(name)
        if sv is not None and np.shape(sv) == np.shape(leaf):
            merged.append(jax.numpy.asarray(sv))
            moved.append(name)
        else:
            merged.append(leaf)
    if logger:
        logger.info("transfer_statistics: moved %s", moved)
    return jax.tree_util.tree_unflatten(dst_flat[1], merged)


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
