"""Convert reference PyTorch checkpoints (.pth) to this framework's orbax
trees.

Parity context: the reference's distillation workflow loads a trained
teacher via --pretrained_model (train.py:138-139) with a spconv-layout
migrating, strict=False state_dict load (detector3d_template.py:544-625).
Here the torch tensors are renamed/transposed into the flax param pytree:

  torch Conv1d/Conv2d 1x1  (Cout, Cin, 1[, 1]) -> Dense kernel (Cin, Cout)
  torch Linear             (Cout, Cin)         -> Dense kernel (Cin, Cout)
  torch Conv2d kxk         (Cout, Cin, kh, kw) -> flax Conv (kh, kw, Cin, Cout)
  spconv SubM/SparseConv3d (Cout, kz, ky, kx, Cin) or (kz,ky,kx,Cin,Cout)
                           -> our (K, Cin, Cout) tap-major kernels
  BatchNorm{1,2}d weight/bias/running_mean/running_var
                           -> bn scale/bias + batch_stats mean/var
  registered buffers object_statistic_features/momentum/mean
                           -> the 'statistics' collection

Usage:
  python tools/convert_torch_ckpt.py --ckpt teacher.pth \
      --cfg_file tools/cfgs/kitti_models/fast_cpc.yaml --out teacher_orbax/

The name map is rule-based (see RULES); unmatched keys are listed so
residual gaps are visible, mirroring the reference's strict=False report.
"""
from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def torch_tensor_to_numpy(t):
    return np.asarray(t.detach().cpu().numpy())


def convert_weight(name, arr):
    """Shape-convert one torch tensor to flax layout."""
    if name.endswith(".weight"):
        if arr.ndim == 2:                      # Linear
            return arr.T
        if arr.ndim == 3 and arr.shape[2] == 1:  # Conv1d 1x1
            return arr[:, :, 0].T
        if arr.ndim == 4 and arr.shape[2] == arr.shape[3] == 1:  # Conv2d 1x1
            return arr[:, :, 0, 0].T
        if arr.ndim == 4:                      # Conv2d kxk
            return arr.transpose(2, 3, 1, 0)
        if arr.ndim == 5:
            # spconv kernels: either (Cout, kz, ky, kx, Cin) [native] or
            # (kz, ky, kx, Cin, Cout) [implicit-gemm] — the reference's own
            # loader migrates between them (detector3d_template.py:544-573).
            if arr.shape[1] == arr.shape[2] == arr.shape[3]:
                k = arr.shape[1]
                tap_major = arr.transpose(1, 2, 3, 4, 0)  # kz,ky,kx,Cin,Cout
            else:
                k = arr.shape[0]
                tap_major = arr
            return tap_major.reshape(k ** 3, tap_major.shape[-2],
                                     tap_major.shape[-1])
    return arr


# regex rules: reference dotted name -> (collection, our path template)
RULES = [
    # statistics buffers (code_board.py:93-95)
    (r"point_head\.object_statistic_features$",
     ("statistics", "point_head/object_statistic_features")),
    (r"point_head\.object_momentum$",
     ("statistics", "point_head/object_momentum")),
    (r"point_head\.object_mean$",
     ("statistics", "point_head/object_mean")),
    # BN running stats
    (r"(.*)\.running_mean$", ("batch_stats", r"\1/mean")),
    (r"(.*)\.running_var$", ("batch_stats", r"\1/var")),
    # BN affine
    (r"(.*bn.*)\.weight$", ("params", r"\1/scale")),
    (r"(.*bn.*)\.bias$", ("params", r"\1/bias")),
    # everything else: weights/biases
    (r"(.*)\.weight$", ("params", r"\1/kernel")),
    (r"(.*)\.bias$", ("params", r"\1/bias")),
]


def map_name(name):
    for pat, (coll, tmpl) in RULES:
        m = re.match(pat, name)
        if m:
            return coll, m.expand(tmpl).replace(".", "/")
    return None, None


def convert_state_dict(state_dict):
    """torch state_dict -> {collection: {slash/path: ndarray}} + unmatched."""
    out = {"params": {}, "batch_stats": {}, "statistics": {}}
    unmatched = []
    for name, tensor in state_dict.items():
        arr = (
            torch_tensor_to_numpy(tensor)
            if hasattr(tensor, "detach") else np.asarray(tensor)
        )
        coll, path = map_name(name)
        if coll is None:
            unmatched.append(name)
            continue
        out[coll][path] = convert_weight(name, arr)
    return out, unmatched


def graft_into_tree(params_tree, flat, logger=print):
    """Best-effort graft: place flat entries whose LEAF path suffix + shape
    match exactly one leaf of the target tree (the reference and rebuild
    use different module nesting; suffix+shape is the stable contract)."""
    import jax

    leaves = jax.tree_util.tree_flatten_with_path(params_tree)[0]
    by_suffix = {}
    for path, leaf in leaves:
        keys = [str(getattr(p, "key", "")) for p in path]
        by_suffix.setdefault((keys[-1], np.shape(leaf)), []).append(path)

    placed, skipped = {}, []
    for src_path, arr in flat.items():
        leaf_name = src_path.split("/")[-1]
        cands = by_suffix.get((leaf_name, arr.shape), [])
        # disambiguate by longest common component overlap
        if len(cands) > 1:
            src_parts = set(src_path.lower().split("/"))

            def score(p):
                tgt = set(str(getattr(k, "key", "")).lower() for k in p)
                return len(src_parts & tgt)

            cands = sorted(cands, key=score, reverse=True)[:1]
        if cands:
            placed[tuple(str(getattr(k, "key", "")) for k in cands[0])] = arr
        else:
            skipped.append(src_path)
    if skipped:
        logger(f"unplaced tensors ({len(skipped)}): {skipped[:10]} ...")

    def rebuild(path, leaf):
        key = tuple(str(getattr(k, "key", "")) for k in path)
        return placed.get(key, leaf)

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(rebuild, params_tree), skipped


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch
    import jax

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.runtime.checkpoint import save_checkpoint
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    ckpt = torch.load(args.ckpt, map_location="cpu")
    state_dict = ckpt.get("model_state", ckpt)
    converted, unmatched = convert_state_dict(state_dict)
    print(f"converted {sum(len(v) for v in converted.values())} tensors, "
          f"{len(unmatched)} unmatched: {unmatched[:5]}")

    cfg = cfg_from_yaml_file(
        args.cfg_file,
        EDict({"ROOT_DIR": Path(__file__).resolve().parent.parent,
               "LOCAL_RANK": 0}),
    )
    # build a template tree at tiny shapes is NOT valid (shapes must match
    # the real config); init at the config's native scale on CPU
    meta = DatasetMeta(
        class_names=tuple(cfg.CLASS_NAMES),
        point_cloud_range=(0, -40, -3, 70.4, 40, 1),
        voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
        max_voxels=16000, max_points_per_voxel=5,
        num_point_features=4, max_points=16384,
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=meta)
    import jax.numpy as jnp

    batch = {
        "points": jnp.zeros((1, 16384, 4), jnp.float32),
        "points_mask": jnp.ones((1, 16384), bool),
        "gt_boxes": jnp.zeros((1, 1, 8), jnp.float32),
        "gt_boxes_mask": jnp.zeros((1, 1), bool),
        "batch_size": 1,
    }
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)

    params, skipped_p = graft_into_tree(variables["params"], converted["params"])
    bstats, _ = graft_into_tree(
        variables.get("batch_stats", {}), converted["batch_stats"]
    )
    stats, _ = graft_into_tree(
        variables.get("statistics", {}), converted["statistics"]
    )
    save_checkpoint(
        {"params": params, "batch_stats": bstats, "statistics": stats,
         "opt_state": {}, "epoch": int(ckpt.get("epoch", 0)),
         "it": int(ckpt.get("it", 0))},
        args.out, epoch=int(ckpt.get("epoch", 0)),
    )
    print(f"wrote orbax checkpoint to {args.out}")


if __name__ == "__main__":
    main()
