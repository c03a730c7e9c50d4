"""CenterPoint head (flax).

Parity: pcdet/models/dense_heads/center_head.py:11-355 — shared 3x3 conv,
per-group SeparateHead branches (hm / center / center_z / dim / rot / vel),
gaussian-heatmap targets (model_utils/centernet_utils.py:47), CenterNet
focal + gathered-L1 reg losses (loss_utils.py:458,520), and
decode_bbox_from_heatmap (+ optional circle NMS) producing fixed-size
final_box_dicts for the CenterPoint detector's post_processing.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import loss_utils
from ..model_utils import centernet_utils


class SeparateHead(nn.Module):
    """Per-target-group 3x3 conv branches over the BEV map (NHWC)."""
    head_dict: dict   # name -> {out_channels, num_conv}
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, training=False):
        out = {}
        for name, spec in self.head_dict.items():
            h = x
            for i in range(int(spec["num_conv"]) - 1):
                h = nn.Conv(
                    x.shape[-1], (3, 3), use_bias=True,
                    name=f"{name}_conv{i}",
                )(h)
                h = nn.BatchNorm(
                    use_running_average=not training, momentum=0.99,
                    epsilon=1e-3, name=f"{name}_bn{i}",
                )(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm" else nn.initializers.zeros
            )
            out[name] = nn.Conv(
                int(spec["out_channels"]), (3, 3), use_bias=True,
                bias_init=bias_init, name=f"{name}_out",
            )(h)
        return out


class CenterHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    voxel_size: tuple = None

    def _groups(self):
        groups = self.model_cfg.get("CLASS_NAMES_EACH_HEAD")
        if not groups:
            groups = [list(self.class_names)]
        return [list(g) for g in groups]

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        x = batch_dict["spatial_features_2d"]  # (B, H, W, C)
        B, H, W, _ = x.shape
        tgt_cfg = cfg.get("TARGET_ASSIGNER_CONFIG", {})
        stride = int(tgt_cfg.get("FEATURE_MAP_STRIDE", 8))
        vs = tuple(self.voxel_size or batch_dict.get("voxel_size", (0.1, 0.1, 0.15)))
        head_dict_base = dict(cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"])
        code_size = 8 + (2 if "vel" in head_dict_base else 0)

        shared = nn.Conv(
            int(cfg.get("SHARED_CONV_CHANNEL", 64)), (3, 3), use_bias=True,
            name="shared_conv",
        )(x)
        shared = nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            name="shared_bn",
        )(shared)
        shared = nn.relu(shared)

        groups = self._groups()
        name_to_id = {n: i + 1 for i, n in enumerate(self.class_names)}

        all_boxes, all_scores, all_labels = [], [], []
        total_loss, tb = 0.0, {}
        K = int(cfg.get("POST_PROCESSING", {}).get("MAX_OBJ_PER_SAMPLE", 500))

        for gi, group in enumerate(groups):
            hd = {"hm": {"out_channels": len(group),
                         "num_conv": int(cfg.get("NUM_HM_CONV", 2))}}
            hd.update(head_dict_base)
            preds = SeparateHead(head_dict=hd, name=f"head_{gi}")(
                shared, training
            )
            # NHWC -> (B, c, H, W) for decode/targets
            pm = {k: v.transpose(0, 3, 1, 2) for k, v in preds.items()}

            if training:
                gt = batch_dict["gt_boxes"]
                gv = batch_dict["gt_boxes_mask"]
                cls_ids = gt[..., -1].astype(jnp.int32)
                group_ids = jnp.asarray([name_to_id[n] for n in group])
                # local 1-based class ids inside this group (0 = not in group)
                local = jnp.zeros_like(cls_ids)
                for li, g_cid in enumerate(
                    [name_to_id[n] for n in group]
                ):
                    local = jnp.where(cls_ids == g_cid, li + 1, local)
                in_group = local > 0

                def assign(boxes, valid, loc):
                    return centernet_utils.assign_center_targets(
                        boxes, valid, loc, len(group),
                        self.point_cloud_range, vs, stride, (H, W),
                        gaussian_overlap=float(tgt_cfg.get("GAUSSIAN_OVERLAP", 0.1)),
                        min_radius=int(tgt_cfg.get("MIN_RADIUS", 2)),
                        code_size=code_size,
                    )

                tgts = jax.vmap(assign)(gt, gv & in_group, local)
                hm_pred = jax.nn.sigmoid(pm["hm"])  # (B, nc, H, W)
                hm_loss = loss_utils.centernet_focal(
                    jnp.clip(hm_pred, 1e-4, 1 - 1e-4), tgts["heatmap"]
                )
                # gather reg preds at gt center pixels
                reg_order = list(cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])
                reg_map = jnp.concatenate(
                    [pm[k] for k in reg_order], axis=1
                )  # (B, code, H, W)

                def gather(rm, inds):
                    return rm.reshape(rm.shape[0], -1)[:, inds].T  # (M, code)

                reg_at = jax.vmap(gather)(reg_map, tgts["inds"])
                mask = tgts["mask"].astype(jnp.float32)
                # rot targets are (sin, cos); map box_targets order to
                # HEAD_ORDER (center(2), center_z(1), dim(3), rot(2)[, vel])
                reg_loss = (
                    jnp.abs(reg_at - tgts["box_targets"]) * mask[..., None]
                ).sum() / jnp.maximum(mask.sum(), 1.0)
                w = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
                gl = hm_loss * w.get("cls_weight", 1.0) + \
                    reg_loss * w.get("loc_weight", 2.0)
                total_loss = total_loss + gl
                tb[f"hm_loss_{gi}"] = hm_loss
                tb[f"reg_loss_{gi}"] = reg_loss

            # decode (eval and also train-with-roi flows)
            def decode(hm, ct, cz, dm, rt, vl):
                return centernet_utils.decode_bbox_from_heatmap(
                    jax.nn.sigmoid(hm), rt[1:2], rt[0:1], ct, cz, dm,
                    self.point_cloud_range, vs, stride,
                    vel=vl, K=K,
                )

            vel = pm.get("vel")
            if vel is None:
                boxes, scores, labels = jax.vmap(
                    lambda hm, ct, cz, dm, rt: decode(hm, ct, cz, dm, rt, None)
                )(pm["hm"], pm["center"], pm["center_z"], pm["dim"], pm["rot"])
            else:
                boxes, scores, labels = jax.vmap(decode)(
                    pm["hm"], pm["center"], pm["center_z"], pm["dim"],
                    pm["rot"], vel,
                )
            # map group-local labels to global 1-based ids
            lut = jnp.asarray([name_to_id[n] for n in group], jnp.int32)
            all_boxes.append(boxes)
            all_scores.append(scores)
            all_labels.append(lut[labels])

        batch_dict["final_boxes"] = jnp.concatenate(all_boxes, axis=1)
        batch_dict["final_scores"] = jnp.concatenate(all_scores, axis=1)
        batch_dict["final_labels"] = jnp.concatenate(all_labels, axis=1)
        if training:
            batch_dict["loss_center"] = total_loss
            batch_dict["tb_dict_center"] = tb
        return batch_dict
