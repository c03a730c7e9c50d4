"""Detector base (flax).

Parity: pcdet/models/detectors/detector3d_template.py:17-625 — the module
topology builder (vfe -> backbone_3d -> map_to_bev -> pfe -> backbone_2d ->
neck -> dense_head -> point_head -> roi_head), on-device post_processing
(:207-349) and recall records (:500-542).

Differences by design:
  * modules are flax.linen children built in setup(); parameters live in a
    FrozenDict pytree, not attributes (functional training).
  * post_processing is fully on-device with fixed-size outputs:
    (B, POST_MAX, ...) arrays + per-sample counts — zero host round-trips
    (BASELINE.json north-star requirement).
  * checkpoint load/save is orbax on the param pytree (runtime/checkpoint.py),
    not here.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import iou3d
from ..model_utils import model_nms_utils


@dataclasses.dataclass(frozen=True)
class DatasetMeta:
    """Static dataset geometry handed to model builders (replaces the
    reference's live `dataset` reference, detector3d_template.py:26-36)."""
    class_names: tuple
    point_cloud_range: tuple
    voxel_size: tuple = None
    grid_size: tuple = None          # (nx, ny, nz)
    max_voxels: int = 16000
    max_points_per_voxel: int = 5
    num_point_features: int = 4
    max_points: int = 16384
    depth_downsample_factor: int = None


class Detector3DTemplate(nn.Module):
    model_cfg: dict
    num_class: int
    dataset_meta: DatasetMeta

    @property
    def module_topology(self):
        return [
            "vfe", "backbone_3d", "map_to_bev_module", "pfe",
            "backbone_2d", "neck", "dense_head", "point_head", "roi_head",
        ]

    def setup(self):
        from .. import build_module_list

        modules, infos = build_module_list(
            self.model_cfg, self.num_class, self.dataset_meta
        )
        self.module_list = modules
        self._module_infos = infos

    def forward_modules(self, batch_dict, training=False):
        for m in self.module_list:
            batch_dict = m(batch_dict, training=training)
        return batch_dict

    def __call__(self, batch_dict, training=False):
        return self.forward_modules(batch_dict, training=training)

    # ------------------------------------------------------------------
    # post processing (pure; no params)
    # ------------------------------------------------------------------

    def post_processing(self, batch_dict):
        """(parity: detector3d_template.py:207-349, default class-agnostic /
        multi_thresh path). Consumes batch_cls_preds (B, N, num_class) and
        batch_box_preds (B, N, 7+) and returns fixed-size detections:
        dict(pred_boxes (B, P, 7), pred_scores (B, P), pred_labels (B, P),
             count (B,)) plus recall_dict."""
        post_cfg = self.model_cfg["POST_PROCESSING"]
        nms_cfg = post_cfg["NMS_CONFIG"]
        score_thresh = post_cfg.get("SCORE_THRESH", 0.1)

        cls_preds = batch_dict["batch_cls_preds"]
        box_preds = batch_dict["batch_box_preds"]
        if not batch_dict.get("cls_preds_normalized", False):
            cls_preds = jax.nn.sigmoid(cls_preds)

        roi_labels = batch_dict.get("roi_labels")  # two-stage class labels

        def single(cls_p, box_p, given_labels=None):
            max_scores = cls_p.max(axis=-1)
            if given_labels is not None:
                labels = given_labels  # (parity: has_class_labels path :246)
            else:
                labels = cls_p.argmax(axis=-1).astype(jnp.int32) + 1
            if isinstance(score_thresh, (list, tuple)):
                idx, cnt, scores = model_nms_utils.multi_thresh_nms(
                    max_scores, box_p[:, :7], labels, nms_cfg,
                    list(score_thresh),
                )
            else:
                idx, cnt, scores = model_nms_utils.class_agnostic_nms(
                    max_scores, box_p[:, :7], nms_cfg,
                    score_thresh=float(score_thresh),
                )
            slot_ok = jnp.arange(idx.shape[0]) < cnt
            return (
                jnp.where(slot_ok[:, None], box_p[idx][:, :7], 0.0),
                jnp.where(slot_ok, scores, 0.0),
                jnp.where(slot_ok, labels[idx], 0),
                cnt,
            )

        # lax.map (not vmap): per-sample NMS keeps the pair-grid working set
        # at one sample's footprint instead of batch x PRE_MAX^2.
        if roi_labels is not None:
            boxes, scores, labels, counts = jax.lax.map(
                lambda args: single(*args), (cls_preds, box_preds, roi_labels)
            )
        else:
            boxes, scores, labels, counts = jax.lax.map(
                lambda args: single(*args), (cls_preds, box_preds)
            )
        pred = {
            "pred_boxes": boxes, "pred_scores": scores,
            "pred_labels": labels, "count": counts,
        }
        recall_dict = {}
        if "gt_boxes" in batch_dict:
            recall_dict = self.generate_recall_record(
                boxes, counts, batch_dict,
                thresh_list=post_cfg.get("RECALL_THRESH_LIST", [0.3, 0.5, 0.7]),
            )
        return pred, recall_dict

    def generate_recall_record(self, pred_boxes, counts, batch_dict, thresh_list):
        """On-device recall@iou counters (parity: :500-542, rcnn branch)."""
        gt_boxes = batch_dict["gt_boxes"]
        gt_valid = batch_dict["gt_boxes_mask"]

        def single(pb, cnt, gts, gv):
            iou = iou3d.boxes_iou3d(gts[:, :7], pb)  # (M, P)
            slot_ok = jnp.arange(pb.shape[0])[None, :] < cnt
            iou = jnp.where(slot_ok & gv[:, None], iou, 0.0)
            best = iou.max(axis=1)  # (M,)
            out = {}
            for th in thresh_list:
                out["roi_%s" % str(th)] = jnp.asarray(0.0)
                out["rcnn_%s" % str(th)] = ((best > th) & gv).sum().astype(jnp.float32)
            out["gt"] = gv.sum().astype(jnp.float32)
            return out

        per = jax.vmap(single)(pred_boxes, counts, gt_boxes, gt_valid)
        return {k: v.sum() for k, v in per.items()}
