"""CenterPoint detector (parity: pcdet/models/detectors/centerpoint.py:36-50:
own post_processing consuming the center head's decoded boxes)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.model_utils import centernet_utils
from ...ops import iou3d
from .detector3d_template import Detector3DTemplate


class CenterPoint(Detector3DTemplate):
    def __call__(self, batch_dict, training=False):
        batch_dict = self.forward_modules(batch_dict, training=training)
        if training:
            batch_dict["loss"] = batch_dict["loss_center"]
            batch_dict["tb_dict"] = batch_dict.get("tb_dict_center", {})
        return batch_dict

    def post_processing(self, batch_dict):
        post_cfg = self.model_cfg["POST_PROCESSING"]
        nms_cfg = post_cfg.get("NMS_CONFIG", {})
        score_thresh = float(post_cfg.get("SCORE_THRESH", 0.1))
        post_max = int(nms_cfg.get("NMS_POST_MAXSIZE", 500))

        boxes = batch_dict["final_boxes"]
        scores = batch_dict["final_scores"]
        labels = batch_dict["final_labels"]

        def single(bx, sc, lb):
            valid = sc > score_thresh
            nms_type = str(nms_cfg.get("NMS_TYPE", "nms_gpu"))
            if nms_type == "circle_nms":
                pos, cnt, ksc = centernet_utils.circle_nms(
                    bx[:, :2], sc, valid,
                    float(nms_cfg.get("MIN_RADIUS", 1.0)), post_max,
                )
            else:
                pos, cnt, ksc = iou3d.nms_bev(
                    bx[:, :7], jnp.where(valid, sc, -jnp.inf),
                    float(nms_cfg.get("NMS_THRESH", 0.7)),
                    pre_maxsize=int(nms_cfg.get("NMS_PRE_MAXSIZE", bx.shape[0])),
                    post_maxsize=post_max,
                )
            slot_ok = jnp.arange(pos.shape[0]) < cnt
            return (
                jnp.where(slot_ok[:, None], bx[pos][:, :7], 0.0),
                jnp.where(slot_ok, ksc, 0.0),
                jnp.where(slot_ok, lb[pos], 0),
                cnt,
            )

        b, s, l, c = jax.lax.map(lambda a: single(*a), (boxes, scores, labels))
        pred = {"pred_boxes": b, "pred_scores": s, "pred_labels": l, "count": c}
        recall_dict = {}
        if "gt_boxes" in batch_dict:
            recall_dict = self.generate_recall_record(
                b, c, batch_dict,
                thresh_list=post_cfg.get("RECALL_THRESH_LIST", [0.3, 0.5, 0.7]),
            )
        return pred, recall_dict
