"""PV-RCNN detector (parity: pcdet/models/detectors/pv_rcnn.py:9-31).

Training loss = RPN (anchor head) + keypoint segmentation (point head) +
RCNN (roi head)."""
from __future__ import annotations

from .detector3d_template import Detector3DTemplate


class PVRCNN(Detector3DTemplate):
    def __call__(self, batch_dict, training=False):
        batch_dict = self.forward_modules(batch_dict, training=training)
        if training:
            dense_head = self._get_module("dense_head")
            rpn_loss, tb = dense_head.loss(batch_dict)
            loss = rpn_loss
            if "loss_point" in batch_dict:
                loss = loss + batch_dict["loss_point"]
                tb = {**tb, "point_loss": batch_dict["loss_point"]}
            if "loss_rcnn" in batch_dict:
                loss = loss + batch_dict["loss_rcnn"]
                tb = {**tb, **batch_dict.get("tb_dict_rcnn", {})}
            batch_dict["loss"] = loss
            batch_dict["tb_dict"] = tb
        return batch_dict

    def _get_module(self, role):
        for m, (r, _name) in zip(self.module_list, self._module_infos):
            if r == role:
                return m
        raise KeyError(role)


class PVRCNNPlusPlus(PVRCNN):
    """PV-RCNN++ (parity: pv_rcnn_plusplus.py): same two-stage flow with
    sectorized keypoint sampling + VectorPool aggregation, both selected
    via PFE config (SAMPLE_METHOD: SPC, SA_LAYER NAME:
    VectorPoolAggregationModuleMSG)."""
