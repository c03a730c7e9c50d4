"""Generic two-stage detectors (parity: pcdet/models/detectors/
{point_rcnn.py, voxel_rcnn.py, PartA2_net.py}): first-stage loss (dense or
point head) + RCNN loss."""
from __future__ import annotations

from .detector3d_template import Detector3DTemplate


class TwoStageBase(Detector3DTemplate):
    def __call__(self, batch_dict, training=False):
        batch_dict = self.forward_modules(batch_dict, training=training)
        if training:
            loss = 0.0
            tb = {}
            dense_head = self._maybe_module("dense_head")
            if dense_head is not None and hasattr(dense_head, "loss"):
                l, t = dense_head.loss(batch_dict)
                loss = loss + l
                tb.update(t)
            if "loss_point" in batch_dict:
                loss = loss + batch_dict["loss_point"]
                tb["point_loss"] = batch_dict["loss_point"]
            if "loss_rcnn" in batch_dict:
                loss = loss + batch_dict["loss_rcnn"]
                tb.update(batch_dict.get("tb_dict_rcnn", {}))
            batch_dict["loss"] = loss
            batch_dict["tb_dict"] = tb
        return batch_dict

    def _maybe_module(self, role):
        for m, (r, _name) in zip(self.module_list, self._module_infos):
            if r == role:
                return m
        return None


class PointRCNN(TwoStageBase):
    """PointNet2MSG backbone -> PointHeadBox proposals -> PointRCNNHead."""


class VoxelRCNN(TwoStageBase):
    """Sparse backbone -> anchor RPN -> VoxelRCNNHead grid pooling."""


class PartA2Net(TwoStageBase):
    """UNetV2 backbone -> anchor RPN + part head -> Part-A2 RoI head."""


class SECONDNetIoU(TwoStageBase):
    """SECOND + IoU-rectification cascade (parity: second_net_iou.py):
    the SECONDHead rectifies scores as cls^(1-a) * iou^a before NMS."""


class DSASNet(TwoStageBase):
    """Parity: the TSM project's DSASNet detector (experimental) —
    module-list loop with whatever heads the config wires (the generic
    loss summation covers dense/point/rcnn heads)."""


class PVSSDA(TwoStageBase):
    """Parity: the TSM project's PVSSDA detector (experimental)."""
