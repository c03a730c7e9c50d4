"""PointPillar detector (parity: pcdet/models/detectors/pointpillar.py)."""
from __future__ import annotations

from .detector3d_template import Detector3DTemplate


class PointPillar(Detector3DTemplate):
    def __call__(self, batch_dict, training=False):
        batch_dict = self.forward_modules(batch_dict, training=training)
        if training:
            loss, tb = self.get_training_loss(batch_dict)
            batch_dict["loss"] = loss
            batch_dict["tb_dict"] = tb
        return batch_dict

    def get_training_loss(self, batch_dict):
        dense_head = self._get_module("dense_head")
        loss, tb = dense_head.loss(batch_dict)
        return loss, tb

    def _get_module(self, role):
        for m, (r, _name) in zip(self.module_list, self._module_infos):
            if r == role:
                return m
        raise KeyError(role)
