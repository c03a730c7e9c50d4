"""3DSSD / TSM detector (parity: pcdet/models/detectors/point_3dssd.py:8-41).

Loss = point head only (vote + cls + box + sasa)."""
from __future__ import annotations

from .detector3d_template import Detector3DTemplate


class Point3DSSD(Detector3DTemplate):
    def __call__(self, batch_dict, training=False):
        batch_dict = self.forward_modules(batch_dict, training=training)
        if training:
            point_head = self._get_module("point_head")
            loss, tb = point_head.loss(batch_dict)
            batch_dict["loss"] = loss
            batch_dict["tb_dict"] = tb
        return batch_dict

    def _get_module(self, role):
        for m, (r, _name) in zip(self.module_list, self._module_infos):
            if r == role:
                return m
        raise KeyError(role)
