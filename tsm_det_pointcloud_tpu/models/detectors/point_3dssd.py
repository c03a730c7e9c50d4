"""3DSSD / TSM detector (parity: pcdet/models/detectors/point_3dssd.py:8-41).

Loss = point head only (vote + cls + box + sasa)."""
from __future__ import annotations

from .detector3d_template import Detector3DTemplate


class Point3DSSD(Detector3DTemplate):
    def __call__(self, batch_dict, training=False):
        # the point head computes vote/cls/box/sasa losses inline and sets
        # batch_dict['loss'] / ['tb_dict'] when training
        return self.forward_modules(batch_dict, training=training)
