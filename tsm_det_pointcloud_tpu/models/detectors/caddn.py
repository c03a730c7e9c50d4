"""CaDDN detector (parity: pcdet/models/detectors/caddn.py): camera-only —
ImageVFE frustum features + BEV backbone + anchor head; training loss adds
the depth-distribution focal term."""
from __future__ import annotations

from .detector3d_template import Detector3DTemplate


class CaDDN(Detector3DTemplate):
    def __call__(self, batch_dict, training=False):
        batch_dict = self.forward_modules(batch_dict, training=training)
        if training:
            dense_head = self._get_module("dense_head")
            loss, tb = dense_head.loss(batch_dict)
            if "loss_depth" in batch_dict:
                loss = loss + batch_dict["loss_depth"] * float(
                    self.model_cfg.get("VFE", {}).get(
                        "LOSS_CONFIG", {}
                    ).get("WEIGHTS", {}).get("ddn_loss", 3.0)
                )
                tb = {**tb, "depth_loss": batch_dict["loss_depth"]}
            batch_dict["loss"] = loss
            batch_dict["tb_dict"] = tb
        return batch_dict

    def _get_module(self, role):
        for m, (r, _name) in zip(self.module_list, self._module_infos):
            if r == role:
                return m
        raise KeyError(role)
