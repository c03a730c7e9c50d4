"""Lyft Level-5 dataset loader.

Parity: pcdet/datasets/lyft/lyft_dataset.py (345 L + utils): info pkls,
multi-sweep lidar accumulation with a per-sweep time-lag channel
(get_lidar_with_sweeps :58-81), the same prepare_data pipeline, and BOTH
official evaluation paths (evaluation :178-187):

* eval_metric 'lyft'  -> official Lyft 3D-IoU mAP over the configured
  threshold list, via the hermetic protocol rebuild in
  eval/lyft_eval.py (reference delegates to its vendored toolkit copy).
* eval_metric 'kitti' -> official KITTI AP over pseudo-KITTI annos
  (reference kitti_eval :189-213 + kitti_utils transform).

The lyft-devkit-dependent info creation stays gated (preprocess with the
devkit offline); everything downstream of the info pkls is hermetic.
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate

MAP_NAME_TO_KITTI = {
    "car": "Car",
    "pedestrian": "Pedestrian",
    "truck": "Truck",
    "bicycle": "Cyclist",
    "motorcycle": "Cyclist",
}


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

    def get_sweep(self, sweep_info):
        """One auxiliary sweep: drop ego-radius points, transform into the
        key frame, return (points, time_lags)."""
        lidar_path = self.root_path / sweep_info["lidar_path"]
        pts = np.fromfile(str(lidar_path), dtype=np.float32).reshape(-1, 5)
        pts = pts[:, :4]
        near = (np.abs(pts[:, 0]) < 1.0) & (np.abs(pts[:, 1]) < 1.0)
        pts = pts[~near]
        tm = sweep_info.get("transform_matrix")
        if tm is not None:
            hom = np.concatenate(
                [pts[:, :3], np.ones((len(pts), 1), pts.dtype)], axis=1)
            pts[:, :3] = (hom @ np.asarray(tm, pts.dtype).T)[:, :3]
        times = np.full((len(pts), 1), sweep_info["time_lag"], pts.dtype)
        return pts, times

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        pts = np.fromfile(
            str(self.root_path / info["lidar_path"]), dtype=np.float32
        ).reshape(-1, 5)[:, :4]
        sweep_points = [pts]
        sweep_times = [np.zeros((len(pts), 1), pts.dtype)]
        sweeps = info.get("sweeps", [])
        take = min(max_sweeps - 1, len(sweeps))
        for k in np.random.choice(len(sweeps), take, replace=False):
            p, t = self.get_sweep(sweeps[k])
            sweep_points.append(p)
            sweep_times.append(t)
        pts = np.concatenate(sweep_points, axis=0)
        times = np.concatenate(sweep_times, axis=0).astype(pts.dtype)
        return np.concatenate([pts, times], axis=1)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(
            index, max_sweeps=self.dataset_cfg.get("MAX_SWEEPS", 1)
        )
        input_dict = {
            "points": points,
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

    def kitti_eval(self, det_annos, class_names):
        """Official KITTI AP over pseudo-KITTI annos (reference
        lyft_dataset.py:189-213)."""
        from ...eval.kitti_eval import get_official_eval_result
        from ..kitti.kitti_format import to_kitti_format

        dt = to_kitti_format(det_annos, MAP_NAME_TO_KITTI)
        gt = to_kitti_format(
            [{"name": np.asarray(i["gt_names"], object),
              "gt_boxes_lidar": np.asarray(i["gt_boxes"])[:, :7]}
             for i in self.infos],
            MAP_NAME_TO_KITTI,
        )
        kitti_classes = sorted(
            {MAP_NAME_TO_KITTI[c] for c in class_names
             if c in MAP_NAME_TO_KITTI}
        )
        return get_official_eval_result(gt, dt, kitti_classes)

    def evaluation(self, det_annos, class_names, **kwargs):
        if "gt_boxes" not in self.infos[0]:
            return "No ground-truth boxes for evaluation", {}
        metric = kwargs.get("eval_metric", "lyft")
        if metric == "kitti":
            return self.kitti_eval(copy.deepcopy(det_annos), class_names)
        if metric == "lyft":
            from ...eval.lyft_eval import lyft_evaluation

            gt_annos = [{
                "name": np.asarray(info["gt_names"], object),
                "gt_boxes_lidar": np.asarray(info["gt_boxes"])[:, :7],
            } for info in self.infos]
            return lyft_evaluation(
                gt_annos, det_annos, list(class_names),
                iou_thresholds=self.dataset_cfg.get(
                    "EVAL_LYFT_IOU_LIST",
                    [0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95],
                ),
                version=self.dataset_cfg.get("VERSION", "trainval"),
            )
        if metric == "waymo":
            from ...eval.waymo_eval import waymo_evaluation

            gt_annos = [{
                "name": np.asarray(info["gt_names"], object),
                "gt_boxes_lidar": np.asarray(info["gt_boxes"])[:, :7],
            } for info in self.infos]
            s, d = waymo_evaluation(gt_annos, det_annos, tuple(class_names))
            return ("[NON-OFFICIAL metric: Waymo matching protocol, NOT "
                    "Lyft mAP — do not compare to published numbers]\n" + s,
                    d)
        raise NotImplementedError(metric)

    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """GT database for copy-paste augmentation (parity: reference
        lyft_dataset.py:206-249)."""
        from ...ops import boxes as box_ops

        database_save_path = self.root_path / (
            "gt_database_%dsweeps" % max_sweeps)
        db_info_save_path = self.root_path / (
            "lyft_dbinfos_%dsweeps.pkl" % max_sweeps)
        database_save_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        for idx in range(len(self.infos)):
            info = self.infos[idx]
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            gt_boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 7))))
            gt_names = np.asarray(info.get("gt_names", []))
            if gt_boxes.shape[0] == 0:
                continue
            box_idx = box_ops.points_in_boxes_np(
                points[:, :3], gt_boxes[:, :7])
            for i in range(gt_boxes.shape[0]):
                name = str(gt_names[i])
                if used_classes is not None and name not in used_classes:
                    continue
                gt_points = points[box_idx == i].copy()
                gt_points[:, :3] -= gt_boxes[i, :3]
                filename = "%s_%s_%d.bin" % (info["token"], name, i)
                with open(database_save_path / filename, "w+b") as f:
                    gt_points.tofile(f)
                all_db_infos.setdefault(name, []).append({
                    "name": name,
                    "path": str((database_save_path / filename
                                 ).relative_to(self.root_path)),
                    "image_idx": idx, "gt_idx": i,
                    "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": int(gt_points.shape[0]),
                })
        for k, v in all_db_infos.items():
            if self.logger:
                self.logger.info("Database %s: %d" % (k, len(v)))
        with open(db_info_save_path, "wb") as f:
            pickle.dump(all_db_infos, f)


def create_lyft_info(version, data_path, save_path, split=None,
                     max_sweeps=10):
    """Hermetic offline info creation — no lyft-devkit needed; the JSON
    tables are parsed directly (lyft_tables.py, shared with the nuScenes
    hermetic rebuild)."""
    from .lyft_tables import create_lyft_info as _create

    return _create(version, data_path, save_path, split=split,
                   max_sweeps=max_sweeps)
