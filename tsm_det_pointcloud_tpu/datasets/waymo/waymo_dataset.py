"""Waymo Open Dataset loader.

Parity: pcdet/datasets/waymo/waymo_dataset.py:21-474 — per-sequence info
pkls, SAMPLED_INTERVAL subsampling (train=5 -> 20% data), npy lidar frames
[x, y, z, intensity(tanh), elongation] with NLZ filtering, gt database
creation with per-frame class thinning, kitti- or waymo-metric evaluation.

The tfrecord -> npy/pkl preprocessing (`create_waymo_infos`, reference
:403-445) runs HERMETICALLY here: waymo_preprocess.py implements the
tfrecord framing, the Frame-proto wire decoding, and the range-image ->
point-cloud extraction in pure python/numpy (no TF / waymo pip). The
loader consumes the produced layout:
  <root>/waymo_processed_data/<sequence>/NNNN.npy + <sequence>.pkl
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ...ops import boxes as box_ops
from ..dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.data_path = self.root_path / self.dataset_cfg.get(
            "PROCESSED_DATA_TAG", "waymo_processed_data"
        )
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        split_file = self.root_path / "ImageSets" / (self.split + ".txt")
        self.sample_sequence_list = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists() else []
        )
        self.infos = []
        self.include_waymo_data(self.mode)
        self.use_shared_memory = (
            self.dataset_cfg.get("USE_SHARED_MEMORY", False) and self.training
        )
        self.shared_memory_file_limit = int(self.dataset_cfg.get(
            "SHARED_MEMORY_FILE_LIMIT", 0x7FFFFFFF
        ))
        if self.use_shared_memory:
            self.load_data_to_shared_memory()

    def include_waymo_data(self, mode):
        if self.logger:
            self.logger.info("Loading Waymo dataset")
        infos = []
        for seq in self.sample_sequence_list:
            seq_name = Path(seq).stem
            info_path = self.data_path / seq_name / (f"{seq_name}.pkl")
            if not info_path.exists():
                continue
            with open(info_path, "rb") as f:
                infos.extend(pickle.load(f))
        self.infos.extend(infos[:: self.dataset_cfg.get("SAMPLED_INTERVAL", {}).get(self.mode, 1)])
        if self.logger:
            self.logger.info(
                "Total samples for Waymo dataset: %d" % len(self.infos)
            )

    def load_data_to_shared_memory(self):
        """Host-shared preload of the training frames (parity:
        waymo_dataset.py:77-98; rank-strided over pod processes)."""
        from .. import shared_memory as shm

        if not shm.available():
            self.use_shared_memory = False
            return
        rank, world = self._dist_info()
        infos = self.infos[: self.shared_memory_file_limit]
        for info in infos[rank::world]:
            pc = info["point_cloud"]
            key = f"{pc['lidar_sequence']}___{pc['sample_idx']}"
            if shm.sa_exists(key):
                continue
            shm.sa_create(key, self._load_lidar_file(
                pc["lidar_sequence"], pc["sample_idx"]
            ))
        if self.logger:
            self.logger.info("Training data has been saved to shared memory")

    def clean_shared_memory(self):
        from .. import shared_memory as shm

        rank, world = self._dist_info()
        infos = self.infos[: self.shared_memory_file_limit]
        for info in infos[rank::world]:
            pc = info["point_cloud"]
            shm.sa_delete(f"{pc['lidar_sequence']}___{pc['sample_idx']}")

    @staticmethod
    def _dist_info():
        try:
            import jax

            return jax.process_index(), jax.process_count()
        except Exception:
            return 0, 1

    def get_lidar(self, sequence_name, sample_idx):
        if getattr(self, "use_shared_memory", False):
            from .. import shared_memory as shm

            key = f"{sequence_name}___{sample_idx}"
            if shm.sa_exists(key):
                return shm.sa_attach(key, copy=True)
        return self._load_lidar_file(sequence_name, sample_idx)

    def _load_lidar_file(self, sequence_name, sample_idx):
        lidar_file = self.data_path / sequence_name / ("%04d.npy" % sample_idx)
        point_features = np.load(lidar_file)  # (N, 6): xyz, intensity, elong, NLZ
        points_all, nlz_flag = point_features[:, 0:5], point_features[:, 5]
        if not self.dataset_cfg.get("DISABLE_NLZ_FLAG_ON_POINTS", False):
            points_all = points_all[nlz_flag == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all

    def get_sequence_data(self, info, sequence_name, sample_idx,
                          sweep_range=(-4, 0)):
        """Multi-frame sweep accumulation (north-star: the reference ships
        only gt-db naming for -4..0 sweeps, README.md:87-89; here past
        frames are ego-aligned by pose and tagged with a time-lag channel
        like the official multi-frame WaymoDataset)."""
        points_list = []
        pose_cur = np.asarray(
            info.get("pose", np.eye(4)), np.float64
        ).reshape(4, 4)
        seq_len = info.get("sequence_len", sample_idx + 1)
        for offset in range(sweep_range[0], sweep_range[1] + 1):
            idx = sample_idx + offset
            if idx < 0 or idx >= seq_len:
                continue
            try:
                pts = self.get_lidar(sequence_name, idx)
            except FileNotFoundError:
                continue
            if offset != 0:
                pose_prev = self._pose_of(sequence_name, idx)
                if pose_prev is not None:
                    rel = np.linalg.inv(pose_cur) @ pose_prev
                    xyz1 = np.concatenate(
                        [pts[:, :3], np.ones((len(pts), 1))], 1
                    )
                    pts = pts.copy()
                    pts[:, :3] = (xyz1 @ rel.T)[:, :3]
            lag = np.full((len(pts), 1), 0.1 * -offset, np.float32)
            points_list.append(np.concatenate([pts, lag], 1))
        return np.concatenate(points_list, 0) if points_list else None

    def _pose_of(self, sequence_name, sample_idx):
        for info in self.infos:
            pc = info["point_cloud"]
            if (pc["lidar_sequence"] == sequence_name
                    and pc["sample_idx"] == sample_idx
                    and "pose" in info):
                return np.asarray(info["pose"], np.float64).reshape(4, 4)
        return None

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        pc_info = info["point_cloud"]
        sequence_name = pc_info["lidar_sequence"]
        sample_idx = pc_info["sample_idx"]
        seq_cfg = self.dataset_cfg.get("SEQUENCE_CONFIG", {})
        if seq_cfg.get("ENABLED", False):
            points = self.get_sequence_data(
                info, sequence_name, sample_idx,
                sweep_range=tuple(seq_cfg.get("SAMPLE_OFFSET", [-4, 0])),
            )
        else:
            points = self.get_lidar(sequence_name, sample_idx)

        input_dict = {
            "points": points,
            "frame_id": info.get("frame_id", f"{sequence_name}_{sample_idx}"),
        }
        if "annos" in info:
            annos = info["annos"]
            mask = annos["name"] != "unknown"
            gt_boxes = annos["gt_boxes_lidar"][mask]
            input_dict.update({
                "gt_names": annos["name"][mask],
                "gt_boxes": gt_boxes.astype(np.float32),
                "num_points_in_gt": annos.get(
                    "num_points_in_gt", np.zeros(mask.sum())
                )[mask],
            })
        data_dict = self.prepare_data(data_dict=input_dict)
        if data_dict is None:
            new_index = int(self.rng.integers(0, len(self)))
            return self.__getitem__(new_index)
        data_dict.pop("num_points_in_gt", None)
        data_dict["metadata"] = info.get("metadata", None)
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for b, box_dict in enumerate(pred_dicts):
            boxes = np.asarray(box_dict["pred_boxes"]).reshape(-1, 7)
            scores = np.asarray(box_dict["pred_scores"]).reshape(-1)
            labels = np.asarray(box_dict["pred_labels"]).reshape(-1)
            keep = scores > 0
            anno = {
                "name": np.array(class_names, dtype=object)[
                    np.clip(labels[keep] - 1, 0, len(class_names) - 1)
                ] if keep.any() else np.zeros(0, object),
                "score": scores[keep],
                "boxes_lidar": boxes[keep],
                "frame_id": np.asarray(batch_dict["frame_id"])[b]
                if "frame_id" in batch_dict else b,
            }
            annos.append(anno)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        if "annos" not in self.infos[0]:
            return "No ground-truth boxes for evaluation", {}
        metric = self.dataset_cfg.get("EVAL_METRIC", "waymo")
        eval_det = copy.deepcopy(det_annos)
        eval_gt = []
        for info in self.infos:
            a = copy.deepcopy(info["annos"])
            a["gt_boxes_lidar"] = a["gt_boxes_lidar"]
            eval_gt.append(a)
        if metric == "waymo":
            from ...eval.waymo_eval import waymo_evaluation

            name_map = {"Car": "Vehicle"}
            for a in eval_det:
                a["name"] = np.asarray(
                    [name_map.get(n, n) for n in a["name"]], dtype=object
                )
            for a in eval_gt:
                a["name"] = np.asarray(
                    [name_map.get(n, n) for n in a["name"]], dtype=object
                )
            classes = tuple(
                name_map.get(c, c) for c in class_names
            )
            return waymo_evaluation(eval_gt, eval_det, classes)
        raise NotImplementedError(metric)

    def create_groundtruth_database(self, info_path=None, used_classes=None,
                                    split="train", sampled_interval=1,
                                    processed_data_tag=None):
        """GT database for copy-paste augmentation (parity :321-400, with
        the per-frame class thinning of Vehicle k%4 / Pedestrian k%2)."""
        db_path = self.root_path / (
            f"pcdet_gt_database_{split}_sampled_{sampled_interval}"
        )
        db_info_path = self.root_path / (
            f"pcdet_waymo_dbinfos_{split}_sampled_{sampled_interval}.pkl"
        )
        db_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        for k in range(0, len(self.infos), sampled_interval):
            info = self.infos[k]
            pc_info = info["point_cloud"]
            seq, idx = pc_info["lidar_sequence"], pc_info["sample_idx"]
            points = self.get_lidar(seq, idx)
            annos = info["annos"]
            names = annos["name"]
            gt_boxes = annos["gt_boxes_lidar"]
            box_idx = box_ops.points_in_boxes_np(points[:, :3], gt_boxes[:, :7])
            for i in range(len(names)):
                if used_classes and names[i] not in used_classes:
                    continue
                # reference thinning: Vehicle every 4th frame, Ped every 2nd
                if names[i] == "Vehicle" and k % 4 != 0:
                    continue
                if names[i] == "Pedestrian" and k % 2 != 0:
                    continue
                gt_points = points[box_idx == i]
                if len(gt_points) == 0:
                    continue
                gt_points = gt_points.copy()
                gt_points[:, :3] -= gt_boxes[i, :3]
                fname = f"{seq}_{idx}_{names[i]}_{i}.bin"
                with open(db_path / fname, "wb") as f:
                    gt_points.astype(np.float32).tofile(f)
                db_info = {
                    "name": names[i],
                    "path": str(Path(db_path.name) / fname),
                    "sequence_name": seq,
                    "sample_idx": idx,
                    "gt_idx": i,
                    "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": len(gt_points),
                    "difficulty": annos.get("difficulty", [0] * len(names))[i],
                }
                all_db_infos.setdefault(names[i], []).append(db_info)
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return db_info_path


    def set_split(self, split):
        """Re-point the dataset at another split (parity :39-48)."""
        self.split = split
        split_file = self.root_path / "ImageSets" / (self.split + ".txt")
        self.sample_sequence_list = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists() else []
        )
        self.infos = []

    def get_infos(self, raw_data_path, save_path, num_workers=1,
                  has_label=True, sampled_interval=1):
        """tfrecord -> per-sequence npy/pkl via the HERMETIC preprocessor
        (waymo_preprocess.py — no TF / waymo pip needed; parity:
        reference waymo_dataset.py:137-160 -> waymo_utils.py:184-246)."""
        from functools import partial

        from .waymo_preprocess import process_single_sequence

        fn = partial(
            process_single_sequence, save_path=Path(save_path),
            sampled_interval=sampled_interval, has_label=has_label,
        )
        files = [Path(raw_data_path) / seq
                 for seq in self.sample_sequence_list]
        if num_workers > 1:
            import multiprocessing

            with multiprocessing.Pool(num_workers) as pool:
                per_seq = pool.map(fn, files)
        else:
            per_seq = [fn(f) for f in files]
        return [info for seq in per_seq for info in seq]


def create_waymo_infos(dataset_cfg, class_names, data_path, save_path,
                       raw_data_tag="raw_data",
                       processed_data_tag="waymo_processed_data",
                       workers=1):
    """Offline preprocessing entry (parity: reference waymo_dataset.py:
    403-445): tfrecords under <data_path>/<raw_data_tag>/ -> per-sequence
    npy/pkl under <save_path>/<processed_data_tag>/, split info pkls, and
    the train gt database. Runs hermetically (pure-python tfrecord +
    proto decoding, numpy range-image extraction)."""
    from ...utils.common_utils import create_logger

    data_path, save_path = Path(data_path), Path(save_path)
    dataset = WaymoDataset(
        dataset_cfg=dataset_cfg, class_names=class_names,
        root_path=data_path, training=False, logger=create_logger(),
    )
    train_split, val_split = "train", "val"
    train_filename = save_path / f"{processed_data_tag}_infos_{train_split}.pkl"
    val_filename = save_path / f"{processed_data_tag}_infos_{val_split}.pkl"

    print("---------------Start to generate data infos---------------")
    dataset.set_split(train_split)
    waymo_infos_train = dataset.get_infos(
        raw_data_path=data_path / raw_data_tag,
        save_path=save_path / processed_data_tag, num_workers=workers,
        has_label=True, sampled_interval=1,
    )
    with open(train_filename, "wb") as f:
        pickle.dump(waymo_infos_train, f)
    print(f"----------------Waymo info train file is saved to "
          f"{train_filename}----------------")

    dataset.set_split(val_split)
    waymo_infos_val = dataset.get_infos(
        raw_data_path=data_path / raw_data_tag,
        save_path=save_path / processed_data_tag, num_workers=workers,
        has_label=True, sampled_interval=1,
    )
    with open(val_filename, "wb") as f:
        pickle.dump(waymo_infos_val, f)
    print(f"----------------Waymo info val file is saved to "
          f"{val_filename}----------------")

    print("---------------Start create groundtruth database for data "
          "augmentation---------------")
    dataset.set_split(train_split)
    dataset.infos = list(waymo_infos_train)
    dataset.create_groundtruth_database(
        info_path=train_filename, split="train", sampled_interval=1,
        used_classes=["Vehicle", "Pedestrian", "Cyclist"],
        processed_data_tag=processed_data_tag,
    )
    print("---------------Data preparation Done---------------")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "create_waymo_infos":
        import yaml as _yaml

        from ...utils.edict import EDict

        dataset_cfg = EDict(_yaml.safe_load(open(sys.argv[2])))
        ROOT_DIR = (Path(sys.argv[3]) if len(sys.argv) > 3
                    else Path(dataset_cfg.DATA_PATH))
        create_waymo_infos(
            dataset_cfg=dataset_cfg,
            class_names=["Vehicle", "Pedestrian", "Cyclist"],
            data_path=ROOT_DIR, save_path=ROOT_DIR,
            processed_data_tag=dataset_cfg.get(
                "PROCESSED_DATA_TAG", "waymo_processed_data"),
        )
