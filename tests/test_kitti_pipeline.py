"""Offline KITTI pipeline round trip on a synthetic raw layout:
raw velodyne/label/calib -> create_kitti_infos -> gt database ->
dataset __getitem__ with gt-sampling augmentation -> collate ->
generate_prediction_dicts -> official eval."""
import pickle

import numpy as np
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict


def make_kitti_root(tmp_path, n_frames=3):
    rng = np.random.RandomState(0)
    root = tmp_path
    (root / "ImageSets").mkdir()
    for sub in ("velodyne", "label_2", "calib", "image_2", "planes"):
        (root / "training" / sub).mkdir(parents=True)
    ids = [f"{i:06d}" for i in range(n_frames)]
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids) + "\n")

    # identity-ish calib in the REAL file layout (line-position parsed:
    # P0, P1, P2, P3, R0_rect, Tr_velo_to_cam)
    calib_txt = (
        "P0: 700 0 600 0 0 700 200 0 0 0 1 0\n"
        "P1: 700 0 600 0 0 700 200 0 0 0 1 0\n"
        "P2: 700 0 600 0 0 700 200 0 0 0 1 0\n"
        "P3: 700 0 600 0 0 700 200 0 0 0 1 0\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
    )
    for sid in ids:
        pts = np.zeros((600, 4), np.float32)
        pts[:, 0] = rng.uniform(3, 60, 600)
        pts[:, 1] = rng.uniform(-20, 20, 600)
        pts[:, 2] = rng.uniform(-1.8, 1.0, 600)
        # a car-shaped cluster at (10, 0)
        pts[:80, 0] = rng.uniform(8.5, 11.5, 80)
        pts[:80, 1] = rng.uniform(-0.8, 0.8, 80)
        pts[:80, 2] = rng.uniform(-1.5, 0.0, 80)
        pts.astype(np.float32).tofile(root / "training" / "velodyne" / f"{sid}.bin")

        # one Car: camera coords x=-y_l, y=-z_l+h/2... keep simple numbers:
        # location (cam) = (0, 1.2, 10): lidar (10, 0, ~-0.45)
        label = (
            "Car 0.0 0 -1.58 300 150 500 300 1.5 1.7 4.0 0.0 1.2 10.0 -1.58\n"
            "DontCare -1 -1 -10 0 0 50 50 -1 -1 -1 -1000 -1000 -1000 -10\n"
        )
        (root / "training" / "label_2" / f"{sid}.txt").write_text(label)
        (root / "training" / "calib" / f"{sid}.txt").write_text(calib_txt)
        (root / "training" / "planes" / f"{sid}.txt").write_text(
            "# Plane\nWidth 4\nHeight 1\n0 -1 0 1.65\n"
        )
    return root, ids


def dataset_cfg(root):
    return EDict({
        "DATASET": "KittiDataset",
        "DATA_PATH": str(root),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {"train": ["kitti_infos_train.pkl"],
                      "test": ["kitti_infos_train.pkl"]},
        "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
        "MAX_POINTS": 512,
        "GET_ITEM_LIST": ["points"],
        "FOV_POINTS_ONLY": False,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "sample_points",
             "NUM_POINTS": {"train": 512, "test": 512}},
            {"NAME": "shuffle_points",
             "SHUFFLE_ENABLED": {"train": True, "test": False}},
            {"NAME": "repository_info",
             "VOXEL_SIZE": [0.05, 0.05, 0.1], "FACTOR": 4},
        ],
        "DATA_AUGMENTOR": {
            "DISABLE_AUG_LIST": ["placeholder"],
            "AUG_CONFIG_LIST": [
                {"NAME": "gt_sampling",
                 "USE_ROAD_PLANE": False,
                 "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                 "PREPARE": {"filter_by_min_points": ["Car:5"],
                             "filter_by_difficulty": [-1]},
                 "SAMPLE_GROUPS": ["Car:3"],
                 "NUM_POINT_FEATURES": 4,
                 "DATABASE_WITH_FAKELIDAR": False,
                 "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                 "LIMIT_WHOLE_SCENE": False},
                {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
                {"NAME": "random_world_rotation",
                 "WORLD_ROT_ANGLE": [-0.78539816, 0.78539816]},
                {"NAME": "random_world_scaling",
                 "WORLD_SCALE_RANGE": [0.95, 1.05]},
            ],
        },
    })


def test_full_offline_pipeline(tmp_path):
    from tsm_det_pointcloud_tpu.datasets.kitti.kitti_dataset import (
        KittiDataset, create_kitti_infos,
    )

    root, ids = make_kitti_root(tmp_path)
    cfg = dataset_cfg(root)
    create_kitti_infos(
        cfg, class_names=["Car", "Pedestrian", "Cyclist"],
        data_path=root, save_path=root, workers=1,
    )
    assert (root / "kitti_infos_train.pkl").exists()
    assert (root / "kitti_dbinfos_train.pkl").exists()
    with open(root / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    anno = infos[0]["annos"]
    assert anno["name"][0] == "Car"
    # lidar box: x ~ 10, z ~ -0.45 (bottom + h/2), heading = -(pi/2 + ry)
    gtl = anno["gt_boxes_lidar"][0]
    np.testing.assert_allclose(gtl[0], 10.0, atol=0.2)
    assert anno["num_points_in_gt"][0] > 20

    with open(root / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["Car"]) == 3

    # training dataset with gt-sampling augmentation
    ds = KittiDataset(cfg, class_names=["Car", "Pedestrian", "Cyclist"],
                      training=True, root_path=root)
    item = ds[0]
    assert item["points"].shape == (512, 4)
    assert item["gt_boxes"].shape[-1] == 8
    assert item["gt_boxes"].shape[0] >= 1  # original + sampled cars
    batch = ds.collate_batch([ds[0], ds[1]])
    assert batch["points"].shape == (2, 512, 4)
    assert batch["gt_boxes"].ndim == 3

    # prediction dicts -> official eval round trip (echo the gt as dets)
    ds_eval = KittiDataset(cfg, class_names=["Car"], training=False,
                           root_path=root)
    det_annos = []
    for info in ds_eval.kitti_infos:
        a = info["annos"]
        mask = a["name"] == "Car"
        det_annos.append({
            "name": a["name"][mask],
            "truncated": a["truncated"][mask],
            "occluded": a["occluded"][mask],
            "alpha": a["alpha"][mask],
            "bbox": a["bbox"][mask],
            "dimensions": a["dimensions"][mask],
            "location": a["location"][mask],
            "rotation_y": a["rotation_y"][mask],
            "score": np.ones(mask.sum()),
            "boxes_lidar": a["gt_boxes_lidar"],
            "frame_id": info["point_cloud"]["lidar_idx"],
        })
    result_str, result_dict = ds_eval.evaluation(det_annos, ["Car"])
    # only 3 gts -> the 41-point grid can't fill; recall@max must be perfect
    assert "Car" in result_str
