"""NuScenes / Lyft / Pandaset loader plumbing on synthetic info pkls."""
import pickle

import numpy as np
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict

BASE_CFG = {
    "POINT_CLOUD_RANGE": [-50, -50, -5, 50, 50, 3],
    "MAX_POINTS": 128,
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range",
         "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 128, "test": 128}},
    ],
    "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                       "AUG_CONFIG_LIST": []},
    "DATA_SPLIT": {"train": "train", "test": "val"},
}


def _lidar_bin(path, n=300, dims=5):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-40, 40, (n, dims)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, n)
    pts.tofile(path)
    return pts


def test_nuscenes_loader(tmp_path):
    from tsm_det_pointcloud_tpu.datasets.nuscenes.nuscenes_dataset import (
        NuScenesDataset,
    )

    version_dir = tmp_path / "v1.0-trainval"
    version_dir.mkdir()
    _lidar_bin(version_dir / "frame0.bin")
    infos = [{
        "lidar_path": "frame0.bin",
        "token": "tok0",
        "sweeps": [],
        "gt_boxes": np.asarray([[5, 0, 0, 4, 2, 1.5, 0.3]], np.float32),
        "gt_names": np.asarray(["car"], object),
        "num_lidar_pts": np.asarray([30]),
    }]
    with open(version_dir / "infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)

    cfg = EDict({**BASE_CFG, "DATASET": "NuScenesDataset",
                 "VERSION": "v1.0-trainval", "DATA_PATH": str(tmp_path),
                 "INFO_PATH": {"train": ["infos_train.pkl"],
                               "test": ["infos_train.pkl"]},
                 "MAX_SWEEPS": 1, "BALANCED_RESAMPLING": True})
    cfg["POINT_FEATURE_ENCODING"] = {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
    }
    ds = NuScenesDataset(cfg, class_names=["car"], training=True,
                         root_path=tmp_path)
    assert len(ds) >= 1
    item = ds[0]
    assert item["points"].shape == (128, 5)  # xyz+intensity+time channel
    assert item["gt_boxes"].shape[-1] == 8


def test_lyft_loader_plumbing(tmp_path):
    # (the full PandasetDataset is covered by tests/test_pandaset_pipeline.py
    # on a real synthetic raw layout)
    from tsm_det_pointcloud_tpu.datasets.lyft.lyft_dataset import LyftDataset

    _lidar_bin(tmp_path / "f0.bin", dims=5)
    infos = [{
        "lidar_path": "f0.bin",
        "gt_boxes": np.asarray([[5, 0, 0, 4, 2, 1.5, 0.3]], np.float32),
        "gt_names": np.asarray(["car"], object),
    }]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    cfg = EDict({**BASE_CFG, "DATASET": "LyftDataset",
                 "DATA_PATH": str(tmp_path),
                 "INFO_PATH": {"train": ["infos.pkl"], "test": ["infos.pkl"]}})
    ds = LyftDataset(cfg, class_names=["car"], training=True,
                     root_path=tmp_path)
    assert len(ds) == 1 and ds[0]["points"].shape == (128, 4)


def test_nuscenes_evaluation_official_nds(tmp_path):
    """The loader's evaluation() returns the OFFICIAL NDS (hermetic
    protocol), not a substituted matcher; the waymo branch is labeled."""
    from tsm_det_pointcloud_tpu.datasets.nuscenes.nuscenes_dataset import (
        NuScenesDataset,
    )

    version_dir = tmp_path / "v1.0-trainval"
    version_dir.mkdir()
    _lidar_bin(version_dir / "frame0.bin")
    infos = [{
        "lidar_path": "frame0.bin", "token": "t0", "sweeps": [],
        "gt_boxes": np.asarray([[5, 0, 0, 4, 2, 1.5, 0.3]], np.float32),
        "gt_names": np.asarray(["car"], object),
        "num_lidar_pts": np.asarray([30]),
    }]
    with open(version_dir / "infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = EDict({**BASE_CFG, "DATASET": "NuScenesDataset",
                 "VERSION": "v1.0-trainval", "DATA_PATH": str(tmp_path),
                 "INFO_PATH": {"train": ["infos_train.pkl"],
                               "test": ["infos_train.pkl"]}})
    ds = NuScenesDataset(cfg, class_names=["car"], training=False,
                         root_path=tmp_path)
    det = [{"name": np.asarray(["car"], object),
            "score": np.asarray([0.9]),
            "boxes_lidar": np.asarray([[5, 0, 0, 4, 2, 1.5, 0.3]])}]
    s, ret = ds.evaluation(det, ["car"])
    assert ret["NDS"] == pytest.approx(0.8, abs=1e-6)  # perfect, no vel
    assert ret["mAP"] == pytest.approx(1.0, abs=1e-6)
    s2, _ = ds.evaluation(det, ["car"], eval_metric="waymo")
    assert "NON-OFFICIAL" in s2


def test_lyft_evaluation_official_and_kitti(tmp_path):
    from tsm_det_pointcloud_tpu.datasets.lyft.lyft_dataset import LyftDataset

    _lidar_bin(tmp_path / "f0.bin", dims=5)
    infos = [{
        "lidar_path": "f0.bin",
        "gt_boxes": np.asarray([[5, 0, 0, 4, 2, 1.5, 0.3]], np.float32),
        "gt_names": np.asarray(["car"], object),
    }]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = EDict({**BASE_CFG, "DATASET": "LyftDataset",
                 "DATA_PATH": str(tmp_path),
                 "INFO_PATH": {"train": ["infos.pkl"],
                               "test": ["infos.pkl"]}})
    ds = LyftDataset(cfg, class_names=["car"], training=False,
                     root_path=tmp_path)
    det = [{"name": np.asarray(["car"], object),
            "score": np.asarray([0.9]),
            "boxes_lidar": np.asarray([[5, 0, 0, 4, 2, 1.5, 0.3]])}]
    s, ret = ds.evaluation(det, ["car"], eval_metric="lyft")
    assert ret["car"] == pytest.approx(1.0, abs=1e-6)  # exact box: IoU 1
    assert ret["mAP"] == pytest.approx(1.0, abs=1e-6)
    s2, ret2 = ds.evaluation(det, ["car"], eval_metric="kitti")
    assert "Car" in s2 and any("Car" in k for k in ret2)
