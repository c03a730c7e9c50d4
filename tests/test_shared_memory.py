"""Shared-memory cache (numpy-memmap SharedArray equivalent) + consumers."""
import numpy as np
import pytest


@pytest.fixture
def shm_dir(tmp_path, monkeypatch):
    from tsm_det_pointcloud_tpu.datasets import shared_memory as shm

    monkeypatch.setattr(shm, "SHM_ROOT", tmp_path / "shm")
    (tmp_path / "shm").mkdir()
    return shm


def test_create_attach_delete(shm_dir):
    shm = shm_dir
    arr = np.arange(24, dtype=np.float32).reshape(6, 4)
    assert not shm.sa_exists("k1")
    shm.sa_create("k1", arr)
    assert shm.sa_exists("k1")
    shm.sa_create("k1", arr * 2)  # idempotent: first publish wins
    got = shm.sa_attach("k1")
    np.testing.assert_array_equal(got, arr)
    got[0, 0] = 99  # copy=True -> private
    np.testing.assert_array_equal(shm.sa_attach("k1"), arr)
    view = shm.sa_attach("k1", copy=False)
    assert not view.flags.writeable or isinstance(view, np.memmap)
    shm.sa_delete("k1")
    assert not shm.sa_exists("k1")
    shm.sa_delete("k1")  # missing ok


def test_key_sanitization(shm_dir):
    shm = shm_dir
    shm.sa_create("segment-0/with:odd chars", np.ones(3))
    assert shm.sa_exists("segment-0/with:odd chars")


def test_waymo_shared_memory_roundtrip(tmp_path, monkeypatch):
    import pickle

    from tsm_det_pointcloud_tpu.datasets import shared_memory as shm
    from tsm_det_pointcloud_tpu.datasets.waymo.waymo_dataset import (
        WaymoDataset,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    monkeypatch.setattr(shm, "SHM_ROOT", tmp_path / "shm")
    (tmp_path / "shm").mkdir()

    seq = "segment-shm"
    seq_dir = tmp_path / "waymo_processed_data" / seq
    seq_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(2):
        pts = np.zeros((50, 6), np.float32)
        pts[:, 0] = rng.uniform(1, 50, 50)
        pts[:, 5] = -1
        np.save(seq_dir / ("%04d.npy" % i), pts)
        infos.append({
            "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
            "frame_id": f"{seq}_{i}",
            "annos": {
                "name": np.asarray(["Vehicle"], object),
                "gt_boxes_lidar": np.asarray(
                    [[10.0, 0, 1, 4.5, 2.0, 1.8, 0.2]], np.float32),
                "num_points_in_gt": np.asarray([30]),
                "difficulty": np.asarray([0]),
            },
        })
    with open(seq_dir / f"{seq}.pkl", "wb") as f:
        pickle.dump(infos, f)
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text(seq + "\n")

    cfg = EDict({
        "DATASET": "WaymoDataset",
        "DATA_SPLIT": {"train": "train", "test": "train"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "USE_SHARED_MEMORY": True,
        "POINT_CLOUD_RANGE": [0, -40, -2, 70.4, 40, 4],
        "MAX_POINTS": 64,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "sample_points", "NUM_POINTS": {"train": 64, "test": 64}},
        ],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ds = WaymoDataset(cfg, class_names=["Vehicle"], training=True,
                      root_path=tmp_path)
    assert ds.use_shared_memory
    assert shm.sa_exists(f"{seq}___0") and shm.sa_exists(f"{seq}___1")
    # cached read equals direct file read
    np.testing.assert_allclose(
        ds.get_lidar(seq, 0), ds._load_lidar_file(seq, 0)
    )
    item = ds[0]
    assert item["points"].shape == (64, 4)
    ds.clean_shared_memory()
    assert not shm.sa_exists(f"{seq}___0")


def test_sampler_global_npy_mode(tmp_path, monkeypatch):
    import pickle

    from tsm_det_pointcloud_tpu.datasets import shared_memory as shm
    from tsm_det_pointcloud_tpu.datasets.augmentor.database_sampler import (
        DataBaseSampler,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    monkeypatch.setattr(shm, "SHM_ROOT", tmp_path / "shm")
    (tmp_path / "shm").mkdir()

    # one global npy with two objects (rows 0:30 and 30:80), 4 features
    rng = np.random.RandomState(0)
    db = rng.randn(80, 4).astype(np.float32) * 0.2
    np.save(tmp_path / "gt_database_global.npy", db)
    infos = {"Car": [
        {"name": "Car", "path": "unused.bin", "global_data_offset": (0, 30),
         "box3d_lidar": np.array([5, 0, -1, 3.9, 1.6, 1.56, 0.0], np.float32),
         "num_points_in_gt": 30, "difficulty": 0},
        {"name": "Car", "path": "unused.bin", "global_data_offset": (30, 80),
         "box3d_lidar": np.array([12, 3, -1, 3.9, 1.6, 1.56, 0.5], np.float32),
         "num_points_in_gt": 50, "difficulty": 0},
    ]}
    with open(tmp_path / "dbinfos.pkl", "wb") as f:
        pickle.dump(infos, f)

    sampler = DataBaseSampler(
        root_path=tmp_path,
        sampler_cfg=EDict({
            "DB_INFO_PATH": ["dbinfos.pkl"],
            "DB_DATA_PATH": ["gt_database_global.npy"],
            "USE_SHARED_MEMORY": True,
            "SAMPLE_GROUPS": ["Car:2"],
            "NUM_POINT_FEATURES": 4,
            "LIMIT_WHOLE_SCENE": False,
        }),
        class_names=["Car"],
    )
    assert sampler.use_shared_memory
    data = {
        "gt_boxes": np.zeros((0, 7), np.float32),
        "gt_names": np.zeros(0, object),
        "points": rng.randn(100, 4).astype(np.float32) + np.array([30, 0, 0, 0]),
    }
    out = sampler(data, np.random.default_rng(0))
    assert len(out["gt_boxes"]) == 2
    # pasted points = db rows shifted to the box centers (80 rows total)
    assert len(out["points"]) >= 100
