"""Hermetic PandaSet pipeline on a synthetic raw layout (pandas-pickle
lidar frames + cuboid annotations + poses.json): create_pandaset_infos ->
PandasetDataset getitem (world -> normative ego geometry) ->
generate_prediction_dicts round trip (ego -> world must invert the load
transform) -> gt database."""
import json
import pickle

import numpy as np
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict

EGO_POS = [100.0, 50.0, 2.0]
EGO_YAW = 0.6  # rad, around world z
CAR_WORLD = [110.0, 53.0, 1.5]
CAR_DIMS = [1.9, 4.4, 1.6]  # pandaset dimensions.x/y/z
CAR_YAW = 0.25


def make_pandaset_root(tmp_path):
    import pandas as pd

    root = tmp_path
    for seq in ("001", "002"):
        lidar_dir = root / "dataset" / seq / "lidar"
        cub_dir = root / "dataset" / seq / "annotations" / "cuboids"
        lidar_dir.mkdir(parents=True)
        cub_dir.mkdir(parents=True)
        rng = np.random.RandomState(int(seq))
        poses = []
        for i in range(2):
            pos = [EGO_POS[0] + 5.0 * i, EGO_POS[1], EGO_POS[2]]
            half = EGO_YAW / 2
            poses.append({
                "position": {"x": pos[0], "y": pos[1], "z": pos[2]},
                "heading": {"w": np.cos(half), "x": 0.0, "y": 0.0,
                            "z": np.sin(half)},
            })
            # world-frame points around the ego + a clump inside the car
            pts = rng.uniform(-1, 1, (96, 3)) * [20, 20, 1] + pos
            car_i = np.array(CAR_WORLD) + [5.0 * i, 0.0, 0.0]
            pts = np.concatenate(
                [pts, car_i + rng.uniform(-0.3, 0.3, (8, 3))])
            df = pd.DataFrame({
                "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                "i": np.full(len(pts), 128.0),
                "t": np.zeros(len(pts)),
                "d": np.zeros(len(pts), np.int64),
            })
            df.to_pickle(lidar_dir / ("%02d.pkl.gz" % i))
            cub = pd.DataFrame({
                "position.x": [CAR_WORLD[0] + 5.0 * i],
                "position.y": [CAR_WORLD[1]],
                "position.z": [CAR_WORLD[2]],
                "dimensions.x": [CAR_DIMS[0]],
                "dimensions.y": [CAR_DIMS[1]],
                "dimensions.z": [CAR_DIMS[2]],
                "yaw": [CAR_YAW],
                "label": ["Car"],
                "cuboids.sensor_id": [-1],
            })
            cub.to_pickle(cub_dir / ("%02d.pkl.gz" % i))
        (lidar_dir / "poses.json").write_text(json.dumps(poses))
    return root


@pytest.fixture(scope="module")
def panda_root(tmp_path_factory):
    return make_pandaset_root(tmp_path_factory.mktemp("panda"))


def make_cfg(root):
    return EDict({
        "DATASET": "PandasetDataset",
        "DATA_PATH": str(root),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SEQUENCES": {"train": ["001"], "val": ["002"]},
        "INFO_PATH": {"train": ["pandaset_infos_train.pkl"],
                      "test": ["pandaset_infos_val.pkl"]},
        "LIDAR_DEVICE": 0,
        "TRAINING_CATEGORIES": {"Car": "car"},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "sample_points", "NUM_POINTS": {"train": 64,
                                                     "test": 64}},
        ],
        "POINT_CLOUD_RANGE": [-70.0, -70.0, -10.0, 70.0, 70.0, 10.0],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })


def test_create_infos_and_geometry(panda_root):
    from tsm_det_pointcloud_tpu.datasets.pandaset.pandaset_dataset import (
        PandasetDataset, create_pandaset_infos, lidar_points_to_ego,
    )
    from tsm_det_pointcloud_tpu.utils.common_utils import create_logger

    cfg = make_cfg(panda_root)
    create_pandaset_infos(cfg, ["car"], panda_root, panda_root)
    with open(panda_root / "pandaset_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 2 and infos[0]["sequence"] == "001"

    ds = PandasetDataset(cfg, ["car"], training=True, root_path=panda_root,
                         logger=create_logger())
    item = ds[0]
    assert item["points"].shape == (64, 4)
    assert 0.49 < item["points"][:, 3].max() <= 0.51  # 128/255

    # hand-check the box center: world -> pandaset ego -> normative
    pose = ds._get_pose(infos[0])
    ego = lidar_points_to_ego(np.array([CAR_WORLD]), pose)[0]
    expect = [ego[1], -ego[0], ego[2]]
    box = item["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], expect, atol=1e-5)
    np.testing.assert_allclose(
        box[3:6], [CAR_DIMS[1], CAR_DIMS[0], CAR_DIMS[2]], atol=1e-5)


def test_prediction_world_roundtrip(panda_root, tmp_path):
    """generate_prediction_dicts must invert the load transform: feeding
    the normative gt box back as a prediction recovers the WORLD cuboid."""
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.datasets.pandaset.pandaset_dataset import (
        PandasetDataset,
    )
    from tsm_det_pointcloud_tpu.utils.common_utils import create_logger

    cfg = make_cfg(panda_root)
    ds = PandasetDataset(cfg, ["car"], training=True, root_path=panda_root,
                         logger=create_logger())
    item = ds[0]
    gt = item["gt_boxes"][:1, :7]
    batch = {
        "frame_idx": [item["frame_idx"]],
        "sequence": [item["sequence"]],
        "zrot_world_to_ego": [np.float32(item["zrot_world_to_ego"])],
        "pose": [np.asarray(item["pose"], np.float64)],
        "batch_size": 1,
    }
    annos = ds.generate_prediction_dicts(
        batch,
        [{"pred_boxes": jnp.asarray(gt), "pred_scores": jnp.ones((1,)),
          "pred_labels": jnp.ones((1,), jnp.int32),
          "count": jnp.asarray(1)}],
        ["car"], output_path=tmp_path)
    df = annos[0]["preds"]
    np.testing.assert_allclose(
        [df["position.x"][0], df["position.y"][0], df["position.z"][0]],
        CAR_WORLD, atol=1e-4)
    np.testing.assert_allclose(df["yaw"][0] % (2 * np.pi),
                               CAR_YAW % (2 * np.pi), atol=1e-5)
    # devkit-compatible dump exists
    assert (tmp_path / "001" / "predictions" / "cuboids" / "00.pkl.gz"
            ).exists()


def test_gt_database(panda_root):
    from tsm_det_pointcloud_tpu.datasets.pandaset.pandaset_dataset import (
        PandasetDataset,
    )
    from tsm_det_pointcloud_tpu.utils.common_utils import create_logger

    cfg = make_cfg(panda_root)
    ds = PandasetDataset(cfg, ["car"], training=True, root_path=panda_root,
                         logger=create_logger())
    ds.create_groundtruth_database(
        str(panda_root / "pandaset_infos_train.pkl"), split="train")
    with open(panda_root / "pandaset_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert "car" in db and len(db["car"]) == 2
    assert all(d["num_points_in_gt"] >= 4 for d in db["car"])
