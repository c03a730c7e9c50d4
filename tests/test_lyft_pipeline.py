"""Hermetic Lyft offline pipeline on a synthetic JSON-table fixture:
tables -> create_lyft_info (ImageSets splits) -> LyftDataset (sweeps) ->
gt database -> official Lyft mAP evaluation round trip."""
import json
import pickle

import numpy as np
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict

EGO_SPEED = 8.0
LIDAR_Z = 1.7


def make_lyft_root(tmp_path):
    """One train + one val scene, 3 keyframes each, one sweep per
    keyframe. Layout: base/lyft/{data,lidar}/..., base/ImageSets/*.txt."""
    root = tmp_path / "lyft"
    (root / "data").mkdir(parents=True)
    (root / "lidar").mkdir()
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text("scene_a\n")
    (tmp_path / "ImageSets" / "val.txt").write_text("scene_b\n")

    rng = np.random.RandomState(1)
    T = {k: [] for k in ("category", "attribute", "sensor",
                         "calibrated_sensor", "ego_pose", "log", "scene",
                         "sample", "sample_data", "sample_annotation",
                         "instance")}
    T["category"].append({"token": "cat_car", "name": "car"})
    T["sensor"].append({"token": "sens_lidar", "channel": "LIDAR_TOP",
                        "modality": "lidar"})
    T["calibrated_sensor"].append({
        "token": "cs_lidar", "sensor_token": "sens_lidar",
        "translation": [0.0, 0.0, LIDAR_Z],
        "rotation": [1.0, 0.0, 0.0, 0.0]})

    def write_bin(rel, pts):
        arr = np.zeros((len(pts), 5), np.float32)
        arr[:, :3] = pts
        arr[:, 3] = 5.0
        (root / rel).write_bytes(arr.tobytes())

    for s, scene_name in enumerate(["scene_a", "scene_b"]):
        scene_tok = f"sc{s}"
        T["scene"].append({"token": scene_tok, "name": scene_name,
                           "first_sample_token": f"s{s}_0",
                           "log_token": "log0"})
        T["instance"].append({"token": f"inst{s}",
                              "category_token": "cat_car"})
        prev_sd = ""
        for i in range(3):
            tok = f"s{s}_{i}"
            t_us = int((50 + s * 500 + i * 0.5) * 1e6)
            ego_x = EGO_SPEED * (i * 0.5)
            car = [12.0, -3.0, 0.9]
            sd_tok = f"sd{s}_{i}"
            rel = f"lidar/kf{s}_{i}.bin"
            pts = rng.uniform(-1, 1, (48, 3)) * [25, 25, 1]
            pts = np.concatenate([pts, np.repeat(
                [[car[0] - ego_x, car[1], car[2] - LIDAR_Z]], 6, 0)])
            write_bin(rel, pts)
            T["ego_pose"].append({
                "token": f"ep{s}_{i}", "timestamp": t_us,
                "translation": [ego_x, 0.0, 0.0],
                "rotation": [1.0, 0.0, 0.0, 0.0]})
            T["sample_data"].append({
                "token": sd_tok, "sample_token": tok,
                "ego_pose_token": f"ep{s}_{i}",
                "calibrated_sensor_token": "cs_lidar",
                "timestamp": t_us, "filename": rel, "is_key_frame": True,
                "prev": prev_sd, "next": ""})
            T["sample"].append({
                "token": tok, "scene_token": scene_tok, "timestamp": t_us,
                "data": {"LIDAR_TOP": sd_tok}, "anns": [f"ann{s}_{i}"]})
            T["sample_annotation"].append({
                "token": f"ann{s}_{i}", "sample_token": tok,
                "instance_token": f"inst{s}",
                "translation": car, "size": [1.8, 4.2, 1.6],  # wlh
                "rotation": [np.cos(0.15), 0.0, 0.0, np.sin(0.15)],
                "prev": "", "next": ""})
            prev_sd = sd_tok

    for name, rows in T.items():
        (root / "data" / f"{name}.json").write_text(json.dumps(rows))
    (root / "data" / "log.json").write_text(
        json.dumps([{"token": "log0"}]))
    return root


@pytest.fixture(scope="module")
def lyft_root(tmp_path_factory):
    return make_lyft_root(tmp_path_factory.mktemp("lyft"))


def test_create_lyft_infos_and_geometry(lyft_root):
    from tsm_det_pointcloud_tpu.datasets.lyft.lyft_dataset import (
        create_lyft_info,
    )
    create_lyft_info("trainval", lyft_root, lyft_root, max_sweeps=3)
    with open(lyft_root / "lyft_infos_train.pkl", "rb") as f:
        train = pickle.load(f)
    with open(lyft_root / "lyft_infos_val.pkl", "rb") as f:
        val = pickle.load(f)
    assert len(train) == 3 and len(val) == 3

    info = train[1]
    ego_x = EGO_SPEED * 0.5
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(
        box[:3], [12.0 - ego_x, -3.0, 0.9 - LIDAR_Z], atol=1e-6)
    np.testing.assert_allclose(box[3:6], [4.2, 1.8, 1.6], atol=1e-6)
    np.testing.assert_allclose(box[6], 0.3, atol=1e-6)  # yaw = 2*0.15
    assert box.shape == (7,)  # Lyft layout: no velocity columns
    assert np.isnan(info["gt_boxes_velocity"]).all()
    # sweep transform: keyframe i-1 mapped into frame i shifts by the ego
    # displacement (static world, ego moved +4 m)
    real = [s for s in info["sweeps"] if s["transform_matrix"] is not None]
    assert real
    tm = real[0]["transform_matrix"]
    np.testing.assert_allclose(tm[:3, 3], [-4.0, 0.0, 0.0], atol=1e-6)


def test_lyft_dataset_eval_roundtrip(lyft_root):
    from tsm_det_pointcloud_tpu.datasets.lyft.lyft_dataset import LyftDataset
    from tsm_det_pointcloud_tpu.utils.common_utils import create_logger

    cfg = EDict({
        "DATASET": "LyftDataset",
        "DATA_PATH": str(lyft_root),
        "MAX_SWEEPS": 2,
        "INFO_PATH": {"train": ["lyft_infos_train.pkl"],
                      "test": ["lyft_infos_val.pkl"]},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "sample_points", "NUM_POINTS": {"train": 96,
                                                     "test": 96}},
        ],
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ds = LyftDataset(cfg, ["car"], training=True, root_path=None,
                     logger=create_logger())
    item = ds[1]
    assert item["points"].shape == (96, 5)
    assert item["gt_boxes"].shape[-1] == 8

    ds.create_groundtruth_database(used_classes=["car"], max_sweeps=2)
    with open(lyft_root / "lyft_dbinfos_2sweeps.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["car"]) == 3

    # eval: GT fed back as predictions through the official Lyft mAP
    ev = LyftDataset(cfg, ["car"], training=False, root_path=None,
                     logger=create_logger())
    import jax.numpy as jnp
    dets = []
    for i in range(len(ev)):
        g = ev.infos[i]["gt_boxes"]
        dets += ev.generate_prediction_dicts(
            {"frame_id": ["f%d" % i], "batch_size": 1,
             "metadata": [None]},
            [{"pred_boxes": jnp.asarray(g[:, :7]),
              "pred_scores": jnp.ones((len(g),)),
              "pred_labels": jnp.ones((len(g),), jnp.int32),
              "count": jnp.asarray(len(g))}], ["car"])
    s, d = ev.evaluation(dets, ["car"], eval_metric="lyft")
    assert d["mAP"] > 0.99, s
