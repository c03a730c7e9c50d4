"""Hermetic nuScenes offline pipeline on a synthetic JSON-table fixture:
tables -> create_nuscenes_info -> NuScenesDataset (sweeps, CBGS, velocity
columns) -> gt database. Geometry is validated against hand-computed
transforms (moving ego, moving instance)."""
import json
import pickle

import numpy as np
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict

EGO_SPEED = 10.0   # m/s along +x
CAR_SPEED = 5.0    # instance velocity along +x
LIDAR_Z = 1.8      # sensor mount height


def make_nuscenes_root(tmp_path, version="v1.0-mini"):
    """Two scenes x 3 keyframe samples each (0.5 s apart) + one
    intermediate sweep per keyframe (0.1 s before). Scene names use the
    official mini split so the built-in lists route them.

    Devkit layout: base/<version>/ is the dataroot, holding samples/,
    sweeps/ and the <version>/ JSON-table directory. Returns base."""
    root = tmp_path / version  # the dataroot (DATA_PATH/VERSION)
    vdir = root / version      # the JSON table directory
    vdir.mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)
    (root / "sweeps" / "LIDAR_TOP").mkdir(parents=True)
    (root / "samples" / "CAM_FRONT").mkdir(parents=True)

    rng = np.random.RandomState(0)
    T = {k: [] for k in ("category", "attribute", "sensor",
                         "calibrated_sensor", "ego_pose", "log", "scene",
                         "sample", "sample_data", "sample_annotation",
                         "instance")}
    T["category"].append({"token": "cat_car", "name": "vehicle.car"})
    T["sensor"].append({"token": "sens_lidar", "channel": "LIDAR_TOP",
                        "modality": "lidar"})
    T["sensor"].append({"token": "sens_cam", "channel": "CAM_FRONT",
                        "modality": "camera"})
    T["calibrated_sensor"].append({
        "token": "cs_lidar", "sensor_token": "sens_lidar",
        "translation": [0.0, 0.0, LIDAR_Z],
        "rotation": [1.0, 0.0, 0.0, 0.0], "camera_intrinsic": []})
    T["calibrated_sensor"].append({
        "token": "cs_cam", "sensor_token": "sens_cam",
        "translation": [1.5, 0.0, 1.5],
        "rotation": [0.5, -0.5, 0.5, -0.5],
        "camera_intrinsic": [[700, 0, 600], [0, 700, 200], [0, 0, 1]]})

    def write_bin(rel, pts):
        arr = np.zeros((len(pts), 5), np.float32)
        arr[:, :3] = pts
        arr[:, 3] = 10.0
        (root / rel).write_bytes(arr.tobytes())

    for s, scene_name in enumerate(["scene-0061", "scene-0103"]):
        scene_tok = f"scene{s}"
        sample_toks = [f"s{s}_{i}" for i in range(3)]
        inst_tok = f"inst{s}"
        ann_toks = [f"ann{s}_{i}" for i in range(3)]
        T["scene"].append({"token": scene_tok, "name": scene_name,
                           "first_sample_token": sample_toks[0],
                           "log_token": "log0"})
        T["instance"].append({"token": inst_tok,
                              "category_token": "cat_car"})
        prev_kf_sd = ""
        for i, tok in enumerate(sample_toks):
            t_us = int((100 + s * 1000 + i * 0.5) * 1e6)
            ego_x = EGO_SPEED * (i * 0.5)
            car_x = 15.0 + CAR_SPEED * (i * 0.5)
            # intermediate sweep 0.1 s before the keyframe (not for i=0)
            sweep_sd_tok = f"sd_sweep{s}_{i}"
            kf_sd_tok = f"sd_kf{s}_{i}"
            if i > 0:
                sw_t = t_us - int(0.1e6)
                sw_ego_x = ego_x - EGO_SPEED * 0.1
                T["ego_pose"].append({
                    "token": f"ep_sw{s}_{i}", "timestamp": sw_t,
                    "translation": [sw_ego_x, 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0]})
                rel = f"sweeps/LIDAR_TOP/sw{s}_{i}.pcd.bin"
                # a static global landmark at (20, 0, 2): sweep-sensor
                # coords (20 - sw_ego_x, 0, 2 - LIDAR_Z)
                write_bin(rel, [[20.0 - sw_ego_x, 0.0, 2.0 - LIDAR_Z]])
                T["sample_data"].append({
                    "token": sweep_sd_tok, "sample_token": tok,
                    "ego_pose_token": f"ep_sw{s}_{i}",
                    "calibrated_sensor_token": "cs_lidar",
                    "timestamp": sw_t, "filename": rel,
                    "is_key_frame": False,
                    "prev": prev_kf_sd, "next": kf_sd_tok})
            T["ego_pose"].append({
                "token": f"ep{s}_{i}", "timestamp": t_us,
                "translation": [ego_x, 0.0, 0.0],
                "rotation": [1.0, 0.0, 0.0, 0.0]})
            rel = f"samples/LIDAR_TOP/kf{s}_{i}.pcd.bin"
            pts = rng.uniform(-1, 1, (64, 3)) * [30, 30, 1] + [0, 0, 0]
            # plant points inside the car box (sensor frame)
            car_local = np.array([[car_x - ego_x, 2.0, 1.0 - LIDAR_Z]])
            pts = np.concatenate([pts, np.repeat(car_local, 8, 0)])
            write_bin(rel, pts)
            T["sample_data"].append({
                "token": kf_sd_tok, "sample_token": tok,
                "ego_pose_token": f"ep{s}_{i}",
                "calibrated_sensor_token": "cs_lidar",
                "timestamp": t_us, "filename": rel, "is_key_frame": True,
                "prev": sweep_sd_tok if i > 0 else "", "next": ""})
            cam_rel = f"samples/CAM_FRONT/kf{s}_{i}.jpg"
            (root / cam_rel).write_bytes(b"\xff\xd8\xff\xd9")
            T["sample_data"].append({
                "token": f"sd_cam{s}_{i}", "sample_token": tok,
                "ego_pose_token": f"ep{s}_{i}",
                "calibrated_sensor_token": "cs_cam",
                "timestamp": t_us, "filename": cam_rel,
                "is_key_frame": True, "prev": "", "next": "",
                "width": 1600, "height": 900})
            T["sample"].append({
                "token": tok, "scene_token": scene_tok, "timestamp": t_us,
                "data": {"LIDAR_TOP": kf_sd_tok,
                         "CAM_FRONT": f"sd_cam{s}_{i}"},
                "anns": [ann_toks[i]]})
            T["sample_annotation"].append({
                "token": ann_toks[i], "sample_token": tok,
                "instance_token": inst_tok,
                "translation": [car_x, 2.0, 1.0],
                "size": [1.9, 4.5, 1.7],  # wlh
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "num_lidar_pts": 8, "num_radar_pts": 0,
                "prev": ann_toks[i - 1] if i > 0 else "",
                "next": ann_toks[i + 1] if i < 2 else ""})
            prev_kf_sd = kf_sd_tok

    for name, rows in T.items():
        (vdir / f"{name}.json").write_text(json.dumps(rows))
    (vdir / "log.json").write_text(json.dumps(
        [{"token": "log0", "location": "test"}]))
    return tmp_path


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    return make_nuscenes_root(tmp_path_factory.mktemp("nusc"))


def test_create_infos_geometry(nusc_root):
    from tsm_det_pointcloud_tpu.datasets.nuscenes.nuscenes_dataset import (
        create_nuscenes_info,
    )
    create_nuscenes_info("v1.0-mini", nusc_root, nusc_root, max_sweeps=3)
    vdir = nusc_root / "v1.0-mini"
    with open(vdir / "nuscenes_infos_3sweeps_train.pkl", "rb") as f:
        train = pickle.load(f)
    with open(vdir / "nuscenes_infos_3sweeps_val.pkl", "rb") as f:
        val = pickle.load(f)
    # scene-0061 -> mini_train, scene-0103 -> mini_val (built-in split)
    assert len(train) == 3 and len(val) == 3

    info = train[1]  # keyframe i=1 (has a real sweep)
    # gt box in ref-sensor frame: car at global (car_x, 2, 1), ego at
    # (ego_x, 0, 0), lidar at z=1.8 -> (car_x - ego_x, 2, -0.8)
    ego_x, car_x = EGO_SPEED * 0.5, 15.0 + CAR_SPEED * 0.5
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [car_x - ego_x, 2.0, -0.8],
                               atol=1e-6)
    np.testing.assert_allclose(box[3:6], [4.5, 1.9, 1.7], atol=1e-6)  # lwh
    assert abs(box[6]) < 1e-6  # yaw
    np.testing.assert_allclose(box[7:9], [CAR_SPEED, 0.0], atol=1e-6)
    assert info["gt_names"][0] == "car"

    # sweep transform: the static landmark at global (20, 0, 2) must land
    # at ref-sensor coords (20 - ego_x, 0, 0.2) after transform_matrix
    real = [s for s in info["sweeps"] if s["transform_matrix"] is not None]
    assert real
    sw = real[0]
    pts = np.fromfile(str(nusc_root / "v1.0-mini" / sw["lidar_path"]),
                      np.float32).reshape(-1, 5)[:, :3].astype(np.float64)
    hom = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    mapped = (sw["transform_matrix"] @ hom.T).T[:, :3]
    np.testing.assert_allclose(mapped[0], [20.0 - ego_x, 0.0, 0.2],
                               atol=1e-5)
    assert 0.05 < sw["time_lag"] < 0.15


def test_dataset_load_sweeps_cbgs_and_gtdb(nusc_root):
    from tsm_det_pointcloud_tpu.datasets.nuscenes.nuscenes_dataset import (
        NuScenesDataset,
    )
    from tsm_det_pointcloud_tpu.utils.common_utils import create_logger

    cfg = EDict({
        "DATASET": "NuScenesDataset",
        "DATA_PATH": str(nusc_root),
        "VERSION": "v1.0-mini",
        "MAX_SWEEPS": 3,
        "BALANCED_RESAMPLING": True,
        "SET_NAN_VELOCITY_TO_ZEROS": True,
        "PRED_VELOCITY": False,
        "FILTER_MIN_POINTS_IN_GT": 1,
        "INFO_PATH": {"train": ["nuscenes_infos_3sweeps_train.pkl"],
                      "test": ["nuscenes_infos_3sweeps_val.pkl"]},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "sample_points", "NUM_POINTS": {"train": 128,
                                                     "test": 128}},
        ],
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ds = NuScenesDataset(cfg, ["car"], training=True,
                         root_path=None, logger=create_logger())
    assert len(ds) >= 3
    item = ds[1]
    assert item["points"].shape == (128, 5)  # x y z intensity time
    # PRED_VELOCITY=False drops vx,vy -> 7 box dims + class
    assert item["gt_boxes"].shape[-1] == 8
    assert np.isfinite(item["gt_boxes"]).all()
    # time channel: keyframe points 0, sweep points ~0.1
    tvals = np.unique(np.round(item["points"][:, 4], 2))
    assert 0.0 in tvals

    ds.create_groundtruth_database(used_classes=["car"], max_sweeps=3)
    with open(nusc_root / "v1.0-mini" /
              "nuscenes_dbinfos_3sweeps_withvelo.pkl", "rb") as f:
        db = pickle.load(f)
    assert "car" in db and len(db["car"]) >= 3
    assert all(d["num_points_in_gt"] >= 1 for d in db["car"])


def test_trainval_requires_split_data(tmp_path):
    from tsm_det_pointcloud_tpu.datasets.nuscenes.nuscenes_tables import (
        NuScenesTables,
    )
    root = make_nuscenes_root(tmp_path, version="v1.0-trainval")
    tables = NuScenesTables(root / "v1.0-trainval", "v1.0-trainval")
    with pytest.raises(RuntimeError, match="splits"):
        tables.split_scene_tokens()
    (root / "v1.0-trainval" / "v1.0-trainval" / "splits.json").write_text(
        json.dumps({"train": ["scene-0061"], "val": ["scene-0103"]}))
    toks = tables.split_scene_tokens()
    assert len(toks["train"]) == 1 and len(toks["val"]) == 1


def test_nuscenes_evaluation_nds_roundtrip(nusc_root):
    """GT fed back as predictions through the loader's OFFICIAL NDS
    evaluation: every matched box has zero TP error, so NDS ~= 1 up to
    the protocol's AP integration bounds."""
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.datasets.nuscenes.nuscenes_dataset import (
        NuScenesDataset, create_nuscenes_info,
    )
    from tsm_det_pointcloud_tpu.utils.common_utils import create_logger

    if not (nusc_root / "v1.0-mini"
            / "nuscenes_infos_3sweeps_val.pkl").exists():
        create_nuscenes_info("v1.0-mini", nusc_root, nusc_root, max_sweeps=3)
    cfg = EDict({
        "DATASET": "NuScenesDataset",
        "DATA_PATH": str(nusc_root),
        "VERSION": "v1.0-mini",
        "MAX_SWEEPS": 1,
        "INFO_PATH": {"train": ["nuscenes_infos_3sweeps_train.pkl"],
                      "test": ["nuscenes_infos_3sweeps_val.pkl"]},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        },
        "DATA_PROCESSOR": [],
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ev = NuScenesDataset(cfg, ["car"], training=False, root_path=None,
                         logger=create_logger())
    dets = []
    for i in range(len(ev.infos)):
        g = np.asarray(ev.infos[i]["gt_boxes"])
        dets += ev.generate_prediction_dicts(
            {"frame_id": ["f%d" % i], "batch_size": 1,
             "metadata": [ev.infos[i].get("token")]},
            [{"pred_boxes": jnp.asarray(g[:, :7]),
              "pred_scores": jnp.ones((len(g),)),
              "pred_labels": jnp.ones((len(g),), jnp.int32),
              "count": jnp.asarray(len(g))}], ["car"])
    s, d = ev.evaluation(dets, ["car"])
    # perfect boxes, no velocity/attribute predictions: mAP=1, mATE/mASE/
    # mAOE=0, mAVE/mAAE capped at 1 -> NDS = (5*1 + 3*1)/10 = 0.8 exactly
    # (the official detection-score formula)
    assert d["mAP"] > 0.999 and abs(d["NDS"] - 0.8) < 1e-3, s
    assert d["mATE"] < 1e-6 and d["mAOE"] < 1e-6, s
    # and the non-official branch stays loudly labeled
    s2, _ = ev.evaluation(dets, ["car"], eval_metric="waymo")
    assert "NON-OFFICIAL" in s2
