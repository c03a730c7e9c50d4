"""Waymo eval protocol tests (numpy implementation) + dataset plumbing."""
import pickle

import numpy as np
import pytest

from tsm_det_pointcloud_tpu.eval.waymo_eval import (
    _heading_accuracy,
    iou3d_np,
    waymo_evaluation,
)


def boxes(n, seed=0, spread=40.0):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(-spread, spread, n)
    b[:, 1] = rng.uniform(-spread, spread, n)
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3:6] = rng.uniform(1.5, 5, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def _anno(b, names, scores=None, npts=None):
    a = {"name": np.asarray(names, object), "boxes_lidar": b,
         "gt_boxes_lidar": b}
    if scores is not None:
        a["score"] = np.asarray(scores)
    if npts is not None:
        a["num_points_in_gt"] = np.asarray(npts)
    return a


def test_iou3d_np_identity():
    b = boxes(5, seed=1)
    np.testing.assert_allclose(np.diag(iou3d_np(b, b)), 1.0, atol=1e-5)


def test_heading_accuracy_wrap():
    assert _heading_accuracy(0.0, 0.0) == 1.0
    np.testing.assert_allclose(_heading_accuracy(0.0, np.pi), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        _heading_accuracy(-np.pi + 0.1, np.pi - 0.1), 1 - 0.2 / np.pi,
        atol=1e-6,
    )


def test_perfect_detection_ap_100():
    gt_annos, dt_annos = [], []
    for f in range(5):
        b = boxes(6, seed=f)
        gt_annos.append(_anno(b, ["Vehicle"] * 6, npts=[50] * 6))
        dt_annos.append(_anno(b, ["Vehicle"] * 6,
                              scores=np.linspace(0.9, 0.5, 6)))
    _, res = waymo_evaluation(gt_annos, dt_annos, ("Vehicle",))
    assert res["Vehicle/AP_L1"] > 99.9
    assert res["Vehicle/APH_L1"] > 99.9
    assert res["Vehicle/AP_L2"] > 99.9


def test_heading_error_hits_aph_not_ap():
    gt_annos, dt_annos = [], []
    for f in range(5):
        b = boxes(6, seed=f)
        d = b.copy()
        d[:, 6] += np.pi  # flipped heading: same IoU, ha = 0
        gt_annos.append(_anno(b, ["Vehicle"] * 6, npts=[50] * 6))
        dt_annos.append(_anno(d, ["Vehicle"] * 6,
                              scores=np.linspace(0.9, 0.5, 6)))
    _, res = waymo_evaluation(gt_annos, dt_annos, ("Vehicle",))
    assert res["Vehicle/AP_L1"] > 99.9  # pi flip leaves the box identical
    assert res["Vehicle/APH_L1"] < 1.0  # but heading accuracy is zero


def test_level2_gts_ignored_in_l1():
    b = boxes(4, seed=3)
    gt = _anno(b, ["Vehicle"] * 4, npts=[50, 50, 2, 2])  # 2 are LEVEL_2
    dt = _anno(b[:2], ["Vehicle"] * 2, scores=[0.9, 0.8])
    _, res = waymo_evaluation([gt], [dt], ("Vehicle",))
    assert res["Vehicle/AP_L1"] > 99.9   # both L1 gts found
    assert res["Vehicle/AP_L2"] < 60     # half the full gt set found


def test_waymo_dataset_plumbing(tmp_path):
    """End-to-end loader on a synthetic preprocessed layout."""
    from tsm_det_pointcloud_tpu.datasets.waymo.waymo_dataset import WaymoDataset
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    seq = "segment-000"
    seq_dir = tmp_path / "waymo_processed_data" / seq
    seq_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(3):
        pts = np.zeros((200, 6), np.float32)
        pts[:, 0] = rng.uniform(0, 60, 200)
        pts[:, 1] = rng.uniform(-30, 30, 200)
        pts[:, 2] = rng.uniform(-1, 3, 200)
        pts[:, 3] = rng.uniform(0, 20, 200)
        pts[:, 5] = -1  # all in no-label-zone=-1 (kept)
        np.save(seq_dir / ("%04d.npy" % i), pts)
        infos.append({
            "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
            "frame_id": f"{seq}_{i}",
            "annos": {
                "name": np.asarray(["Vehicle"], object),
                "gt_boxes_lidar": np.asarray(
                    [[10.0, 0, 1, 4.5, 2.0, 1.8, 0.2]], np.float32
                ),
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
        "POINT_CLOUD_RANGE": [0, -40, -2, 70.4, 40, 4],
        "MAX_POINTS": 256,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "sample_points", "NUM_POINTS": {"train": 256, "test": 256}},
        ],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ds = WaymoDataset(cfg, class_names=["Vehicle"], training=True,
                      root_path=tmp_path)
    assert len(ds) == 3
    item = ds[0]
    assert item["points"].shape[1] == 4
    assert item["gt_boxes"].shape[-1] == 8

    # prediction dicts + waymo metric end to end
    batch = {"frame_id": np.asarray([f"{seq}_0"])}
    pred = [{
        "pred_boxes": infos[0]["annos"]["gt_boxes_lidar"],
        "pred_scores": np.asarray([0.9]),
        "pred_labels": np.asarray([1]),
    }]
    det = ds.generate_prediction_dicts(batch, pred, ["Vehicle"])
    # evaluate against frame-0 only
    ds.infos = ds.infos[:1]
    result_str, res = ds.evaluation(det, ["Vehicle"])
    assert res["Vehicle/AP_L1"] > 99.9


def test_multiframe_sweeps(tmp_path):
    """-4..0 sweep accumulation with pose alignment + time-lag channel."""
    from tsm_det_pointcloud_tpu.datasets.waymo.waymo_dataset import WaymoDataset
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    seq = "segment-001"
    seq_dir = tmp_path / "waymo_processed_data" / seq
    seq_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    infos = []
    n_frames = 5
    for i in range(n_frames):
        pts = np.zeros((100, 6), np.float32)
        pts[:, 0] = rng.uniform(5, 50, 100)
        pts[:, 1] = rng.uniform(-20, 20, 100)
        pts[:, 2] = rng.uniform(-1, 3, 100)
        pts[:, 5] = -1
        np.save(seq_dir / ("%04d.npy" % i), pts)
        pose = np.eye(4)
        pose[0, 3] = 2.0 * i  # ego moves +x 2m per frame
        infos.append({
            "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
            "frame_id": f"{seq}_{i}",
            "pose": pose,
            "sequence_len": n_frames,
            "annos": {
                "name": np.asarray(["Vehicle"], object),
                "gt_boxes_lidar": np.asarray(
                    [[10.0, 0, 1, 4.5, 2.0, 1.8, 0.2]], np.float32
                ),
                "num_points_in_gt": np.asarray([30]),
                "difficulty": np.asarray([0]),
            },
        })
    import pickle as pkl
    with open(seq_dir / f"{seq}.pkl", "wb") as f:
        pkl.dump(infos, f)
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text(seq + "\n")

    cfg = EDict({
        "DATASET": "WaymoDataset",
        "DATA_SPLIT": {"train": "train", "test": "train"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "SEQUENCE_CONFIG": {"ENABLED": True, "SAMPLE_OFFSET": [-4, 0]},
        "POINT_CLOUD_RANGE": [-80, -80, -5, 80, 80, 5],
        "MAX_POINTS": 600,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation",
                                 "timestamp"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "sample_points",
             "NUM_POINTS": {"train": 600, "test": 600}},
        ],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ds = WaymoDataset(cfg, class_names=["Vehicle"], training=True,
                      root_path=tmp_path)
    item = ds[4]  # last frame: 5 sweeps available
    assert item["points"].shape == (600, 5)
    # time-lag channel spans 0 .. 0.4
    lags = np.unique(np.round(item["points"][:, 4], 2))
    assert 0.0 in lags and lags.max() >= 0.3
    # frame 0 has only itself
    item0 = ds[0]
    assert np.allclose(item0["points"][:, 4].max(), 0.0)
