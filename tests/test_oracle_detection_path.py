"""Oracle certification of the deployed detection path (VERDICT r2 #1a).

Injects GT-derived predictions (encode with the deployed
PointBinResidualCoder, logits +8 at in-box votes) and runs the UNMODIFIED
deployed chain — coder.decode -> Detector3DTemplate.post_processing
(multi_thresh NMS, shipped SCORE_THRESH) -> camera annos -> the full
official KITTI protocol. AP must be ~100 independent of any training:
this pins decode/NMS/AP plumbing as correct (reference chain:
pcdet detector3d_template.py:207-349 -> model_nms_utils.py:52-87 ->
kitti_object_eval_python/eval.py).

Also documents the official protocol's small-sample property: AP_R40
fills at most one of 41 threshold slots per TP at recall spacing
1/num_gt, so perfect detections of < ~160 GT score well below 100.
"""
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.sanity_overfit import (  # noqa: E402
    cam_anno,
    lidar_boxes_to_cam,
    make_batch,
    sample_boxes,
    shrink_cfg,
)
from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file  # noqa: E402
from tsm_det_pointcloud_tpu.eval.kitti_eval import (  # noqa: E402
    get_official_eval_result,
)
from tsm_det_pointcloud_tpu.utils.edict import EDict  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_perfect_detections_score_100_with_enough_gt():
    """dt == gt with distinct scores -> AP 100 (R11 and R40) once num_gt
    saturates the protocol's 41 threshold slots."""
    rng = np.random.default_rng(0)
    gt_annos, dt_annos = [], []
    for _ in range(40):  # 200 GT
        cam = lidar_boxes_to_cam(sample_boxes(rng))
        gt_annos.append(cam_anno(cam, ["Car"] * 5))
        dt_annos.append(cam_anno(cam, ["Car"] * 5,
                                 scores=rng.uniform(0.9, 1.0, 5)))
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert float(ret["Car_3d/moderate_R40"]) == pytest.approx(100.0, abs=0.5)
    assert float(ret["Car_3d/moderate"]) == pytest.approx(100.0, abs=0.5)


def test_small_sample_protocol_property():
    """With only 20 GT, even perfect detections cap at ~19/40 AP_R40 —
    the reference protocol's documented small-sample behavior (so low
    val AP on tiny synthetic sets is NOT evidence of an eval bug)."""
    rng = np.random.default_rng(0)
    gt_annos, dt_annos = [], []
    for _ in range(4):  # 20 GT
        cam = lidar_boxes_to_cam(sample_boxes(rng))
        gt_annos.append(cam_anno(cam, ["Car"] * 5))
        dt_annos.append(cam_anno(cam, ["Car"] * 5,
                                 scores=rng.uniform(0.9, 1.0, 5)))
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert 40.0 <= float(ret["Car_3d/moderate_R40"]) <= 50.0


@pytest.mark.slow
def test_oracle_pure_detection_path_ap_100():
    """Full plumbing oracle at small scale: injected GT predictions at
    positions covering every GT must come out of the deployed
    decode+NMS+eval chain at AP ~100."""
    import jax.numpy as jnp

    from tools.oracle_eval import run_oracle
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )

    N = 8192
    meta = DatasetMeta(
        class_names=("Car", "Pedestrian", "Cyclist"),
        point_cloud_range=(0, -40, -3, 70.4, 40, 1),
        voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
        max_voxels=16000, max_points_per_voxel=5,
        num_point_features=4, max_points=N,
    )
    cfg = cfg_from_yaml_file(
        str(ROOT / "tools/cfgs/kitti_models/fast_cpc.yaml"),
        EDict({"ROOT_DIR": ROOT, "LOCAL_RANK": 0}),
    )
    shrink_cfg(cfg, N)

    rng = np.random.default_rng(1234)
    gt_annos, dt_annos = [], []
    for _ in range(5):  # 40 scenes, 200 GT
        batch, gt_np = make_batch(rng, 8, N, jnp)
        ev = {"points": batch["points"], "points_mask": batch["points_mask"],
              "batch_size": 8}
        pred, recall, aux, _ = run_oracle(cfg, meta, ev, gt_np, mode="pure")
        assert aux["covered"] == aux["gt_total"]  # full coverage by design
        for i in range(8):
            gt_annos.append(cam_anno(
                lidar_boxes_to_cam(gt_np[i, :5, :7]), ["Car"] * 5))
            k = int(pred["count"][i])
            dt_annos.append(cam_anno(
                lidar_boxes_to_cam(pred["pred_boxes"][i, :k])
                if k else np.zeros((0, 7)),
                ["Car"] * k, scores=pred["pred_scores"][i, :k]))
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert float(ret["Car_3d/moderate_R40"]) >= 99.0
    assert float(ret["Car_bev/moderate_R40"]) >= 99.0
