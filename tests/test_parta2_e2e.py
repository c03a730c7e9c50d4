"""Part-A2 end-to-end slice: UNetV2 -> anchor RPN + intra-part head ->
RoI-aware pooled second stage."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta
from tsm_det_pointcloud_tpu.models.roi_heads.partA2_head import roiaware_pool


pytestmark = pytest.mark.slow
PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)


def model_cfg():
    return EDict({
        "NAME": "PartA2Net",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "UNetV2"},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32],
        },
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
            "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
            "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False, "feature_map_stride": 8,
                "matched_threshold": 0.6, "unmatched_threshold": 0.45,
            }],
            "TARGET_ASSIGNER_CONFIG": {"MATCH_HEIGHT": False},
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7}},
        },
        "POINT_HEAD": {
            "NAME": "PointIntraPartOffsetHead",
            "CLS_FC": [16], "PART_FC": [16],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "point_cls_weight": 1.0, "point_part_weight": 1.0}},
        },
        "ROI_HEAD": {
            "NAME": "PartA2FCHead",
            "ROI_AWARE_POOL": {"POOL_SIZE": 4},
            "SHARED_FC": [32], "CLS_FC": [16], "REG_FC": [16],
            "NMS_CONFIG": {
                "TRAIN": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.8,
                          "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
                "TEST": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                         "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 8},
            },
            "TARGET_CONFIG": {
                "ROI_PER_IMAGE": 8, "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55,
                "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25,
                "CLS_BG_THRESH_LO": 0.1,
            },
            "LOSS_CONFIG": {
                "CORNER_LOSS_REGULARIZATION": True,
                "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0,
                                 "rcnn_reg_weight": 1.0,
                                 "rcnn_corner_weight": 1.0,
                                 "code_weights": [1.0] * 7},
            },
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 16,
                           "NMS_POST_MAXSIZE": 8},
        },
    })


META = DatasetMeta(
    class_names=("Car",), point_cloud_range=PCR,
    voxel_size=(0.5, 0.5, 0.1), grid_size=(32, 32, 40),
    max_voxels=256, max_points_per_voxel=5,
    num_point_features=4, max_points=256,
)


def batch(b=2, n=256, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    gt = np.zeros((b, 3, 8), np.float32)
    gv = np.zeros((b, 3), bool)
    for i in range(b):
        gt[i, 0] = [8, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
        gv[i, 0] = True
        pts[i, :50, 0] = rng.uniform(6.5, 9.5, 50)
        pts[i, :50, 1] = rng.uniform(-0.7, 0.7, 50)
        pts[i, :50, 2] = rng.uniform(-1.7, -0.3, 50)
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_boxes_mask": jnp.asarray(gv),
        "batch_size": b,
    }


def test_roiaware_pool_places_points():
    pts = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    feats = jnp.asarray([[1.0], [2.0]])
    rois = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0]])
    out = roiaware_pool(pts, feats, jnp.ones(2, bool), rois, 2, pool="max")
    # point at +x lands in the high-x cells, -x in low-x cells
    grid = np.asarray(out).reshape(2, 2, 2)
    assert grid[1].max() == 1.0
    assert grid[0].max() == 2.0


def test_parta2_train_eval():
    model = build_network(model_cfg(), num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert "point_loss" in out["tb_dict"] and "rcnn_cls_loss" in out["tb_dict"]

    ev = model.apply(variables, dict(bd), training=False)
    pred, recall = model.apply(
        variables, ev, method=lambda m, b_: m.post_processing(b_)
    )
    assert np.isfinite(np.asarray(pred["pred_boxes"])).all()
    assert float(recall["gt"]) == 2.0
