"""Experimental TSM-project variants: VoxelPointCross neck, BEV/point
hybrid 2D backbones, SPVFE, PVSSDA detector path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)

META = DatasetMeta(
    class_names=("Car",), point_cloud_range=PCR,
    voxel_size=(0.5, 0.5, 4.0), grid_size=(32, 32, 1),
    max_voxels=256, max_points_per_voxel=8,
    num_point_features=4, max_points=256,
)


def batch(b=2, n=256, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    gt = np.zeros((b, 2, 8), np.float32)
    gv = np.zeros((b, 2), bool)
    gt[:, 0] = [8, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gv[:, 0] = True
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_boxes_mask": jnp.asarray(gv),
        "batch_size": b,
    }


def head_cfg(stride=2):
    return {
        "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": False, "NUM_DIR_BINS": 2,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0,
        "ANCHOR_GENERATOR_CONFIG": [{
            "class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
            "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
            "align_center": False, "feature_map_stride": stride,
            "matched_threshold": 0.6, "unmatched_threshold": 0.45,
        }],
        "TARGET_ASSIGNER_CONFIG": {"MATCH_HEIGHT": False},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7}},
    }


POST = {
    "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
    "EVAL_METRIC": "kitti",
    "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                   "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 32,
                   "NMS_POST_MAXSIZE": 8},
}

PN2 = {
    "NAME": "PointNet2MSG",
    "SA_CONFIG": {
        "NPOINTS": [64], "RADIUS": [[0.5, 1.0]], "NSAMPLE": [[8, 8]],
        "MLPS": [[[8, 8], [8, 8]]],
    },
    "FP_MLPS": [[16]],
}


def test_voxel_point_cross_neck():
    cfg = EDict({
        "NAME": "PVSSDA",
        "VFE": {"NAME": "PillarVFE", "WITH_DISTANCE": False,
                "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
                "NUM_FILTERS": [16]},
        "BACKBONE_3D": PN2,
        "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [2], "NUM_FILTERS": [16],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16],
        },
        "NECK": {"NAME": "VoxelPointCross", "NUM_FILTERS": 16},
        "DENSE_HEAD": head_cfg(stride=2),
        "POST_PROCESSING": POST,
    })
    model = build_network(cfg, num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert out["point_features"].shape[-1] == 16  # fused by the neck


def test_spvfe_and_bevpoint():
    cfg = EDict({
        "NAME": "DSASNet",
        "VFE": {"NAME": "SPVFE", "NUM_FILTERS": [16]},
        "BACKBONE_3D": PN2,
        "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
        "BACKBONE_2D": {
            "NAME": "BEVPoint",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [2], "NUM_FILTERS": [16],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16],
        },
        "DENSE_HEAD": head_cfg(stride=2),
        "POST_PROCESSING": POST,
    })
    model = build_network(cfg, num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    # the point branch consumed the BEV map
    assert out["point_features"].shape == (2, 256, 16)


def test_pvssda_point_head_path():
    cfg = EDict({
        "NAME": "PVSSDA",
        "BACKBONE_3D": PN2,
        "POINT_HEAD": {
            "NAME": "PVSSDAHead",
            "CLS_FC": [16], "REG_FC": [16],
            "CLASS_AGNOSTIC": False,
            "TARGET_CONFIG": {
                "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                "BOX_CODER": "PointResidualCoder",
                "BOX_CODER_CONFIG": {"use_mean_size": False},
            },
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "point_cls_weight": 1.0, "point_box_weight": 1.0}},
        },
        "POST_PROCESSING": POST,
    })
    model = build_network(cfg, num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    pred, _ = model.apply(
        variables, model.apply(variables, dict(bd), training=False),
        method=lambda m, b_: m.post_processing(b_),
    )
    assert np.isfinite(np.asarray(pred["pred_boxes"])).all()
