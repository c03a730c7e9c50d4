"""PV-RCNN end-to-end slice: sparse backbone + anchor RPN + VSA keypoints +
PointHeadSimple + RoI grid pooling second stage."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta



pytestmark = pytest.mark.slow
def model_cfg():
    return EDict({
        "NAME": "PVRCNN",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
        "PFE": {
            "NAME": "VoxelSetAbstraction",
            "POINT_SOURCE": "raw_points",
            "NUM_KEYPOINTS": 64,
            "NUM_OUTPUT_FEATURES": 32,
            "FEATURES_SOURCE": ["bev", "x_conv3", "x_conv4", "raw_points"],
            "SA_LAYER": {
                "raw_points": {"MLPS": [[8, 8], [8, 8]],
                               "POOL_RADIUS": [0.4, 0.8], "NSAMPLE": [8, 8]},
                "x_conv3": {"MLPS": [[8, 8], [8, 8]],
                            "POOL_RADIUS": [1.2, 2.4], "NSAMPLE": [8, 8]},
                "x_conv4": {"MLPS": [[8, 8], [8, 8]],
                            "POOL_RADIUS": [2.4, 4.8], "NSAMPLE": [8, 8]},
            },
        },
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
            "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1],
            "NUM_UPSAMPLE_FILTERS": [32],
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
            "NAME": "PointHeadSimple",
            "CLS_FC": [16],
            "USE_POINT_FEATURES_BEFORE_FUSION": True,
            "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0}},
        },
        "ROI_HEAD": {
            "NAME": "PVRCNNHead",
            "SHARED_FC": [32, 32],
            "CLS_FC": [16], "REG_FC": [16],
            "NMS_CONFIG": {
                "TRAIN": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.8,
                          "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32},
                "TEST": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                         "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16},
            },
            "ROI_GRID_POOL": {
                "GRID_SIZE": 3,
                "MLPS": [[8, 8], [8, 8]],
                "POOL_RADIUS": [0.8, 1.6], "NSAMPLE": [8, 8],
            },
            "TARGET_CONFIG": {
                "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
                "REG_FG_THRESH": 0.55, "CLS_FG_THRESH": 0.75,
                "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            },
            "LOSS_CONFIG": {
                "CORNER_LOSS_REGULARIZATION": True,
                "LOSS_WEIGHTS": {
                    "rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                    "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7,
                },
            },
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
            "SCORE_THRESH": 0.1, "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 16,
                           "NMS_POST_MAXSIZE": 8},
        },
    })


META = DatasetMeta(
    class_names=("Car",),
    point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 0.1),
    grid_size=(32, 32, 40),
    max_voxels=512, max_points_per_voxel=5,
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


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_network(model_cfg(), num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    return model, variables


def test_train_loss_all_stages(model_and_vars):
    model, variables = model_and_vars
    bd = batch()
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    tb = out["tb_dict"]
    assert "rpn_loss_cls" in tb and "point_loss" in tb and "rcnn_cls_loss" in tb


def test_grads_flow_all_stages(model_and_vars):
    model, variables = model_and_vars
    bd = batch()
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        o, _ = model.apply({"params": p, **other}, dict(bd), training=True,
                           mutable=["batch_stats"])
        return o["loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_eval_second_stage_and_post(model_and_vars):
    model, variables = model_and_vars
    bd = batch()
    out = model.apply(variables, dict(bd), training=False)
    # refined rois: (B, 16 test rois, 7); cls (B, 16, 1)
    assert out["batch_box_preds"].shape == (2, 16, 7)
    assert out["batch_cls_preds"].shape == (2, 16, 1)
    assert out["roi_labels"].shape == (2, 16)
    pred, recall = model.apply(
        variables, out, method=lambda m, b_: m.post_processing(b_)
    )
    assert pred["pred_boxes"].shape == (2, 8, 7)
    assert float(recall["gt"]) == 2.0


def test_pvrcnn_plusplus_vectorpool():
    """PV-RCNN++ variant: sectorized keypoints + VectorPool aggregation."""
    cfg = model_cfg()
    cfg["NAME"] = "PVRCNNPlusPlus"
    cfg["PFE"]["SAMPLE_METHOD"] = "SPC"
    cfg["PFE"]["SPC_SAMPLING"] = {"NUM_SECTORS": 4}
    cfg["PFE"]["SA_LAYER"]["raw_points"] = {
        "NAME": "VectorPoolAggregationModuleMSG",
        "POOL_RADIUS": [0.4, 0.8], "NSAMPLE": [8, 8],
        "LOCAL_GRIDS": [[2, 2, 2], [2, 2, 2]],
        "MLPS": [[8], [8]],
        "AGGREGATION_MLPS": [16],
    }
    model = build_network(cfg, num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    ev = model.apply(variables, dict(bd), training=False)
    assert np.isfinite(np.asarray(ev["batch_box_preds"])).all()


def test_sectorized_fps_covers_sectors():
    from tsm_det_pointcloud_tpu.models.backbones_3d.pfe.vector_pool import (
        sectorized_fps,
    )
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-10, 10, (2, 128, 3)).astype(np.float32))
    valid = jnp.ones((2, 128), bool)
    idx = sectorized_fps(xyz, valid, 16, num_sectors=4)
    assert idx.shape == (2, 16)
    # sampled points span multiple azimuth sectors
    pts = np.take_along_axis(np.asarray(xyz), np.asarray(idx)[..., None], 1)
    ang = np.arctan2(pts[..., 1], pts[..., 0])
    sec = np.floor((ang + np.pi) / (np.pi / 2)).astype(int) % 4
    assert len(np.unique(sec[0])) >= 3
