"""PointRCNN (PointNet2MSG + PointHeadBox + roipoint pooling) and
VoxelRCNN (sparse backbone + anchor RPN + voxel grid pooling) + UNetV2
end-to-end slices."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta


pytestmark = pytest.mark.slow
PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)


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


ROI_COMMON = {
    "NMS_CONFIG": {
        "TRAIN": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.8,
                  "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
        "TEST": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                 "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 8},
    },
    "TARGET_CONFIG": {
        "ROI_PER_IMAGE": 8, "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55,
        "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
    },
    "LOSS_CONFIG": {
        "CORNER_LOSS_REGULARIZATION": True,
        "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                         "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7},
    },
}

POST = {
    "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
    "EVAL_METRIC": "kitti",
    "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                   "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 16,
                   "NMS_POST_MAXSIZE": 8},
}


def pointrcnn_cfg():
    return EDict({
        "NAME": "PointRCNN",
        "BACKBONE_3D": {
            "NAME": "PointNet2MSG",
            "SA_CONFIG": {
                "NPOINTS": [64, 16],
                "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
                "NSAMPLE": [[8, 8], [8, 8]],
                "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
            },
            "FP_MLPS": [[16], [16]],
        },
        "POINT_HEAD": {
            "NAME": "PointHeadBox",
            "CLS_FC": [16], "REG_FC": [16],
            "CLASS_AGNOSTIC": False,
            "USE_POINT_FEATURES_BEFORE_FUSION": False,
            "TARGET_CONFIG": {
                "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                "BOX_CODER": "PointResidualCoder",
                "BOX_CODER_CONFIG": {
                    "use_mean_size": True,
                    "mean_size": [[3.9, 1.6, 1.56]],
                },
            },
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "point_cls_weight": 1.0, "point_box_weight": 1.0}},
        },
        "ROI_HEAD": {
            "NAME": "PointRCNNHead",
            "ROI_POINT_POOL": {"NUM_SAMPLED_POINTS": 32,
                               "DEPTH_NORMALIZER": 70.0},
            "XYZ_UP_LAYER": [16, 16],
            "SHARED_FC": [32], "CLS_FC": [16], "REG_FC": [16],
            **ROI_COMMON,
        },
        "POST_PROCESSING": POST,
    })


def voxelrcnn_cfg():
    return EDict({
        "NAME": "VoxelRCNN",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
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
        "ROI_HEAD": {
            "NAME": "VoxelRCNNHead",
            "ROI_GRID_POOL": {
                "GRID_SIZE": 3,
                "POOL_LAYERS": {
                    "x_conv3": {"MLPS": [[8, 8]], "POOL_RADIUS": [1.2],
                                "NSAMPLE": [8], "QUERY_RANGES": [[2, 2, 2]]},
                    "x_conv4": {"MLPS": [[8, 8]], "POOL_RADIUS": [2.4],
                                "NSAMPLE": [8], "QUERY_RANGES": [[2, 2, 2]]},
                },
            },
            "SHARED_FC": [32], "CLS_FC": [16], "REG_FC": [16],
            **ROI_COMMON,
        },
        "POST_PROCESSING": POST,
    })


META_VOXEL = DatasetMeta(
    class_names=("Car",), point_cloud_range=PCR,
    voxel_size=(0.5, 0.5, 0.1), grid_size=(32, 32, 40),
    max_voxels=512, max_points_per_voxel=5,
    num_point_features=4, max_points=256,
)

META_POINT = DatasetMeta(
    class_names=("Car",), point_cloud_range=PCR,
    voxel_size=(0.5, 0.5, 0.1), grid_size=(32, 32, 40),
    max_voxels=256, max_points_per_voxel=5,
    num_point_features=4, max_points=256,
)


def _train_and_eval(model, bd):
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
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

    ev = model.apply(variables, dict(bd), training=False)
    pred, recall = model.apply(
        variables, ev, method=lambda m, b_: m.post_processing(b_)
    )
    assert np.isfinite(np.asarray(pred["pred_boxes"])).all()
    return out, pred


def test_pointrcnn_e2e():
    model = build_network(pointrcnn_cfg(), num_class=1, dataset=META_POINT)
    out, pred = _train_and_eval(model, batch())
    assert "rcnn_cls_loss" in out["tb_dict"]
    assert "point_loss" in out["tb_dict"]


def test_voxelrcnn_e2e():
    model = build_network(voxelrcnn_cfg(), num_class=1, dataset=META_VOXEL)
    out, pred = _train_and_eval(model, batch())
    assert "rcnn_cls_loss" in out["tb_dict"]
    assert "rpn_loss_cls" in out["tb_dict"]


def test_unetv2_backbone():
    from tsm_det_pointcloud_tpu.models.backbones_3d.spconv_unet import UNetV2
    from tsm_det_pointcloud_tpu.models.backbones_3d.vfe import MeanVFE

    bd = batch()
    vfe = MeanVFE(
        model_cfg={}, num_point_features=4, voxel_size=(0.5, 0.5, 0.1),
        point_cloud_range=PCR, max_voxels=256, max_points_per_voxel=5,
    )
    bd = vfe.apply({}, bd)
    m = UNetV2(model_cfg=EDict({}), input_channels=4, meta=META_VOXEL)
    vars_ = m.init(jax.random.PRNGKey(0), dict(bd), training=False)
    out = m.apply(vars_, dict(bd), training=False)
    assert out["point_features"].shape == (2, 256, 16)
    assert out["encoded_spconv_tensor"].shape[0] == 2
    assert np.isfinite(np.asarray(out["point_features"])).all()


def test_secondnet_iou_e2e():
    cfg = voxelrcnn_cfg()
    cfg["NAME"] = "SECONDNetIoU"
    cfg["ROI_HEAD"] = EDict({
        "NAME": "SECONDHead",
        "ROI_GRID_POOL": {"GRID_SIZE": 3},
        "SHARED_FC": [32], "IOU_FC": [16],
        "IOU_WEIGHT": 0.5,
        "NMS_CONFIG": ROI_COMMON["NMS_CONFIG"],
        "TARGET_CONFIG": ROI_COMMON["TARGET_CONFIG"],
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0}},
    })
    model = build_network(cfg, num_class=1, dataset=META_VOXEL)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert "rcnn_iou_loss" in out["tb_dict"]
    ev = model.apply(variables, dict(bd), training=False)
    # rectified scores are sigmoid-free probabilities in [0, 1]
    assert float(ev["batch_cls_preds"].min()) >= 0.0
    assert float(ev["batch_cls_preds"].max()) <= 1.0
    pred, _ = model.apply(variables, ev,
                          method=lambda m, b_: m.post_processing(b_))
    assert np.isfinite(np.asarray(pred["pred_boxes"])).all()


def test_pointrcnn_roi_sa_stack_e2e():
    """SA_CONFIG in-RoI encoder path (npoints .. -1 GroupAll terminal)."""
    cfg = pointrcnn_cfg()
    cfg["ROI_HEAD"]["SA_CONFIG"] = EDict({
        "NPOINTS": [16, -1],
        "RADIUS": [0.4, 100],
        "NSAMPLE": [8, 8],
        "MLPS": [[16, 16], [16, 32]],
    })
    model = build_network(cfg, num_class=1, dataset=META_POINT)
    out, pred = _train_and_eval(model, batch())
    assert "rcnn_cls_loss" in out["tb_dict"]
