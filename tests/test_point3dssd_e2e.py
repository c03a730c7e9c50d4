"""End-to-end TSM flagship slice: VoxelPointNet2FSMSG(Distillation) backbone
+ PointHeadVoteSASAStatistic(Distillation) head through Point3DSSD, tiny
shapes on CPU. Covers: teacher forward+loss, distillation student path,
statistics accumulation, and on-device multi-thresh post-processing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta


pytestmark = pytest.mark.slow
PCR = [0.0, -8.0, -2.0, 16.0, 8.0, 2.0]
VOXEL = [0.25, 0.25, 0.25]


def sa_cfg(n0=64, n1=16, agg1=48):
    return {
        "NPOINT_LIST": [[n0], [n1]],
        "SAMPLE_RANGE_LIST": [[[0, 256]], [[0, n0]]],
        "SAMPLE_METHOD_LIST": [["d-fps"], ["s-fps"]],
        "QUERY_RANGE": [
            [[0, 0, 0], [0, 0, 0]],
            [[2, 2, 2], [4, 4, 4]],
        ],
        "STRIDE": [[[0, 0, 0], [0, 0, 0]], [[1, 1, 1], [1, 1, 1]]],
        "RADIUS": [[0.5, 1.0], [1.0, 3.0]],
        "NSAMPLE": [[8, 8], [8, 8]],
        "MLPS": [[[8, 16], [8, 16]], [[16, 24], [16, 24]]],
        "SPCONV_MLPS_PRE": [[0, 0, 32], [agg1]],
        "AGGREGATION_MLPS": [[32], [agg1]],
        "CONFIDENCE_MLPS": [[16], [16]],
        "WEIGHT_GAMMA": 1.0,
        "DILATED_RADIUS_GROUP": True,
    }


def head_cfg():
    vsa = {
        "DILATED_RADIUS_GROUP": False,
        "QUERY_RANGE": [[2, 2, 2], [4, 4, 4]],
        "SPARSE_TENSOR_STRIDE": 4,
        "STRIDE": [[1, 1, 1], [1, 1, 1]],
        "RADIUS": [1.0, 3.0],
        "NSAMPLE": [8, 8],
        "MLPS": [[16, 24], [16, 24]],
    }
    return {
        "NAME": "PointHeadVoteSASAStatisticDistillation",
        "CLASS_AGNOSTIC": False,
        "USE_BN": True,
        "SAMPLE_RANGE": [0, 16],
        "VOTE_CONFIG": {"VOTE_FC": [16], "MAX_TRANSLATION_RANGE": [3.0, 3.0, 2.0]},
        "VOXEL_CONFIG": {"POINT_CLOUD_RANGE": PCR, "VOXEL_SIZE": VOXEL},
        "VSA_CONFIG": vsa,
        "S_VOTE_CONFIG": {"VOTE_FC": [16], "MAX_TRANSLATION_RANGE": [3.0, 3.0, 2.0]},
        "S_VSA_CONFIG": vsa,
        # teacher statistics require SHARED_FC[-1] == teacher backbone dim
        "SHARED_FC": [48, 48],
        "DP_RATIO": -0.3,
        "CLS_FC": [16],
        "REG_FC": [16],
        "TARGET_CONFIG": {
            "VOTE_EXTRA_WIDTH": [0.1, 0.1, 0.1],
            "ASSIGN_METHOD": "mask",
            "GT_CENTRAL_RADIUS": 10.0,
            "BOX_CODER": "PointBinResidualCoder",
            "BOX_CODER_CONFIG": {"use_mean_size": False, "angle_bin_num": 12},
        },
        "LOSS_CONFIG": {
            "LOSS_CLS": "WeightedBinaryCrossEntropyWithCenterness",
            "LOSS_REG": "WeightedSmoothL1Loss",
            "LOSS_SASA_CONFIG": {
                "func": "Focal", "set_ignore_flag": True,
                "extra_width": [1.0, 1.0, 1.0],
                "layer_weights": [0.1, 0.1, 0.1], "num_class": 3,
            },
            "AXIS_ALIGNED_IOU_LOSS_REGULARIZATION": False,
            "CORNER_LOSS_REGULARIZATION": True,
            "RDIOU_REGRESS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {
                "vote_reg_weight": 1.0, "point_cls_weight": 1.0,
                "point_offset_reg_weight": 0.1, "point_angle_cls_weight": 0.1,
                "point_angle_reg_weight": 0.1, "point_similarity_weight": 0.1,
                "point_iou_weight": 1.0, "point_corner_weight": 1.0,
            },
        },
    }


def model_cfg(distill=True):
    cfg = {
        "NAME": "3DSSD",
        "FACTOR": 4,
        "BACKBONE_3D": {
            "NAME": (
                "VoxelPointNet2FSMSGDistillation" if distill
                else "VoxelPointNet2FSMSG"
            ),
            "FACTOR": 4,
            "VOXEL_CONFIG": {"POINT_CLOUD_RANGE": PCR, "VOXEL_SIZE": VOXEL},
            "SA_CONFIG": sa_cfg(),
            "S_SA_CONFIG": sa_cfg(agg1=24),
        },
        "POINT_HEAD": head_cfg(),
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
            "SCORE_THRESH": [0.62, 0.3, 0.3],
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {
                "MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 16,
                "NMS_POST_MAXSIZE": 8,
            },
        },
    }
    if not distill:
        cfg["POINT_HEAD"]["NAME"] = "PointHeadVoteSASAStatistic"
    return EDict(cfg)


META = DatasetMeta(
    class_names=("Car", "Pedestrian", "Cyclist"),
    point_cloud_range=tuple(PCR),
    voxel_size=tuple(VOXEL),
    grid_size=(64, 64, 16),
    max_voxels=256, max_points_per_voxel=5,
    num_point_features=4, max_points=256,
)


def batch(b=2, n=256, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-1.5, 1.5, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    gt = np.zeros((b, 4, 8), np.float32)
    gt_mask = np.zeros((b, 4), bool)
    for i in range(b):
        gt[i, 0] = [8, 0, -0.5, 3.9, 1.6, 1.56, 0.3, 1]
        gt[i, 1] = [4, 3, -0.5, 0.8, 0.6, 1.7, -0.5, 2]
        gt_mask[i, :2] = True
        pts[i, :40, 0] = rng.uniform(6.5, 9.5, 40)
        pts[i, :40, 1] = rng.uniform(-0.7, 0.7, 40)
        pts[i, :40, 2] = rng.uniform(-1.2, 0.2, 40)
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_boxes_mask": jnp.asarray(gt_mask),
        "batch_size": b,
    }


@pytest.fixture(scope="module")
def teacher_model():
    model = build_network(model_cfg(distill=False), num_class=3, dataset=META)
    bd = batch()
    variables = model.init(
        jax.random.PRNGKey(0), dict(bd), training=True,
    )
    return model, variables


def test_teacher_train_loss_and_stats(teacher_model):
    model, variables = teacher_model
    bd = batch()
    out, mut = model.apply(
        variables, dict(bd), training=True,
        mutable=["batch_stats", "statistics"],
    )
    assert np.isfinite(float(out["loss"]))
    assert "vote_loss" in out["tb_dict"] and "sasa_loss" in out["tb_dict"]
    # statistics buffers update when confident points exist (may be zero
    # at init since focal bias puts scores at 0.01 < 0.3 - check shape only)
    stats = jax.tree_util.tree_leaves(mut["statistics"])
    assert all(np.isfinite(np.asarray(s)).all() for s in stats)


def test_teacher_eval_and_post(teacher_model):
    model, variables = teacher_model
    bd = batch()
    out = model.apply(variables, dict(bd), training=False)
    assert out["batch_cls_preds"].shape == (2, 16, 3)
    assert out["batch_box_preds"].shape == (2, 16, 7)
    pred, recall = model.apply(
        variables, out, method=lambda m, b_: m.post_processing(b_)
    )
    assert pred["pred_boxes"].shape == (2, 8, 7)
    assert float(recall["gt"]) == 4.0


def test_teacher_grads_flow(teacher_model):
    model, variables = teacher_model
    bd = batch()
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, **other}, dict(bd), training=True,
            mutable=["batch_stats", "statistics"],
        )
        return o["loss"]

    loss, g = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_distillation_student_only_grads():
    model = build_network(model_cfg(distill=True), num_class=3, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(1), dict(bd), training=True)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, **other}, dict(bd), training=True,
            mutable=["batch_stats", "statistics"],
        )
        return o["loss"]

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # teacher params (sa0/sa1/head) zero-grad; student (s_sa1/s_head) non-zero
    zero, nonzero = [], []
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        segs = [getattr(p, "key", "") for p in path]
        is_student = any(str(s).startswith("s_") for s in segs)
        mx = float(jnp.abs(leaf).max())
        (nonzero if is_student else zero).append((segs, mx))
    assert all(v == 0.0 for _, v in zero), max(zero, key=lambda t: t[1])
    assert any(v > 0 for _, v in nonzero)

    # eval path: student-only predictions present
    out = model.apply(variables, dict(bd), training=False)
    assert out["batch_cls_preds"].shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
