"""CenterPoint end-to-end slice: MeanVFE -> VoxelBackBone8x ->
HeightCompression -> BEV backbone -> CenterHead, gaussian targets, focal +
gathered-L1 losses, heatmap decode + circle NMS."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta
from tsm_det_pointcloud_tpu.models.model_utils import centernet_utils



pytestmark = pytest.mark.slow
def model_cfg():
    return EDict({
        "NAME": "CenterPoint",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
            "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1],
            "NUM_UPSAMPLE_FILTERS": [32],
        },
        "DENSE_HEAD": {
            "NAME": "CenterHead",
            "CLASS_NAMES_EACH_HEAD": [["Car", "Pedestrian"]],
            "SHARED_CONV_CHANNEL": 32,
            "NUM_HM_CONV": 2,
            "SEPARATE_HEAD_CFG": {
                "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                "HEAD_DICT": {
                    "center": {"out_channels": 2, "num_conv": 2},
                    "center_z": {"out_channels": 1, "num_conv": 2},
                    "dim": {"out_channels": 3, "num_conv": 2},
                    "rot": {"out_channels": 2, "num_conv": 2},
                },
            },
            "TARGET_ASSIGNER_CONFIG": {
                "FEATURE_MAP_STRIDE": 8, "NUM_MAX_OBJS": 100,
                "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2,
            },
            "LOSS_CONFIG": {
                "LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                 "code_weights": [1.0] * 8},
            },
            "POST_PROCESSING": {"MAX_OBJ_PER_SAMPLE": 32},
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
            "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {"NMS_TYPE": "circle_nms", "MIN_RADIUS": 1.0,
                           "NMS_POST_MAXSIZE": 16},
        },
    })


META = DatasetMeta(
    class_names=("Car", "Pedestrian"),
    point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 0.1),
    grid_size=(32, 32, 40),
    max_voxels=512, max_points_per_voxel=5,
    num_point_features=4, max_points=512,
)


def batch(b=2, n=512, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    gt = np.zeros((b, 4, 8), np.float32)
    gv = np.zeros((b, 4), bool)
    for i in range(b):
        gt[i, 0] = [8, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
        gt[i, 1] = [4, 3, -1, 0.8, 0.6, 1.7, -0.5, 2]
        gv[i, :2] = True
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_boxes_mask": jnp.asarray(gv),
        "batch_size": b,
    }


def test_gaussian_targets():
    boxes = jnp.asarray([[8.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0, 1.0]])
    t = centernet_utils.assign_center_targets(
        boxes, jnp.ones(1, bool), jnp.asarray([1]), 1,
        (0.0, -8.0, -3.0, 16.0, 8.0, 1.0), (0.5, 0.5, 0.1), 1, (32, 32),
    )
    hm = np.asarray(t["heatmap"][0])
    # peak at the box center pixel: cx=(8-0)/0.5=16, cy=(0+8)/0.5=16
    assert hm[16, 16] == hm.max() > 0.99
    assert int(t["inds"][0]) == 16 * 32 + 16
    np.testing.assert_allclose(
        np.asarray(t["box_targets"][0, 3:6]), np.log([4.0, 2.0, 1.5]),
        atol=1e-5,
    )


def test_circle_nms():
    centers = jnp.asarray([[0.0, 0.0], [0.5, 0.0], [5.0, 5.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    pos, cnt, ksc = centernet_utils.circle_nms(
        centers, scores, jnp.ones(3, bool), min_radius=1.0, post_max_size=3
    )
    assert int(cnt) == 2
    assert set(np.asarray(pos[:2]).tolist()) == {0, 2}


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_network(model_cfg(), num_class=2, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=False)
    return model, variables


def test_train_loss(model_and_vars):
    model, variables = model_and_vars
    bd = batch()
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert "hm_loss_0" in out["tb_dict"]

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


def test_eval_decode_and_post(model_and_vars):
    model, variables = model_and_vars
    bd = batch()
    out = model.apply(variables, dict(bd), training=False)
    assert out["final_boxes"].shape == (2, 32, 7)
    pred, recall = model.apply(
        variables, out, method=lambda m, b_: m.post_processing(b_)
    )
    assert pred["pred_boxes"].shape == (2, 16, 7)
    assert int(pred["count"].max()) <= 16
    assert float(recall["gt"]) == 4.0
