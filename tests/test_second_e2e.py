"""End-to-end smoke of the SECOND slice (MeanVFE -> VoxelBackBone8x sparse
stem -> HeightCompression -> BEV backbone -> anchor head) on synthetic data.
Small grid but the real 8x-stride topology (z depth 40 so conv_out's (3,1,1)
stride-2 kernel has room, matching the KITTI sparse_shape contract)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta



pytestmark = pytest.mark.slow
def second_model_cfg():
    return EDict(
        {
            "NAME": "SECONDNet",
            "VFE": {"NAME": "MeanVFE"},
            "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
            "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
            "BACKBONE_2D": {
                "NAME": "BaseBEVBackbone",
                "LAYER_NUMS": [1, 1], "LAYER_STRIDES": [1, 2],
                "NUM_FILTERS": [32, 64], "UPSAMPLE_STRIDES": [1, 2],
                "NUM_UPSAMPLE_FILTERS": [32, 32],
            },
            "DENSE_HEAD": {
                "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
                "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
                "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
                "ANCHOR_GENERATOR_CONFIG": [
                    {
                        "class_name": "Car",
                        "anchor_sizes": [[3.9, 1.6, 1.56]],
                        "anchor_rotations": [0, 1.57],
                        "anchor_bottom_heights": [-1.78],
                        "align_center": False, "feature_map_stride": 8,
                        "matched_threshold": 0.6, "unmatched_threshold": 0.45,
                    },
                ],
                "TARGET_ASSIGNER_CONFIG": {"MATCH_HEIGHT": False},
                "LOSS_CONFIG": {
                    "LOSS_WEIGHTS": {
                        "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                        "code_weights": [1.0] * 7,
                    }
                },
            },
            "POST_PROCESSING": {
                "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                "SCORE_THRESH": 0.1, "EVAL_METRIC": "kitti",
                "NMS_CONFIG": {
                    "MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                    "NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 64,
                    "NMS_POST_MAXSIZE": 8,
                },
            },
        }
    )


META = DatasetMeta(
    class_names=("Car",),
    point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 0.1),
    grid_size=(32, 32, 40),
    max_voxels=512,
    max_points_per_voxel=5,
    num_point_features=4,
    max_points=512,
)


def synthetic_batch(batch_size=2, n=512, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((batch_size, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (batch_size, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (batch_size, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (batch_size, n))
    pts[..., 3] = rng.uniform(0, 1, (batch_size, n))
    gt = np.zeros((batch_size, 5, 8), np.float32)
    gt_mask = np.zeros((batch_size, 5), bool)
    for b in range(batch_size):
        gt[b, 0] = [8, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
        gt_mask[b, :1] = True
        pts[b, :50, 0] = rng.uniform(6.5, 9.5, 50)
        pts[b, :50, 1] = rng.uniform(-0.7, 0.7, 50)
        pts[b, :50, 2] = rng.uniform(-1.7, -0.3, 50)
    return {
        "points": jnp.array(pts),
        "points_mask": jnp.ones((batch_size, n), bool),
        "gt_boxes": jnp.array(gt),
        "gt_boxes_mask": jnp.array(gt_mask),
        "batch_size": batch_size,
    }


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_network(second_model_cfg(), num_class=1, dataset=META)
    batch = synthetic_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    return model, variables


def test_forward_eval_shapes(model_and_vars):
    model, variables = model_and_vars
    batch = synthetic_batch()
    out = model.apply(variables, batch, training=False)
    # encoded tensor densified: z collapsed 2 * 128 = 256 BEV channels at /8
    assert out["spatial_features"].shape == (2, 4, 4, 256)
    assert out["batch_box_preds"].shape[1] == 4 * 4 * 2  # 2 rotations
    assert np.isfinite(np.asarray(out["batch_cls_preds"])).all()
    # multi-scale pyramid present with the right strides
    ms = out["multi_scale_3d_features"]
    assert set(ms) == {"x_conv1", "x_conv2", "x_conv3", "x_conv4"}
    assert ms["x_conv4"].features.shape[-1] == 64
    assert out["multi_scale_3d_strides"]["x_conv4"] == 8


def test_train_loss_and_grads(model_and_vars):
    model, variables = model_and_vars
    batch = synthetic_batch()
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other}, batch, training=True,
            mutable=["batch_stats"],
        )
        return out["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_post_processing(model_and_vars):
    model, variables = model_and_vars
    batch = synthetic_batch()
    out = model.apply(variables, batch, training=False)
    pred, recall = model.apply(
        variables, out, method=lambda m, bd: m.post_processing(bd)
    )
    assert pred["pred_boxes"].shape == (2, 8, 7)
    assert int(pred["count"][0]) <= 8
    assert float(recall["gt"]) == 2.0
