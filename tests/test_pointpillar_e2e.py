"""End-to-end smoke of the PointPillars slice on synthetic data:
config -> model build -> init -> train forward (loss + grads) -> eval forward
-> on-device post-processing. Tiny grid to keep CPU compile fast."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta



pytestmark = pytest.mark.slow
def tiny_model_cfg():
    return EDict(
        {
            "NAME": "PointPillar",
            "VFE": {
                "NAME": "PillarVFE", "WITH_DISTANCE": False,
                "USE_ABSLOTE_XYZ": True, "USE_NORM": True, "NUM_FILTERS": [16],
            },
            "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
            "BACKBONE_2D": {
                "NAME": "BaseBEVBackbone",
                "LAYER_NUMS": [1, 1], "LAYER_STRIDES": [2, 2],
                "NUM_FILTERS": [16, 32], "UPSAMPLE_STRIDES": [1, 2],
                "NUM_UPSAMPLE_FILTERS": [16, 16],
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
                        "align_center": False, "feature_map_stride": 2,
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
                    "NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 128,
                    "NMS_POST_MAXSIZE": 16,
                },
            },
        }
    )


META = DatasetMeta(
    class_names=("Car",),
    point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 4.0),
    grid_size=(32, 32, 1),
    max_voxels=256,
    max_points_per_voxel=8,
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
        gt[b, 1] = [4, 3, -1, 3.9, 1.6, 1.56, -0.5, 1]
        gt_mask[b, :2] = True
        # cluster points inside the boxes so the model has signal
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
    model = build_network(tiny_model_cfg(), num_class=1, dataset=META)
    batch = synthetic_batch()
    variables = model.init(
        jax.random.PRNGKey(0), batch, training=False
    )
    return model, variables


def test_forward_eval_shapes(model_and_vars):
    model, variables = model_and_vars
    batch = synthetic_batch()
    out = model.apply(variables, batch, training=False)
    assert out["batch_cls_preds"].shape[0] == 2
    assert out["batch_box_preds"].shape[-1] == 7
    assert out["batch_cls_preds"].shape[1] == out["batch_box_preds"].shape[1]
    # anchors: 16x16 map x 2 rot x 1 class
    assert out["batch_box_preds"].shape[1] == 16 * 16 * 2


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
    # some gradient is nonzero
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_post_processing(model_and_vars):
    model, variables = model_and_vars
    batch = synthetic_batch()
    out = model.apply(variables, batch, training=False)
    pred, recall = model.apply(
        variables, out, method=lambda m, bd: m.post_processing(bd)
    )
    assert pred["pred_boxes"].shape == (2, 16, 7)
    assert pred["pred_scores"].shape == (2, 16)
    assert pred["pred_labels"].shape == (2, 16)
    assert int(pred["count"][0]) <= 16
    assert "rcnn_0.5" in recall and float(recall["gt"]) == 4.0


def test_training_step_reduces_loss(model_and_vars):
    """A few SGD steps on one batch should reduce the loss (sanity that
    gradients point the right way through the whole stack)."""
    import optax

    model, variables = model_and_vars
    batch = synthetic_batch()
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, **other}, dict(batch), training=True,
                mutable=["batch_stats"],
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
