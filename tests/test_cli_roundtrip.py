"""tools/train.py -> tools/test.py round trip on synthetic KITTI data with
a mini PointPillars config (in-process, CPU)."""
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_kitti_pipeline import dataset_cfg, make_kitti_root


pytestmark = pytest.mark.slow
REPO = Path(__file__).resolve().parent.parent

MINI_MODEL = """
MODEL:
    NAME: PointPillar
    VFE:
        NAME: PillarVFE
        WITH_DISTANCE: False
        USE_ABSLOTE_XYZ: True
        USE_NORM: True
        NUM_FILTERS: [16]
    MAP_TO_BEV:
        NAME: PointPillarScatter
        NUM_BEV_FEATURES: 16
    BACKBONE_2D:
        NAME: BaseBEVBackbone
        LAYER_NUMS: [1]
        LAYER_STRIDES: [2]
        NUM_FILTERS: [16]
        UPSAMPLE_STRIDES: [1]
        NUM_UPSAMPLE_FILTERS: [16]
    DENSE_HEAD:
        NAME: AnchorHeadSingle
        CLASS_AGNOSTIC: False
        USE_DIRECTION_CLASSIFIER: False
        NUM_DIR_BINS: 2
        DIR_OFFSET: 0.78539
        DIR_LIMIT_OFFSET: 0.0
        ANCHOR_GENERATOR_CONFIG: [
            {class_name: Car, anchor_sizes: [[3.9, 1.6, 1.56]],
             anchor_rotations: [0, 1.57], anchor_bottom_heights: [-1.78],
             align_center: False, feature_map_stride: 2,
             matched_threshold: 0.6, unmatched_threshold: 0.45}
        ]
        TARGET_ASSIGNER_CONFIG: {MATCH_HEIGHT: False}
        LOSS_CONFIG:
            LOSS_WEIGHTS: {cls_weight: 1.0, loc_weight: 2.0,
                           dir_weight: 0.2,
                           code_weights: [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]}
    POST_PROCESSING:
        RECALL_THRESH_LIST: [0.3, 0.5, 0.7]
        SCORE_THRESH: 0.1
        EVAL_METRIC: kitti
        NMS_CONFIG: {MULTI_CLASSES_NMS: False, NMS_TYPE: nms_gpu,
                     NMS_THRESH: 0.1, NMS_PRE_MAXSIZE: 128,
                     NMS_POST_MAXSIZE: 16}
OPTIMIZATION:
    BATCH_SIZE_PER_GPU: 2
    NUM_EPOCHS: 1
    OPTIMIZER: adam_onecycle
    LR: 0.003
    WEIGHT_DECAY: 0.01
    MOMS: [0.95, 0.85]
    PCT_START: 0.4
    DIV_FACTOR: 10
    GRAD_NORM_CLIP: 10
"""


def _plain(obj):
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def write_mini_cfg(tmp_path, root):
    import yaml

    data_cfg = _plain(dataset_cfg(root))
    # small synthetic pillar grid: 0.5m pillars over the KITTI-ish range
    data_cfg["POINT_CLOUD_RANGE"] = [0, -16, -3, 32, 16, 1]
    data_cfg["DATA_PROCESSOR"] = [
        {"NAME": "mask_points_and_boxes_outside_range",
         "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 512, "test": 512}},
        {"NAME": "transform_points_to_voxels",
         "VOXEL_SIZE": [0.5, 0.5, 4.0],
         "MAX_POINTS_PER_VOXEL": 8,
         "MAX_NUMBER_OF_VOXELS": {"train": 256, "test": 256}},
    ]
    cfg_path = tmp_path / "mini_pointpillar.yaml"
    text = (
        "CLASS_NAMES: ['Car']\n"
        + yaml.safe_dump({"DATA_CONFIG": data_cfg}, sort_keys=False)
        + MINI_MODEL
    )
    cfg_path.write_text(text)
    return cfg_path


def test_train_then_test_cli(tmp_path, monkeypatch):
    root, ids = make_kitti_root(tmp_path, n_frames=4)
    from tsm_det_pointcloud_tpu.datasets.kitti.kitti_dataset import (
        create_kitti_infos,
    )

    cfg_for_infos = dataset_cfg(root)
    create_kitti_infos(cfg_for_infos, ["Car"], root, root, workers=1)
    cfg_path = write_mini_cfg(tmp_path, root)

    sys.path.insert(0, str(REPO / "tools"))
    import train as train_cli
    import test as test_cli

    monkeypatch.setattr(
        sys, "argv",
        ["train.py", "--cfg_file", str(cfg_path), "--epochs", "1",
         "--extra_tag", "cli_roundtrip_test", "--workers", "0"],
    )
    train_cli.main()

    exp_group = "/".join(str(cfg_path).split("/")[1:-1])
    out_dir = REPO / "output" / exp_group / "mini_pointpillar" / "cli_roundtrip_test"
    ckpts = list((out_dir / "ckpt").glob("checkpoint_epoch_*"))
    assert ckpts, "train.py produced no checkpoint"

    monkeypatch.setattr(
        sys, "argv",
        ["test.py", "--cfg_file", str(cfg_path),
         "--extra_tag", "cli_roundtrip_test", "--workers", "0"],
    )
    test_cli.main()
    result_pkl = list(out_dir.glob("eval/*/result.pkl"))
    assert result_pkl, "test.py produced no result.pkl"
