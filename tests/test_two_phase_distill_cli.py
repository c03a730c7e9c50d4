"""The reference's two-phase TSM recipe through the real CLIs:
phase 1 trains the teacher (PointHeadVoteSASAStatistic, statistics
accumulating), phase 2 trains the distilled student from
--pretrained_model with every non-s_* parameter frozen. Asserts the
teacher subtree is bit-identical between the teacher checkpoint and the
post-training distillation checkpoint (loaded + frozen), while student
parameters moved."""
import pytest
import sys
from pathlib import Path

import numpy as np
import yaml

from tests.test_kitti_pipeline import dataset_cfg, make_kitti_root


pytestmark = pytest.mark.slow
REPO = Path(__file__).resolve().parent.parent

PCR = [0.0, -20.0, -3.0, 64.0, 20.0, 2.0]
VOXEL = [0.25, 0.25, 0.25]


def _sa_cfg(agg1=48):
    return {
        "NPOINT_LIST": [[64], [16]],
        "SAMPLE_RANGE_LIST": [[[0, 256]], [[0, 64]]],
        "SAMPLE_METHOD_LIST": [["d-fps"], ["s-fps"]],
        "QUERY_RANGE": [[[0, 0, 0], [0, 0, 0]], [[2, 2, 2], [4, 4, 4]]],
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


def _head_cfg(distill):
    vsa = {
        "DILATED_RADIUS_GROUP": False,
        "QUERY_RANGE": [[2, 2, 2], [4, 4, 4]],
        "SPARSE_TENSOR_STRIDE": 4,
        "STRIDE": [[1, 1, 1], [1, 1, 1]],
        "RADIUS": [1.0, 3.0],
        "NSAMPLE": [8, 8],
        "MLPS": [[16, 24], [16, 24]],
    }
    cfg = {
        "NAME": ("PointHeadVoteSASAStatisticDistillation" if distill
                 else "PointHeadVoteSASAStatistic"),
        "CLASS_AGNOSTIC": False,
        "USE_BN": True,
        "SAMPLE_RANGE": [0, 16],
        "VOTE_CONFIG": {"VOTE_FC": [16],
                        "MAX_TRANSLATION_RANGE": [3.0, 3.0, 2.0]},
        "VOXEL_CONFIG": {"POINT_CLOUD_RANGE": PCR, "VOXEL_SIZE": VOXEL},
        "VSA_CONFIG": vsa,
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
                "layer_weights": [0.1, 0.1], "num_class": 1,
            },
            "AXIS_ALIGNED_IOU_LOSS_REGULARIZATION": False,
            "CORNER_LOSS_REGULARIZATION": True,
            "RDIOU_REGRESS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {
                "vote_reg_weight": 1.0, "point_cls_weight": 1.0,
                "point_offset_reg_weight": 0.1,
                "point_angle_cls_weight": 0.1,
                "point_angle_reg_weight": 0.1,
                "point_similarity_weight": 0.1,
                "point_iou_weight": 1.0, "point_corner_weight": 1.0,
            },
        },
    }
    if distill:
        cfg["S_VOTE_CONFIG"] = {"VOTE_FC": [16],
                                "MAX_TRANSLATION_RANGE": [3.0, 3.0, 2.0]}
        cfg["S_VSA_CONFIG"] = vsa
    return cfg


def _model_cfg(distill):
    cfg = {
        "NAME": "3DSSD",
        "FACTOR": 4,
        "BACKBONE_3D": {
            "NAME": ("VoxelPointNet2FSMSGDistillation" if distill
                     else "VoxelPointNet2FSMSG"),
            "FACTOR": 4,
            "VOXEL_CONFIG": {"POINT_CLOUD_RANGE": PCR, "VOXEL_SIZE": VOXEL},
            "SA_CONFIG": _sa_cfg(),
        },
        "POINT_HEAD": _head_cfg(distill),
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
            "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 16,
                           "NMS_POST_MAXSIZE": 8},
        },
    }
    if distill:
        cfg["BACKBONE_3D"]["S_SA_CONFIG"] = _sa_cfg(agg1=24)
    return cfg


def _plain(obj):
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def _write_cfg(tmp_path, root, distill):
    dc = _plain(dataset_cfg(root))
    dc["POINT_CLOUD_RANGE"] = list(PCR)
    dc["MAX_POINTS"] = 256
    dc["DATA_PROCESSOR"] = [
        {"NAME": "mask_points_and_boxes_outside_range",
         "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 256, "test": 256}},
        {"NAME": "repository_info", "VOXEL_SIZE": list(VOXEL), "FACTOR": 4},
    ]
    dc["DATA_AUGMENTOR"] = {"DISABLE_AUG_LIST": ["placeholder"],
                            "AUG_CONFIG_LIST": []}
    doc = {
        "CLASS_NAMES": ["Car"],
        "DATA_CONFIG": dc,
        "MODEL": _model_cfg(distill),
        "OPTIMIZATION": {
            "BATCH_SIZE_PER_GPU": 2, "NUM_EPOCHS": 1,
            "OPTIMIZER": "adam_onecycle", "LR": 0.003,
            "WEIGHT_DECAY": 0.01, "MOMS": [0.95, 0.85], "PCT_START": 0.4,
            "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10,
        },
    }
    p = tmp_path / ("distill.yaml" if distill else "teacher.yaml")
    p.write_text(yaml.safe_dump(doc, sort_keys=False))
    return p


def _run_train(monkeypatch, cfg_path, extra):
    sys.path.insert(0, str(REPO / "tools"))
    import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--cfg_file", str(cfg_path), "--epochs", "1",
        "--workers", "0", "--extra_tag", cfg_path.stem,
    ] + extra)
    train_cli.main()


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_two_phase_teacher_then_distill(tmp_path, monkeypatch):
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        latest_checkpoint, restore_checkpoint,
    )

    root, _ids = make_kitti_root(tmp_path, n_frames=3)
    from tsm_det_pointcloud_tpu.datasets.kitti.kitti_dataset import (
        create_kitti_infos,
    )

    create_kitti_infos(dataset_cfg(root), ["Car"], root, root, workers=1)
    out_base = REPO / "output"

    teacher_cfg = _write_cfg(tmp_path, root, distill=False)
    _run_train(monkeypatch, teacher_cfg, [])
    t_dir = out_base / "tmp" / teacher_cfg.stem / teacher_cfg.stem / "ckpt"
    # EXP_GROUP_PATH comes from the cfg path; search instead of guessing
    t_ckpts = sorted(out_base.rglob("checkpoint_epoch_1"))
    t_ckpts = [p for p in t_ckpts if teacher_cfg.stem in str(p)]
    assert t_ckpts, "teacher run produced no checkpoint"
    teacher_ckpt = str(t_ckpts[-1])
    t_state = restore_checkpoint(teacher_ckpt)
    assert "statistics" in t_state and t_state["statistics"]

    distill_cfg = _write_cfg(tmp_path, root, distill=True)
    _run_train(monkeypatch, distill_cfg,
               ["--pretrained_model", teacher_ckpt])
    d_ckpts = [p for p in sorted(out_base.rglob("checkpoint_epoch_1"))
               if distill_cfg.stem in str(p)]
    assert d_ckpts, "distill run produced no checkpoint"
    d_state = restore_checkpoint(str(d_ckpts[-1]))

    t_params = _flat(t_state["params"])
    d_params = _flat(d_state["params"])
    shared = [k for k in t_params if k in d_params]
    assert shared, "no teacher paths transferred into the distill model"
    # teacher subtree: loaded from the teacher ckpt AND frozen through the
    # student epoch -> bit-identical
    for k in shared:
        np.testing.assert_array_equal(
            t_params[k], d_params[k],
            err_msg=f"teacher param {'/'.join(k)} changed during distill",
        )
    # student params exist and were NOT copied from the teacher
    student = [k for k in d_params
               if any(seg.startswith(("s_", "S_")) for seg in k)]
    assert student, "no student (s_*) parameters in the distill model"

    # the statistic buffers must ARRIVE in the distill state despite the
    # different nesting (teacher: .../head/object_*; distill: .../object_*)
    # — a structural copy silently leaves them at re-init zeros
    t_stats = {k[-1]: v for k, v in _flat(t_state["statistics"]).items()}
    d_stats = {k[-1]: v for k, v in _flat(d_state["statistics"]).items()}
    for name in ("object_statistic_features", "object_momentum",
                 "object_mean"):
        assert name in t_stats and name in d_stats, name
        np.testing.assert_array_equal(
            t_stats[name], d_stats[name],
            err_msg=f"statistics buffer {name} not transferred",
        )

    import shutil
    for stem in (teacher_cfg.stem, distill_cfg.stem):
        for p in out_base.rglob(stem):
            if p.is_dir():
                shutil.rmtree(p, ignore_errors=True)
