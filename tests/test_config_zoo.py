"""Every shipped YAML must parse through the config system and build through
the model registry (catches registry-name / cfg-schema drift; the per-family
e2e tests cover forward/loss at reduced scale)."""
from pathlib import Path

import numpy as np
import pytest

from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
    DatasetMeta,
)
from tsm_det_pointcloud_tpu.utils.edict import EDict

ROOT = Path(__file__).resolve().parent.parent
CFGS = sorted(
    list((ROOT / "tools/cfgs/kitti_models").glob("*.yaml"))
    + list((ROOT / "tools/cfgs/waymo_models").glob("*.yaml"))
)


def _meta_from(cfg):
    pcr = np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float64)
    voxel_size, max_voxels, max_ppv = (0.05, 0.05, 0.1), 16000, 5
    for proc in cfg.DATA_CONFIG.get("DATA_PROCESSOR", []):
        if proc.NAME == "transform_points_to_voxels":
            voxel_size = tuple(proc.VOXEL_SIZE)
            max_voxels = proc.MAX_NUMBER_OF_VOXELS["train"]
            max_ppv = proc.MAX_POINTS_PER_VOXEL
        elif proc.NAME in ("repository_info", "calculate_grid_size"):
            voxel_size = tuple(proc.VOXEL_SIZE)
    grid = np.round((pcr[3:6] - pcr[0:3]) / np.asarray(voxel_size)).astype(int)
    return DatasetMeta(
        class_names=tuple(cfg.CLASS_NAMES),
        point_cloud_range=tuple(pcr),
        voxel_size=voxel_size,
        grid_size=tuple(int(g) for g in grid),
        max_voxels=int(max_voxels), max_points_per_voxel=int(max_ppv),
        num_point_features=4,
        max_points=int(cfg.DATA_CONFIG.get("MAX_POINTS", 16384)),
    )


@pytest.mark.parametrize("path", CFGS, ids=[p.stem for p in CFGS])
def test_config_builds(path):
    cfg = EDict({"ROOT_DIR": ROOT, "LOCAL_RANK": 0})
    cfg_from_yaml_file(str(path), cfg)
    model = build_network(
        model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
        dataset=_meta_from(cfg),
    )
    assert model is not None
    assert model.model_cfg["NAME"] == cfg.MODEL.NAME
