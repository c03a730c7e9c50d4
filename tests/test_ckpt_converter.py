"""torch->orbax converter rule tests (synthetic state_dict; no real .pth)."""
import pytest
import numpy as np
import torch

import sys
from pathlib import Path


pytestmark = pytest.mark.slow
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_torch_ckpt import convert_state_dict, convert_weight, graft_into_tree


def test_weight_layout_rules():
    # Linear
    w = np.zeros((8, 4))
    assert convert_weight("x.weight", w).shape == (4, 8)
    # Conv1d 1x1
    w = np.zeros((8, 4, 1))
    assert convert_weight("x.weight", w).shape == (4, 8)
    # Conv2d 1x1
    w = np.zeros((8, 4, 1, 1))
    assert convert_weight("x.weight", w).shape == (4, 8)
    # Conv2d 3x3 -> HWIO
    w = np.zeros((8, 4, 3, 3))
    assert convert_weight("x.weight", w).shape == (3, 3, 4, 8)
    # spconv native (Cout, k, k, k, Cin) -> (K, Cin, Cout)
    w = np.zeros((8, 3, 3, 3, 4))
    assert convert_weight("x.weight", w).shape == (27, 4, 8)
    # spconv implicit-gemm (k, k, k, Cin, Cout) -> (K, Cin, Cout)
    w = np.zeros((3, 3, 3, 4, 8))
    assert convert_weight("x.weight", w).shape == (27, 4, 8)


def test_convert_state_dict_collections():
    sd = {
        "backbone_3d.SA_modules.0.point_mlps.0.0.weight":
            torch.zeros(16, 7, 1, 1),
        "backbone_3d.SA_modules.0.point_mlps.0.1.bn.weight": torch.ones(16),
        "backbone_3d.SA_modules.0.point_mlps.0.1.bn.running_mean":
            torch.zeros(16),
        "point_head.object_statistic_features": torch.zeros(3, 256),
        "point_head.cls_block.0.3.bias": torch.zeros(1),
    }
    out, unmatched = convert_state_dict(sd)
    assert not unmatched
    assert out["params"][
        "backbone_3d/SA_modules/0/point_mlps/0/0/kernel"
    ].shape == (7, 16)
    assert "backbone_3d/SA_modules/0/point_mlps/0/1/bn/scale" in out["params"]
    assert (
        "backbone_3d/SA_modules/0/point_mlps/0/1/bn/mean"
        in out["batch_stats"]
    )
    assert "point_head/object_statistic_features" in out["statistics"]


def test_graft_by_suffix_and_shape():
    tree = {
        "sa0": {"point_mlp0": {"fc0": {"kernel": np.zeros((7, 16))}}},
        "head": {"cls0_out": {"bias": np.zeros((1,))}},
    }
    flat = {
        "SA_modules/0/point_mlps/0/0/kernel": np.ones((7, 16)),
        "cls_block/0/3/bias": np.full((1,), 2.0),
    }
    out, skipped = graft_into_tree(tree, flat, logger=lambda *a: None)
    assert not skipped
    assert out["sa0"]["point_mlp0"]["fc0"]["kernel"].sum() == 7 * 16
    assert out["head"]["cls0_out"]["bias"][0] == 2.0
