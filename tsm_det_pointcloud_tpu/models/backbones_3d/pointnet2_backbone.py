"""PointNet++ backbones (flax).

Parity: pcdet/models/backbones_3d/pointnet2_backbone.py — `PointNet2MSG`
(:12, SA encoder + FP decoder, PointRCNN) and `PointNet2FSMSG` (:212, 3DSSD
fusion-sampling encoder). The voxel-hash variants
(VoxelPointNet2FSMSG(Distillation)) live in voxel_pointnet2_backbone.py.

batch_dict contract (in): points (B, N, 3+C), points_mask (B, N)
  PointNet2MSG out: point_features (B, N, C), point_coords (B, N, 3)
  PointNet2FSMSG out: + point_scores_list / point_coords_list pyramid
  (SASA loss inputs), final point set of size sum(last NPOINT_LIST).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2_modules import (
    PointnetFPModule,
    PointnetSAModuleFSMSG,
    PointnetSAModuleMSG,
)


class PointNet2MSG(nn.Module):
    model_cfg: dict
    input_channels: int
    meta: object = None

    @property
    def num_point_features(self):
        fp = self.model_cfg.get("FP_MLPS")
        return int(fp[0][-1])

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg["SA_CONFIG"]
        points = batch_dict["points"]
        valid = batch_dict["points_mask"]
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        xyz_list, feat_list, valid_list = [xyz], [feats], [valid]
        for i, npoint in enumerate(cfg["NPOINTS"]):
            new_xyz, new_feats, new_valid = PointnetSAModuleMSG(
                npoint=int(npoint),
                radii=list(cfg["RADIUS"][i]),
                nsamples=list(cfg["NSAMPLE"][i]),
                mlps=[list(m) for m in cfg["MLPS"][i]],
                name=f"sa{i}",
            )(xyz_list[-1], feat_list[-1], valid_list[-1], training)
            xyz_list.append(new_xyz)
            feat_list.append(new_feats)
            valid_list.append(new_valid)

        fp_mlps = self.model_cfg["FP_MLPS"]
        # decode from coarsest back to the raw points
        for i in range(len(fp_mlps) - 1, -1, -1):
            feat_list[i] = PointnetFPModule(
                mlp=list(fp_mlps[i]), name=f"fp{i}",
            )(
                unknown=xyz_list[i], known=xyz_list[i + 1],
                unknown_feats=feat_list[i], known_feats=feat_list[i + 1],
                known_valid=valid_list[i + 1], training=training,
                unknown_valid=valid_list[i],
            )

        batch_dict["point_features"] = feat_list[0]
        batch_dict["point_coords"] = xyz_list[0]
        batch_dict["point_valid"] = valid_list[0]
        return batch_dict


class PointNet2FSMSG(nn.Module):
    """3DSSD-style fusion-sampling encoder (parity: PointNet2FSMSG :212)."""
    model_cfg: dict
    input_channels: int
    meta: object = None

    @property
    def num_point_features(self):
        agg = self.model_cfg["SA_CONFIG"].get("AGGREGATION_MLPS")
        if agg:
            return int(agg[-1][-1])
        return int(self.model_cfg["SA_CONFIG"]["MLPS"][-1][-1][-1])

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg["SA_CONFIG"]
        points = batch_dict["points"]
        valid = batch_dict["points_mask"]
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None
        scores = None

        coords_list, scores_list, valid_list = [], [], []
        n_layers = len(cfg["NPOINT_LIST"])
        for i in range(n_layers):
            xyz, feats, valid, scores = PointnetSAModuleFSMSG(
                npoint_list=[int(n) for n in cfg["NPOINT_LIST"][i]],
                sample_range_list=[list(r) for r in cfg["SAMPLE_RANGE_LIST"][i]],
                sample_method_list=list(cfg["SAMPLE_METHOD_LIST"][i]),
                radii=list(cfg["RADIUS"][i]),
                nsamples=list(cfg["NSAMPLE"][i]),
                mlps=[list(m) for m in cfg["MLPS"][i]],
                dilated_group=bool(cfg.get("DILATED_RADIUS_GROUP", False)),
                aggregation_mlp=(
                    list(cfg["AGGREGATION_MLPS"][i])
                    if cfg.get("AGGREGATION_MLPS") else None
                ),
                confidence_mlp=(
                    list(cfg["CONFIDENCE_MLPS"][i])
                    if cfg.get("CONFIDENCE_MLPS") else None
                ),
                num_class=int(cfg.get("NUM_CLASS", 3)),
                weight_gamma=float(cfg.get("WEIGHT_GAMMA", 1.0)),
                name=f"sa{i}",
            )(xyz, feats, valid, scores=scores, training=training)
            coords_list.append(xyz)
            valid_list.append(valid)
            if scores is not None:
                scores_list.append(scores)

        batch_dict["point_features"] = feats
        batch_dict["point_coords"] = xyz
        batch_dict["point_valid"] = valid
        batch_dict["point_scores"] = scores
        batch_dict["point_coords_list"] = coords_list
        batch_dict["point_scores_list"] = scores_list
        batch_dict["point_valid_list"] = valid_list
        return batch_dict
