"""Model registry + builders (parity: pcdet/models/__init__.py:16-44 and the
per-subpackage __init__ registries).

`build_network(model_cfg, num_class, dataset)` keeps the reference signature;
`dataset` may be a live dataset object or a DatasetMeta.
"""
from __future__ import annotations

import numpy as np

from .detectors.detector3d_template import DatasetMeta, Detector3DTemplate


def _meta_from_dataset(dataset):
    if isinstance(dataset, DatasetMeta):
        return dataset
    grid = getattr(dataset, "grid_size", None)
    vs = getattr(dataset, "voxel_size", None)
    dp = getattr(dataset, "data_processor", None)
    return DatasetMeta(
        class_names=tuple(dataset.class_names),
        point_cloud_range=tuple(np.asarray(dataset.point_cloud_range).tolist()),
        voxel_size=tuple(np.asarray(vs).tolist()) if vs is not None else None,
        grid_size=tuple(np.asarray(grid).tolist()) if grid is not None else None,
        max_voxels=int(getattr(dp, "max_voxels", None) or 16000),
        max_points_per_voxel=int(getattr(dp, "max_points_per_voxel", None) or 5),
        num_point_features=int(dataset.point_feature_encoder.num_point_features),
        max_points=int(getattr(dataset, "max_points", 16384)),
    )


def build_module_list(model_cfg, num_class, meta: DatasetMeta):
    """Instantiate the topology modules present in model_cfg, in order."""
    from .backbones_2d.base_bev_backbone import BaseBEVBackbone
    from .backbones_2d.map_to_bev import HeightCompression, PointPillarScatter
    from .backbones_3d.vfe import (
        DynamicMeanVFE, DynamicPillarVFE, MeanVFE, MeanDensityVFE, PillarVFE,
    )
    from .dense_heads.anchor_head import (
        AnchorHeadMulti, AnchorHeadMultiCls, AnchorHeadSingle,
        AnchorHeadSingleCls,
    )

    from .backbones_3d.vfe import SPVFE, VPCVFE
    vfe_registry = {
        "MeanVFE": MeanVFE, "PillarVFE": PillarVFE,
        "MeanDensityVFE": MeanDensityVFE,
        "DynMeanVFE": DynamicMeanVFE, "DynamicMeanVFE": DynamicMeanVFE,
        "DynPillarVFE": DynamicPillarVFE, "DynamicPillarVFE": DynamicPillarVFE,
        "SPVFE": SPVFE, "VPCVFE": VPCVFE,
    }
    from .backbones_2d.map_to_bev import Conv2DCollapse
    map_bev_registry = {
        "PointPillarScatter": PointPillarScatter,
        "HeightCompression": HeightCompression,
        "Conv2DCollapse": Conv2DCollapse,
    }
    from .backbones_2d.point_bev_hybrids import (
        BEVPoint, PointFromVoxel, SparsePointBackbone,
        VoxelPointCross as VoxelPointCross2D,
    )
    backbone2d_registry = {
        "BaseBEVBackbone": BaseBEVBackbone,
        "BEVPoint": BEVPoint,
        "PointFromVoxel": PointFromVoxel,
        "SparsePointBackbone": SparsePointBackbone,
        "VoxelPointCross": VoxelPointCross2D,
    }
    dense_head_registry = {"AnchorHeadSingle": AnchorHeadSingle,
                           "AnchorHeadMulti": AnchorHeadMulti,
                           "AnchorHeadSingleCls": AnchorHeadSingleCls,
                           "AnchorHeadMultiCls": AnchorHeadMultiCls}
    backbone3d_registry = {}
    from .dense_heads.point_head_box import PointHeadBox
    from .dense_heads.point_head_simple import PointHeadSimple
    from .dense_heads.point_intra_part_head import PointIntraPartOffsetHead
    from .dense_heads.point_head_box import (
        DSASNetHead, PVSSDAHead, VPCNetHead,
    )
    point_head_registry = {
        "PointHeadSimple": PointHeadSimple,
        "PointHeadBox": PointHeadBox,
        "PointIntraPartOffsetHead": PointIntraPartOffsetHead,
        "VPCNetHead": VPCNetHead,
        "DSASNetHead": DSASNetHead,
        "PVSSDAHead": PVSSDAHead,
    }
    from .roi_heads.partA2_head import PartA2FCHead
    from .roi_heads.pointrcnn_head import PointRCNNHead
    from .roi_heads.pvrcnn_head import (
        DSASNetRoIHead, EPointRoIHead, EPointRoIHeadV2, PVRCNNHead,
    )
    from .roi_heads.second_head import SECONDHead
    from .roi_heads.voxelrcnn_head import VoxelRCNNHead
    roi_head_registry = {
        "PVRCNNHead": PVRCNNHead,
        "PointRCNNHead": PointRCNNHead,
        "VoxelRCNNHead": VoxelRCNNHead,
        "PartA2FCHead": PartA2FCHead,
        "SECONDHead": SECONDHead,
        "EPointRoIHead": EPointRoIHead,
        "EPointRoIHeadV2": EPointRoIHeadV2,
        "DSASNetRoIHead": DSASNetRoIHead,
    }
    try:
        from .backbones_3d.spconv_unet import UNetV2
        backbone3d_registry.update(UNetV2=UNetV2)
    except ImportError:
        pass
    try:
        from .backbones_3d.spconv_backbone import (
            DSASNetVoxelBackBone8x, SpaceVoxelBackBone8x, VoxelBackBone8x,
            VoxelResBackBone8x,
        )
        backbone3d_registry.update(
            VoxelBackBone8x=VoxelBackBone8x, VoxelResBackBone8x=VoxelResBackBone8x,
            DSASNetVoxelBackBone8x=DSASNetVoxelBackBone8x,
            SpaceVoxelBackBone8x=SpaceVoxelBackBone8x,
        )
    except ImportError:
        pass
    from .backbones_3d.pointnet2_backbone import PointNet2MSG, PointNet2FSMSG
    backbone3d_registry.update(
        PointNet2MSG=PointNet2MSG, PointNet2FSMSG=PointNet2FSMSG,
    )
    try:
        from .backbones_3d.voxel_pointnet2_backbone import (
            VoxelPointNet2FSMSG, VoxelPointNet2FSMSGDistillation,
        )
        backbone3d_registry.update(
            VoxelPointNet2FSMSG=VoxelPointNet2FSMSG,
            VoxelPointNet2FSMSGDistillation=VoxelPointNet2FSMSGDistillation,
        )
    except ImportError:
        pass
    try:
        from .dense_heads.center_head import CenterHead
        dense_head_registry.update(CenterHead=CenterHead)
    except ImportError:
        pass
    try:
        from .dense_heads.point_head_vote import (
            PointHeadVoteSASAStatistic, PointHeadVoteSASAStatisticDistillation,
        )
        point_head_registry.update(
            PointHeadVoteSASAStatistic=PointHeadVoteSASAStatistic,
            PointHeadVoteSASAStatisticDistillation=PointHeadVoteSASAStatisticDistillation,
        )
    except ImportError:
        pass

    modules, infos = [], []
    cur_point_features = meta.num_point_features
    cur_bev_channels = None

    if model_cfg.get("VFE") is not None:
        vfe_name = model_cfg["VFE"]["NAME"]
        if vfe_name == "ImageVFE":
            from .backbones_3d.image_vfe import ImageVFE

            m = ImageVFE(
                model_cfg=dict(model_cfg["VFE"]),
                grid_size=meta.grid_size,
                point_cloud_range=meta.point_cloud_range,
                voxel_size=meta.voxel_size,
                downsample_factor=int(meta.depth_downsample_factor or 8),
            )
        else:
            cls = vfe_registry[vfe_name]
            m = cls(
                model_cfg=dict(model_cfg["VFE"]),
                num_point_features=meta.num_point_features,
                voxel_size=meta.voxel_size,
                point_cloud_range=meta.point_cloud_range,
                max_voxels=meta.max_voxels,
                max_points_per_voxel=meta.max_points_per_voxel,
            )
        cur_point_features = m.get_output_feature_dim()
        modules.append(m)
        infos.append(("vfe", vfe_name))

    if model_cfg.get("BACKBONE_3D") is not None:
        cls = backbone3d_registry[model_cfg["BACKBONE_3D"]["NAME"]]
        m = cls(
            model_cfg=dict(model_cfg["BACKBONE_3D"]),
            input_channels=cur_point_features,
            meta=meta,
        )
        modules.append(m)
        infos.append(("backbone_3d", model_cfg["BACKBONE_3D"]["NAME"]))
        cur_point_features = getattr(m, "num_point_features", cur_point_features)
        cur_bev_channels = getattr(m, "num_bev_features", None)

    if model_cfg.get("MAP_TO_BEV") is not None:
        name = model_cfg["MAP_TO_BEV"]["NAME"]
        cls = map_bev_registry[name]
        kwargs = dict(model_cfg=dict(model_cfg["MAP_TO_BEV"]))
        if name == "PointPillarScatter":
            kwargs["grid_size"] = meta.grid_size
        m = cls(**kwargs)
        modules.append(m)
        infos.append(("map_to_bev_module", name))
        cur_bev_channels = model_cfg["MAP_TO_BEV"].get(
            "NUM_BEV_FEATURES", cur_point_features
        )

    cur_pfe_features = None
    if model_cfg.get("PFE") is not None:
        # topology slot: after map_to_bev (needs spatial_features), before
        # backbone_2d (detector3d_template.py:26-29)
        from .backbones_3d.pfe.voxel_set_abstraction import VoxelSetAbstraction

        m = VoxelSetAbstraction(
            model_cfg=dict(model_cfg["PFE"]),
            voxel_size=meta.voxel_size,
            point_cloud_range=meta.point_cloud_range,
            num_bev_features=model_cfg.get("MAP_TO_BEV", {}).get(
                "NUM_BEV_FEATURES", 256
            ),
            num_rawpoint_features=meta.num_point_features,
        )
        cur_pfe_features = m.num_point_features
        modules.append(m)
        infos.append(("pfe", model_cfg["PFE"]["NAME"]))

    if model_cfg.get("BACKBONE_2D") is not None:
        b2d_name = model_cfg["BACKBONE_2D"]["NAME"]
        b2d_kwargs = dict(
            model_cfg=dict(model_cfg["BACKBONE_2D"]),
            input_channels=cur_bev_channels,
        )
        if b2d_name != "BaseBEVBackbone":
            # the hybrid backbones read point geometry (reference ctor
            # signature, backbones_2d/__init__ call sites)
            b2d_kwargs.update(
                voxel_size=tuple(meta.voxel_size),
                point_cloud_range=tuple(meta.point_cloud_range),
            )
        m = backbone2d_registry[b2d_name](**b2d_kwargs)
        modules.append(m)
        infos.append(("backbone_2d", model_cfg["BACKBONE_2D"]["NAME"]))
        cur_bev_channels = m.get_output_feature_dim()

    if model_cfg.get("NECK") is not None:
        from .neck import __all__ as neck_registry

        m = neck_registry[model_cfg["NECK"]["NAME"]](
            model_cfg=dict(model_cfg["NECK"]),
            voxel_size=meta.voxel_size,
            point_cloud_range=meta.point_cloud_range,
        )
        modules.append(m)
        infos.append(("neck", model_cfg["NECK"]["NAME"]))
        cur_bev_channels = model_cfg["NECK"].get(
            "NUM_FILTERS", cur_bev_channels
        )

    if model_cfg.get("DENSE_HEAD") is not None:
        name = model_cfg["DENSE_HEAD"]["NAME"]
        kwargs = dict(
            model_cfg=dict(model_cfg["DENSE_HEAD"]),
            input_channels=cur_bev_channels,
            num_class=num_class,
            class_names=tuple(meta.class_names),
            grid_size=meta.grid_size,
            point_cloud_range=meta.point_cloud_range,
        )
        if name == "CenterHead":
            kwargs["voxel_size"] = meta.voxel_size
        elif model_cfg.get("ROI_HEAD") is not None:
            kwargs["predict_boxes_when_training"] = True
        m = dense_head_registry[name](**kwargs)
        modules.append(m)
        infos.append(("dense_head", name))

    if model_cfg.get("POINT_HEAD") is not None:
        name = model_cfg["POINT_HEAD"]["NAME"]
        m = point_head_registry[name](
            model_cfg=dict(model_cfg["POINT_HEAD"]),
            num_class=num_class,
            meta=meta,
        )
        modules.append(m)
        infos.append(("point_head", name))

    if model_cfg.get("ROI_HEAD") is not None:
        name = model_cfg["ROI_HEAD"]["NAME"]
        kwargs = dict(
            model_cfg=dict(model_cfg["ROI_HEAD"]),
            input_channels=cur_pfe_features or 128,
            num_class=num_class,
        )
        if name in ("VoxelRCNNHead", "SECONDHead"):
            kwargs["voxel_size"] = meta.voxel_size
            kwargs["point_cloud_range"] = meta.point_cloud_range
        m = roi_head_registry[name](**kwargs)
        modules.append(m)
        infos.append(("roi_head", name))

    return modules, infos


def build_network(model_cfg, num_class, dataset):
    from .detectors import build_detector

    return build_detector(
        model_cfg=model_cfg, num_class=num_class,
        dataset_meta=_meta_from_dataset(dataset),
    )
