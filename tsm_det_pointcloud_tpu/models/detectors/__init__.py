"""Detector registry (parity: pcdet/models/detectors/__init__.py:16-32)."""
from __future__ import annotations

from .detector3d_template import DatasetMeta, Detector3DTemplate
from .pointpillar import PointPillar
from .second_net import SECONDNet
from .point_3dssd import Point3DSSD
from .caddn import CaDDN
from .centerpoint import CenterPoint
from .pv_rcnn import PVRCNN, PVRCNNPlusPlus
from .two_stage import (DSASNet, PartA2Net, PointRCNN, PVSSDA,
                        SECONDNetIoU, VoxelRCNN)

__all__ = {
    "PVRCNN": PVRCNN,
    "PVRCNNPlusPlus": PVRCNNPlusPlus,
    "PointRCNN": PointRCNN,
    "VoxelRCNN": VoxelRCNN,
    "PartA2Net": PartA2Net,
    "SECONDNetIoU": SECONDNetIoU,
    "CaDDN": CaDDN,
    "DSASNet": DSASNet,
    "PVSSDA": PVSSDA,
    "Detector3DTemplate": Detector3DTemplate,
    "PointPillar": PointPillar,
    "SECONDNet": SECONDNet,
    "3DSSD": Point3DSSD,
    "Point3DSSD": Point3DSSD,
    "CenterPoint": CenterPoint,
}


def build_detector(model_cfg, num_class, dataset_meta):
    return __all__[model_cfg["NAME"]](
        model_cfg=model_cfg, num_class=num_class, dataset_meta=dataset_meta
    )
