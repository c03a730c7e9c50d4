"""SECOND detector (parity: pcdet/models/detectors/second_net.py)."""
from __future__ import annotations

from .pointpillar import PointPillar


class SECONDNet(PointPillar):
    """Same forward contract as PointPillar: sparse 3D backbone ->
    height compression -> BEV backbone -> anchor head."""
