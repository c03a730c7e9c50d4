"""Pseudo-KITTI annotation formatting for calibration-free datasets.

Lyft / NuScenes-style lidar annos can be scored with the official KITTI
AP protocol by mapping boxes through the canonical KITTI camera extrinsic
(cam x = -y_lidar, y = -z_lidar at the box BOTTOM, z = x_lidar;
ry = -yaw - pi/2) and faking benign 2D metadata (50-px bboxes, zero
truncation/occlusion) so every object lands in the easiest difficulty
bucket. Parity target: reference pcdet/datasets/kitti/kitti_utils.py:5-49
(transform_annotations_to_kitti_format), minus the in-place mutation.
"""
from __future__ import annotations

import numpy as np


def to_kitti_format(annos, name_map=None):
    """Return NEW kitti-style anno dicts from lidar-box annos.

    annos: dicts with name (N,), boxes_lidar or gt_boxes_lidar (N, >=7),
    optional score. name_map: dataset class -> KITTI class; unmapped names
    pass through unchanged (the KITTI evaluator ignores unknown classes).
    """
    out = []
    for anno in annos:
        names = np.asarray(anno.get("name", anno.get("gt_names", [])), object)
        if name_map:
            names = np.asarray(
                [name_map.get(str(n), str(n)) for n in names], object)
        boxes = anno.get("boxes_lidar", anno.get("gt_boxes_lidar"))
        boxes = (np.asarray(boxes, np.float64).reshape(-1, boxes.shape[-1])
                 if boxes is not None and len(boxes)
                 else np.zeros((0, 7)))
        n = len(names)
        rec = {
            "name": names,
            "truncated": np.zeros(n),
            "occluded": np.zeros(n),
            "bbox": np.concatenate(
                [np.zeros((n, 2)), np.full((n, 2), 50.0)], axis=1),
        }
        if n:
            x, y, z = boxes[:, 0], boxes[:, 1], boxes[:, 2]
            dx, dy, dz = boxes[:, 3], boxes[:, 4], boxes[:, 5]
            ry = -boxes[:, 6] - np.pi / 2.0
            rec["location"] = np.stack([-y, -(z - dz / 2.0), x], axis=1)
            rec["dimensions"] = np.stack([dx, dz, dy], axis=1)  # l, h, w
            rec["rotation_y"] = ry
            rec["alpha"] = -np.arctan2(-y, x) + ry
        else:
            rec["location"] = np.zeros((0, 3))
            rec["dimensions"] = np.zeros((0, 3))
            rec["rotation_y"] = np.zeros(0)
            rec["alpha"] = np.zeros(0)
        if "score" in anno:
            rec["score"] = np.asarray(anno["score"], np.float64)
        out.append(rec)
    return out
