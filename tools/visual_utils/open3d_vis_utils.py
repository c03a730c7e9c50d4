"""Open3D scene visualization (parity: tools/visual_utils/open3d_vis_utils.py).

Gated on open3d availability (not shipped in the TPU image); on headless
hosts `draw_scenes` falls back to writing a .ply of the cloud + an .obj of
box wireframes so results stay inspectable.
"""
from __future__ import annotations

import numpy as np

try:
    import open3d
    _HAS_OPEN3D = True
except Exception:  # pragma: no cover
    _HAS_OPEN3D = False

box_colormap = [
    [1, 1, 1],
    [0, 1, 0],
    [0, 1, 1],
    [1, 1, 0],
]


def boxes_to_lines(boxes):
    """(N, 7) -> list of (8, 3) corner arrays + 14-edge index list."""
    from tsm_det_pointcloud_tpu.ops.boxes import boxes_to_corners_3d_np

    corners = boxes_to_corners_3d_np(np.asarray(boxes).reshape(-1, 7))
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7), (0, 5), (1, 4),  # heading cross
    ]
    return corners, edges


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_labels=None,
                ref_scores=None, point_colors=None, draw_origin=True,
                output_prefix="scene"):
    points = np.asarray(points)
    if not _HAS_OPEN3D:
        # headless fallback: dump .ply + wireframe .obj
        with open(f"{output_prefix}.ply", "w") as f:
            f.write(
                "ply\nformat ascii 1.0\nelement vertex %d\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n" % len(points)
            )
            for p in points[:, :3]:
                f.write("%f %f %f\n" % tuple(p))
        if ref_boxes is not None and len(ref_boxes):
            corners, edges = boxes_to_lines(ref_boxes)
            with open(f"{output_prefix}_boxes.obj", "w") as f:
                for c in corners.reshape(-1, 3):
                    f.write("v %f %f %f\n" % tuple(c))
                for bi in range(len(corners)):
                    for a, b in edges:
                        f.write("l %d %d\n" % (bi * 8 + a + 1, bi * 8 + b + 1))
        return f"{output_prefix}.ply"

    vis = open3d.visualization.Visualizer()
    vis.create_window()
    vis.get_render_option().point_size = 1.0
    vis.get_render_option().background_color = np.zeros(3)
    if draw_origin:
        axis_pcd = open3d.geometry.TriangleMesh.create_coordinate_frame(
            size=1.0, origin=[0, 0, 0]
        )
        vis.add_geometry(axis_pcd)
    pts = open3d.geometry.PointCloud()
    pts.points = open3d.utility.Vector3dVector(points[:, :3])
    if point_colors is None:
        pts.colors = open3d.utility.Vector3dVector(
            np.ones((points.shape[0], 3))
        )
    else:
        pts.colors = open3d.utility.Vector3dVector(point_colors)
    vis.add_geometry(pts)

    def add_boxes(boxes, color):
        corners, edges = boxes_to_lines(boxes)
        for c in corners:
            ls = open3d.geometry.LineSet()
            ls.points = open3d.utility.Vector3dVector(c)
            ls.lines = open3d.utility.Vector2iVector(np.asarray(edges))
            ls.colors = open3d.utility.Vector3dVector(
                np.tile(color, (len(edges), 1))
            )
            vis.add_geometry(ls)

    if gt_boxes is not None and len(gt_boxes):
        add_boxes(gt_boxes, (0, 0, 1))
    if ref_boxes is not None and len(ref_boxes):
        add_boxes(ref_boxes, (0, 1, 0))
    vis.run()
    vis.destroy_window()
    return None
