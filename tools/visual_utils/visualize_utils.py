"""Mayavi scene visualization (parity: tools/visual_utils/visualize_utils.py,
215 L). Gated on mayavi availability; headless fallback delegates to the
open3d module's .ply/.obj dump."""
from __future__ import annotations

import numpy as np

try:
    import mayavi.mlab as mlab
    _HAS_MAYAVI = True
except Exception:  # pragma: no cover
    _HAS_MAYAVI = False


def visualize_pts(pts, fig=None, bgcolor=(0, 0, 0), fgcolor=(1.0, 1.0, 1.0),
                  show_intensity=False, size=(600, 600)):
    if not _HAS_MAYAVI:
        from .open3d_vis_utils import draw_scenes

        return draw_scenes(np.asarray(pts))
    if fig is None:
        fig = mlab.figure(
            figure=None, bgcolor=bgcolor, fgcolor=fgcolor, size=size
        )
    pts = np.asarray(pts)
    if show_intensity and pts.shape[1] > 3:
        mlab.points3d(pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3],
                      mode="point", figure=fig)
    else:
        mlab.points3d(pts[:, 0], pts[:, 1], pts[:, 2],
                      mode="point", figure=fig)
    return fig


def draw_corners3d(corners3d, fig=None, color=(1, 1, 1), line_width=2,
                   tube_radius=None):
    if not _HAS_MAYAVI:
        return None
    for corners in corners3d:
        for k1, k2 in [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6),
                       (6, 7), (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]:
            mlab.plot3d(
                [corners[k1, 0], corners[k2, 0]],
                [corners[k1, 1], corners[k2, 1]],
                [corners[k1, 2], corners[k2, 2]],
                color=color, tube_radius=tube_radius,
                line_width=line_width, figure=fig,
            )
    return fig


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                ref_labels=None):
    """Full-scene draw (parity: demo.py usage)."""
    if not _HAS_MAYAVI:
        from .open3d_vis_utils import draw_scenes as o3d_draw

        return o3d_draw(points, gt_boxes=gt_boxes, ref_boxes=ref_boxes,
                        ref_labels=ref_labels, ref_scores=ref_scores)
    from tsm_det_pointcloud_tpu.ops.boxes import boxes_to_corners_3d_np

    fig = visualize_pts(points)
    if gt_boxes is not None and len(gt_boxes):
        draw_corners3d(boxes_to_corners_3d_np(np.asarray(gt_boxes)), fig,
                       color=(0, 0, 1))
    if ref_boxes is not None and len(ref_boxes):
        draw_corners3d(boxes_to_corners_3d_np(np.asarray(ref_boxes)), fig,
                       color=(0, 1, 0))
    mlab.show(stop=True)
    return fig
