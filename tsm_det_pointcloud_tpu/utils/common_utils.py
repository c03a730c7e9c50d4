"""Common host+device utilities.

TPU-native counterpart of the reference's pcdet/utils/common_utils.py — the
geometry helpers are pure jnp (traceable under jit), logging/meters stay host
side. No torch anywhere.
"""
from __future__ import annotations

import logging
import os
import random
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# geometry (jnp, jit-safe; numpy twins suffixed _np for the host pipeline)
# ---------------------------------------------------------------------------

def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap angles into [-offset*period, (1-offset)*period).

    Parity: pcdet/utils/common_utils.py:41 (torch.floor based).
    Works for jnp and np inputs alike.
    """
    mod = jnp if isinstance(val, jnp.ndarray) else np
    return val - mod.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(..., 3, 3) rotation matrices about +z for (...,) angles (CCW)."""
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(angle), jnp.ones_like(angle)
    rot = jnp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=-1
    )
    return rot.reshape(angle.shape + (3, 3))


def rotate_points_along_z(points, angle):
    """Rotate (B, N, 3+C) points by (B,) angles about z (CCW, matches
    pcdet/utils/common_utils.py:58 convention: p_new = p @ R with
    R = [[c, s, 0], [-s, c, 0], [0, 0, 1]]).

    Elementwise on purpose: a 3x3 einsum would route through the MXU at
    bf16 default precision; the VPU form is exact f32 and faster.
    """
    cosa = jnp.cos(angle)[:, None]
    sina = jnp.sin(angle)[:, None]
    x, y = points[..., 0], points[..., 1]
    xn = x * cosa - y * sina
    yn = x * sina + y * cosa
    return jnp.concatenate(
        [xn[..., None], yn[..., None], points[..., 2:]], axis=-1
    )


def rotate_points_along_z_np(points: np.ndarray, angle: np.ndarray) -> np.ndarray:
    cosa, sina = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(angle), np.ones_like(angle)
    rot = np.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=-1
    ).reshape(angle.shape + (3, 3))
    xyz = np.einsum("bnd,bdk->bnk", points[..., :3], rot)
    return np.concatenate([xyz, points[..., 3:]], axis=-1)


def mask_points_by_range_np(points: np.ndarray, limit_range) -> np.ndarray:
    """Boolean mask of points inside an xy(z) range box.
    Parity: pcdet/utils/common_utils.py:78 (xy-only check, as the reference)."""
    return (
        (points[:, 0] >= limit_range[0])
        & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1])
        & (points[:, 1] <= limit_range[4])
    )


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """Voxel (z,y,x)-coords -> metric xyz centers.
    Parity: pcdet/utils/common_utils.py:88."""
    assert voxel_coords.shape[-1] == 3
    xyz = voxel_coords[:, ::-1].astype(jnp.float32)  # (zyx) -> (xyz)
    voxel_size = jnp.asarray(voxel_size, jnp.float32) * downsample_times
    pc_range = jnp.asarray(point_cloud_range[:3], jnp.float32)
    return (xyz + 0.5) * voxel_size + pc_range


# ---------------------------------------------------------------------------
# host-side runtime helpers
# ---------------------------------------------------------------------------

class _LiveStderrHandler(logging.StreamHandler):
    """StreamHandler that resolves sys.stderr at EMIT time (the stdlib
    logging._StderrHandler pattern). A plain StreamHandler binds the stream
    object once at creation; because create_logger caches handlers on a
    named logger, a long-lived process (or a test suite that swaps
    sys.stderr per test) would keep writing to a stale — possibly closed —
    stream from the first call."""

    def __init__(self, level=logging.NOTSET):
        logging.Handler.__init__(self, level)

    @property
    def stream(self):
        import sys

        return self._bound_stream if self._bound_stream is not None \
            else sys.stderr

    @stream.setter
    def stream(self, value):
        # keep the handler substitutable for a plain StreamHandler:
        # an explicit assignment (or setStream) pins the stream and ends
        # the live sys.stderr resolution
        self._bound_stream = value

    _bound_stream = None


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(__name__ + (".rank%d" % rank))
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    lvl = log_level if rank == 0 else logging.ERROR
    if not any(isinstance(h, _LiveStderrHandler) for h in logger.handlers):
        console = _LiveStderrHandler()
        console.setLevel(lvl)
        console.setFormatter(formatter)
        logger.addHandler(console)
    if log_file is not None:
        path = os.path.abspath(str(log_file))
        if not any(isinstance(h, logging.FileHandler)
                   and getattr(h, "baseFilename", None) == path
                   for h in logger.handlers):
            fh = logging.FileHandler(filename=path)
            fh.setLevel(lvl)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    """Seed every host-side RNG. Device randomness flows exclusively through
    jax.random keys derived from this seed (no global device RNG state)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class AverageMeter:
    """Running average meter (parity: pcdet common_utils.py:283)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)
