"""Config-driven point-cloud processing queue (host side, numpy).

Parity: pcdet/datasets/processor/data_processor.py:64-229 with one deliberate
TPU-first redesign: `transform_points_to_voxels` does NOT voxelize on the
host. The reference calls spconv Point2Voxel per sample in dataloader
workers; here voxelization is a device-side op (`ops.voxel.voxelize`) fused
into the VFE under jit, so the host (often a single core per TPU chip)
only ships a fixed-size point tensor. This step therefore records the voxel
grid geometry (grid_size, voxel_size, capacities) that the model needs, same
as the reference's side effect on the dataset object.
"""
from __future__ import annotations

import numpy as np

from ...ops.boxes import mask_boxes_outside_range_np
from ...utils.common_utils import mask_points_by_range_np


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 num_point_features):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = "train" if training else "test"
        self.grid_size = self.voxel_size = None
        self.depth_downsample_factor = None
        self.max_voxels = None
        self.max_points_per_voxel = None
        self.num_sampled_points = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            self.data_processor_queue.append(
                getattr(self, cur_cfg.NAME)(config=cur_cfg)
            )

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None, rng=None):
        if data_dict is None:
            return lambda d, r: self.mask_points_and_boxes_outside_range(d, config, r)
        mask = mask_points_by_range_np(data_dict["points"], self.point_cloud_range)
        data_dict["points"] = data_dict["points"][mask]
        if data_dict.get("gt_boxes", None) is not None and config.REMOVE_OUTSIDE_BOXES and self.training:
            box_mask = mask_boxes_outside_range_np(
                data_dict["gt_boxes"], self.point_cloud_range,
                min_num_corners=config.get("min_num_corners", 1),
            )
            data_dict["gt_boxes"] = data_dict["gt_boxes"][box_mask]
            if "gt_names" in data_dict:
                data_dict["gt_names"] = data_dict["gt_names"][box_mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None, rng=None):
        if data_dict is None:
            return lambda d, r: self.shuffle_points(d, config, r)
        if config.SHUFFLE_ENABLED[self.mode]:
            idx = (rng or np.random.default_rng()).permutation(
                data_dict["points"].shape[0]
            )
            data_dict["points"] = data_dict["points"][idx]
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None, rng=None):
        """Records the voxel grid; actual voxelization runs on-device in the
        VFE (see module docstring). Reference: data_processor.py:127-155."""
        if data_dict is None:
            self.voxel_size = np.asarray(config.VOXEL_SIZE, np.float32)
            gsz = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) / self.voxel_size
            self.grid_size = np.round(gsz).astype(np.int64)
            self.max_points_per_voxel = config.MAX_POINTS_PER_VOXEL
            mv = config.MAX_NUMBER_OF_VOXELS
            self.max_voxels = mv[self.mode] if isinstance(mv, dict) else mv
            return lambda d, r: self.transform_points_to_voxels(d, config, r)
        return data_dict

    def sample_points(self, data_dict=None, config=None, rng=None):
        """Fixed-size near/far-aware point sampling.
        Parity: data_processor.py:157-193."""
        if data_dict is None:
            self.num_sampled_points = config.NUM_POINTS[self.mode]
            return lambda d, r: self.sample_points(d, config, r)
        num_points = config.NUM_POINTS[self.mode]
        points = data_dict["points"]
        rng = rng or np.random.default_rng()
        if num_points < len(points):
            pts_depth = np.linalg.norm(points[:, 0:3], axis=1)
            far_idxs = np.where(pts_depth >= 40.0)[0]
            near_idxs = np.where(pts_depth < 40.0)[0]
            if num_points > len(far_idxs):
                near_choice = rng.choice(
                    near_idxs, num_points - len(far_idxs), replace=False
                )
                choice = (
                    np.concatenate((near_choice, far_idxs))
                    if len(far_idxs) > 0 else near_choice
                )
            else:
                choice = rng.choice(len(points), num_points, replace=False)
            rng.shuffle(choice)
        else:
            choice = np.arange(0, len(points), dtype=np.int64)
            if num_points > len(points) and len(points) > 0:
                extra = rng.choice(choice, num_points - len(points))
                choice = np.concatenate((choice, extra))
            rng.shuffle(choice)
        data_dict["points"] = points[choice]
        return data_dict

    def repository_info(self, data_dict=None, config=None, rng=None):
        """TSM-specific: records the stride-FACTOR centroid grid geometry; no
        voxelization (parity: data_processor.py:116-125)."""
        if data_dict is None:
            self.voxel_size = np.asarray(config.VOXEL_SIZE, np.float32)
            factor = config.get("FACTOR", 1)
            gsz = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) / (
                self.voxel_size * factor
            )
            self.grid_size = np.round(gsz).astype(np.int64)
            return lambda d, r: self.repository_info(d, config, r)
        return data_dict

    def downsample_depth_map(self, data_dict=None, config=None, rng=None):
        """Block-mean downscale of the CaDDN depth map (parity:
        data_processor.py:203-212, skimage downscale_local_mean — plain
        numpy reshape-mean here, edge blocks zero-padded like skimage)."""
        if data_dict is None:
            self.depth_downsample_factor = int(config.DOWNSAMPLE_FACTOR)
            return lambda d, r: self.downsample_depth_map(d, config, r)
        f = self.depth_downsample_factor
        dm = np.asarray(data_dict["depth_maps"], np.float32)
        h, w = dm.shape[:2]
        ph, pw = (-h) % f, (-w) % f
        if ph or pw:
            dm = np.pad(dm, ((0, ph), (0, pw)))
        data_dict["depth_maps"] = (
            dm.reshape((h + ph) // f, f, (w + pw) // f, f).mean(axis=(1, 3))
        )
        return data_dict

    def calculate_grid_size(self, data_dict=None, config=None, rng=None):
        if data_dict is None:
            self.voxel_size = np.asarray(config.VOXEL_SIZE, np.float32)
            gsz = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) / self.voxel_size
            self.grid_size = np.round(gsz).astype(np.int64)
            return lambda d, r: self.calculate_grid_size(d, config, r)
        return data_dict

    def forward(self, data_dict, rng=None):
        for processor in self.data_processor_queue:
            data_dict = processor(data_dict, rng)
        return data_dict
