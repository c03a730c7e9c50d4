from .voxel_point_cross import VoxelPointCross

__all__ = {"VoxelPointCross": VoxelPointCross}
