"""UNetV2 — sparse U-Net backbone with point-wise decoder (flax).

Parity: pcdet/models/backbones_3d/spconv_unet.py:49-430 — the Part-A2
backbone: VoxelBackBone8x-style encoder + inverse-conv decoder returning
per-voxel features at stride 1 (`point_features` on the input voxel set)
plus the usual encoded_spconv_tensor for HeightCompression.

Decoder step (parity UNetV2.UR_block_forward): lateral conv on the skip
tensor, inverse conv from the coarser level, channel-concat -> fuse conv.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops import spconv as sp
from .spconv_backbone import (
    SparseConv,
    SparseInverseConv,
    SparseTensor,
    SubMConv,
    sparse_shape_from_meta,
)


class UNetV2(nn.Module):
    model_cfg: dict
    input_channels: int
    meta: object

    @property
    def num_point_features(self):
        return 16

    @nn.compact
    def __call__(self, batch_dict, training=False):
        grid0 = sparse_shape_from_meta(self.meta)
        st = SparseTensor(
            features=batch_dict["voxel_features"],
            coords=batch_dict["voxel_coords"],
            valid=batch_dict["voxel_mask"],
            grid=grid0, stride=1,
        )
        V = st.features.shape[1]
        caps = self.model_cfg.get("VOXEL_CAPACITIES") or [V, V, V, V]

        x = SubMConv(16, name="conv_input")(st, training)
        x1 = SubMConv(16, name="conv1")(x, training)
        x2 = SparseConv(32, out_capacity=caps[0], name="conv2_down")(x1, training)
        x2 = SubMConv(32, name="conv2_a")(x2, training)
        x2 = SubMConv(32, name="conv2_b")(x2, training)
        x3 = SparseConv(64, out_capacity=caps[1], name="conv3_down")(x2, training)
        x3 = SubMConv(64, name="conv3_a")(x3, training)
        x3 = SubMConv(64, name="conv3_b")(x3, training)
        x4 = SparseConv(
            64, padding=(0, 1, 1), out_capacity=caps[2], name="conv4_down"
        )(x3, training)
        x4 = SubMConv(64, name="conv4_a")(x4, training)
        x4 = SubMConv(64, name="conv4_b")(x4, training)

        if self.model_cfg.get("RETURN_ENCODED_TENSOR", True):
            out = SparseConv(
                128, kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=0,
                out_capacity=caps[3], name="conv_out",
            )(x4, training)
            batch_dict["encoded_spconv_tensor"] = sp.sparse_to_dense(
                out.features, out.coords, out.valid, out.grid
            )
            batch_dict["encoded_spconv_tensor_stride"] = 8

        def up_block(coarse, fine, ch, tag, padding=1):
            lat = SubMConv(ch, name=f"{tag}_lateral")(fine, training)
            up = SparseInverseConv(ch, padding=padding, name=f"{tag}_inv")(
                coarse, fine, training
            )
            cat = fine._replace(
                features=jnp.concatenate([lat.features, up.features], -1)
            )
            return SubMConv(ch, name=f"{tag}_fuse")(cat, training)

        # paddings mirror each encoder down-conv (conv4 used (0,1,1))
        u3 = up_block(x4, x3, 64, "up4to3", padding=(0, 1, 1))
        u2 = up_block(u3, x2, 32, "up3to2")
        u1 = up_block(u2, x1, 16, "up2to1")

        batch_dict["point_features"] = u1.features     # (B, V, 16)
        batch_dict["point_coords_voxel"] = u1.coords
        batch_dict["point_valid"] = u1.valid
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4,
        }
        batch_dict["multi_scale_3d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8,
        }
        return batch_dict
