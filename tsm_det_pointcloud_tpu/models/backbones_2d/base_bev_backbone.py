"""2D BEV backbone (flax, NHWC).

Parity: pcdet/models/backbones_2d/base_bev_backbone.py:6-112 — per-level
stride-S conv stacks, per-level transposed-conv upsampling to a common
resolution, channel concat. bf16-friendly: all convs run through the MXU.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BaseBEVBackbone(nn.Module):
    model_cfg: dict
    input_channels: int

    def get_output_feature_dim(self):
        num_up = self.model_cfg.get("NUM_UPSAMPLE_FILTERS", [])
        if num_up:
            c = sum(num_up)
            if len(self.model_cfg.get("UPSAMPLE_STRIDES", [])) > len(num_up):
                c = c * 2
            return c
        return self.model_cfg["NUM_FILTERS"][-1]

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        layer_nums = list(cfg.get("LAYER_NUMS", []))
        layer_strides = list(cfg.get("LAYER_STRIDES", []))
        num_filters = list(cfg.get("NUM_FILTERS", []))
        upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []))
        num_upsample_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []))

        x = batch_dict["spatial_features"]  # (B, H, W, C)
        ups = []
        for i, n_layers in enumerate(layer_nums):
            x = nn.Conv(
                num_filters[i], (3, 3), strides=(layer_strides[i], layer_strides[i]),
                padding=((1, 1), (1, 1)), use_bias=False, name=f"block{i}_down",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                name=f"block{i}_down_bn",
            )(x)
            x = nn.relu(x)
            for j in range(n_layers):
                x = nn.Conv(
                    num_filters[i], (3, 3), padding="SAME", use_bias=False,
                    name=f"block{i}_conv{j}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not training, momentum=0.99,
                    epsilon=1e-3, name=f"block{i}_bn{j}",
                )(x)
                x = nn.relu(x)

            if i < len(upsample_strides):
                s = upsample_strides[i]
                if s >= 1:
                    u = nn.ConvTranspose(
                        num_upsample_filters[i], (s, s), strides=(s, s),
                        use_bias=False, name=f"deblock{i}",
                    )(x)
                else:
                    s_inv = int(round(1 / s))
                    u = nn.Conv(
                        num_upsample_filters[i], (s_inv, s_inv),
                        strides=(s_inv, s_inv), use_bias=False, name=f"deblock{i}",
                    )(x)
                u = nn.BatchNorm(
                    use_running_average=not training, momentum=0.99,
                    epsilon=1e-3, name=f"deblock{i}_bn",
                )(u)
                ups.append(nn.relu(u))
            else:
                ups.append(x)

        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif len(ups) == 1:
            x = ups[0]

        if len(upsample_strides) > len(layer_nums):
            s = upsample_strides[-1]
            x = nn.ConvTranspose(
                x.shape[-1], (s, s), strides=(s, s), use_bias=False,
                name="deblock_final",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                name="deblock_final_bn",
            )(x)
            x = nn.relu(x)

        batch_dict["spatial_features_2d"] = x
        return batch_dict
