"""Depth distribution network (DDN) backbones for CaDDN (flax).

Parity: pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn/
{ddn_template.py, ddn_deeplabv3.py} — the reference wraps torchvision's
deeplabv3_resnet101 (output stride 8: layer3/layer4 dilated instead of
strided) and reads an intermediate layer as image features plus the ASPP
classifier as depth logits. Pretrained ImageNet weights are unportable in
this environment (zero egress), so the architecture trains from scratch;
the layer plan is configurable (LAYERS/WIDTH) so tests run a tiny
instance while the shipped config selects the ResNet-101 plan
([3, 4, 23, 3], width 64).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _ConvBN(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, training=False):
        x = nn.Conv(
            self.ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x) if self.act else x


class Bottleneck(nn.Module):
    """ResNet bottleneck (1x1 -> 3x3 -> 1x1 x4) with projection skip."""
    ch: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, training=False):
        out_ch = self.ch * 4
        h = _ConvBN(self.ch, 1)(x, training)
        h = _ConvBN(self.ch, 3, self.stride, self.dilation)(h, training)
        h = _ConvBN(out_ch, 1, act=False)(h, training)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = _ConvBN(out_ch, 1, self.stride, act=False)(x, training)
        return nn.relu(h + x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (rates 12/24/36 at output stride 8)."""
    ch: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, training=False):
        branches = [_ConvBN(self.ch, 1)(x, training)]
        for r in self.rates:
            branches.append(_ConvBN(self.ch, 3, dilation=r)(x, training))
        # image-level pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = _ConvBN(self.ch, 1)(g, training)
        branches.append(jnp.broadcast_to(
            g, x.shape[:3] + (self.ch,)))
        h = jnp.concatenate(branches, -1)
        return _ConvBN(self.ch, 1)(h, training)


class DDNDeepLabV3(nn.Module):
    """ResNet + ASPP DDN at output stride 8; returns (features, logits)
    both at stride `downsample` (the frustum gather consumes one aligned
    map — a deliberate TPU simplification of the reference's mixed-stride
    layer1/classifier reads)."""
    num_feat: int             # frustum feature channels (channel_reduce)
    num_logits: int           # depth bins (+1 out-of-range, per caller)
    layers: Sequence[int] = (3, 4, 23, 3)   # ResNet-101 plan
    width: int = 64

    @nn.compact
    def __call__(self, images, training=False):
        w = self.width
        x = _ConvBN(w, 7, 2)(images, training)          # /2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # /4
        plan = [
            (self.layers[0], w, 1, 1),        # layer1 at /4
            (self.layers[1], w * 2, 2, 1),    # layer2 -> /8
            (self.layers[2], w * 4, 1, 2),    # layer3 dilated (OS 8)
            (self.layers[3], w * 8, 1, 4),    # layer4 dilated
        ]
        layer1 = None
        for li, (n, ch, stride, dil) in enumerate(plan):
            for bi in range(n):
                x = Bottleneck(ch, stride if bi == 0 else 1, dil)(
                    x, training)
            if li == 0:
                layer1 = x                     # feat_extract_layer
        h = ASPP()(x, training)                          # /8
        logits = nn.Conv(self.num_logits, (1, 1), name="classifier")(
            _ConvBN(256, 3)(h, training))
        # channel-reduce layer1 (/4) and align to /8 for the fused gather
        feats = _ConvBN(self.num_feat, 1)(layer1, training)
        feats = nn.avg_pool(feats, (2, 2), strides=(2, 2))
        return feats, logits


class CompactDDN(nn.Module):
    """The round-1/2 compact stand-in (6 conv blocks) — default for tiny
    tests; selected by DDN.NAME == 'CompactDDN'."""
    num_feat: int
    num_logits: int

    @nn.compact
    def __call__(self, images, training=False):
        def block(x, ch, stride=1):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3)(x)
            return nn.relu(x)

        x = block(images, 32, 2)
        x = block(x, 32)
        x = block(x, 64, 2)
        x = block(x, 64)
        x = block(x, self.num_feat, 2)
        feats = block(x, self.num_feat)
        logits = nn.Conv(self.num_logits, (1, 1), name="depth_head")(feats)
        return feats, logits


DDN_REGISTRY = {
    "CompactDDN": CompactDDN,
    "DDNDeepLabV3": DDNDeepLabV3,
}
