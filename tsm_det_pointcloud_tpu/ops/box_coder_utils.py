"""Box encode/decode, pure jnp.

Parity targets (pcdet/utils/box_coder_utils.py):
  ResidualCoder        (:5-77)   — anchor-based 7(+)-dim residual coding
  PointResidualCoder   (:144-223)— point-based, log-size or mean-size coding
  PointBinResidualCoder(:225-364)— TSM coder: xyz offset + log size +
                                   angle_bin_num-way angle cls + residual;
                                   code_size = 6 + 2*angle_bin_num
All functions are shape-polymorphic over leading dims and jit-safe.

Decoded log-sizes are clamped to [-LOG_SIZE_CLAMP, LOG_SIZE_CLAMP] before
exp. The reference decodes raw exp, which is fine for the rows that are
ever looked at — but the rebuild computes losses (rdiou, corner) over ALL
fixed-capacity rows and masks afterwards, and an exploded background row
(exp overflow -> inf) poisons gradients through 0*inf even when masked.
Clamping inside the decoder kills the infs at the source for every
consumer; real boxes (<= ~55 m after exp(4)) are unaffected.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

LOG_SIZE_CLAMP = 4.0


def _safe_exp(t):
    return jnp.exp(jnp.clip(t, -LOG_SIZE_CLAMP, LOG_SIZE_CLAMP))


class ResidualCoder:
    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes/anchors: (..., 7 + C)."""
        anchors = anchors.at[..., 3:6].set(jnp.clip(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], 1e-5))

        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
        cas = jnp.split(anchors[..., 7:], anchors.shape[-1] - 7, axis=-1) if anchors.shape[-1] > 7 else []
        cgs = jnp.split(boxes[..., 7:], boxes.shape[-1] - 7, axis=-1) if boxes.shape[-1] > 7 else []

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [g - a for g, a in zip(cgs, cas)]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        if not self.encode_angle_by_sincos:
            parts = jnp.split(box_encodings[..., :7], 7, axis=-1)
            xt, yt, zt, dxt, dyt, dzt, rt = parts
            rest = box_encodings[..., 7:]
        else:
            parts = jnp.split(box_encodings[..., :8], 8, axis=-1)
            xt, yt, zt, dxt, dyt, dzt, cost, sint = parts
            rest = box_encodings[..., 8:]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = _safe_exp(dxt) * dxa
        dyg = _safe_exp(dyt) * dya
        dzg = _safe_exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        cgs = []
        n_extra = anchors.shape[-1] - 7
        if n_extra > 0:
            cas = jnp.split(anchors[..., 7:], n_extra, axis=-1)
            cts = jnp.split(rest, n_extra, axis=-1)
            cgs = [t + a for t, a in zip(cts, cas)]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PointResidualCoder:
    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = jnp.asarray(kwargs["mean_size"], jnp.float32)

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (N, 7+C), points (N, 3), gt_classes (N,) 1-based."""
        gt_boxes = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5))
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(gt_boxes[..., :7], 7, axis=-1)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            pt_size = self.mean_size[gt_classes - 1]
            dxa, dya, dza = jnp.split(pt_size, 3, axis=-1)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt = jnp.log(dxg)
            dyt = jnp.log(dyg)
            dzt = jnp.log(dzg)
        cts = [gt_boxes[..., 7 + i : 8 + i] for i in range(gt_boxes.shape[-1] - 7)]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), *cts], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(box_encodings[..., :8], 8, axis=-1)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            pt_size = self.mean_size[pred_classes - 1]
            dxa, dya, dza = jnp.split(pt_size, 3, axis=-1)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = _safe_exp(dxt) * dxa
            dyg = _safe_exp(dyt) * dya
            dzg = _safe_exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = _safe_exp(dxt), _safe_exp(dyt), _safe_exp(dzt)
        rg = jnp.arctan2(sint, cost)
        rest = box_encodings[..., 8:]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, rest], axis=-1)


class PointBinResidualCoder:
    """xyz offset + log sizes + binned angle (cls + normalized residual).

    Parity: pcdet/utils/box_coder_utils.py:225-364. code_size =
    6 + 2 * angle_bin_num (30 for the TSM config's 12 bins).
    Angle is wrapped to [0, 2pi); bin i covers
    [i*delta - delta/2, i*delta + delta/2); the residual is normalized to
    [-0.5, 0.5) within the bin and decode is (bin + res) * delta — the
    reference's exact convention (:239-273), so converted torch reg heads
    decode identically.
    """

    def __init__(self, code_size=30, use_mean_size=False, angle_bin_num=12, **kwargs):
        self.angle_bin_num = angle_bin_num
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = jnp.asarray(kwargs["mean_size"], jnp.float32)
        self.code_size = 6 + 2 * self.angle_bin_num

    def encode_angle(self, angle):
        """(N,) -> one-hot (N, bins), residual-in-[-0.5,0.5) one-hot."""
        angle = angle % (2 * np.pi)
        delta = 2 * np.pi / self.angle_bin_num
        shifted = (angle + delta / 2) % (2 * np.pi)
        bin_id = jnp.floor(shifted / delta).astype(jnp.int32)
        res = shifted / delta - bin_id.astype(angle.dtype) - 0.5
        one_hot = jnp.eye(self.angle_bin_num, dtype=angle.dtype)[bin_id]
        res_oh = one_hot * res[..., None]
        return one_hot, res_oh

    def decode_angle(self, angle_cls, angle_res):
        """(N, bins) logits/scores + (N, bins) residuals -> (N, 1) angle."""
        bin_id = jnp.argmax(angle_cls, axis=-1)
        res = jnp.take_along_axis(angle_res, bin_id[..., None], axis=-1)[..., 0]
        delta = 2 * np.pi / self.angle_bin_num
        angle = (bin_id.astype(angle_res.dtype) + res) * delta
        return angle[..., None]

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5))
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(gt_boxes[..., :7], 7, axis=-1)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            pt_size = self.mean_size[gt_classes - 1]
            dxa, dya, dza = jnp.split(pt_size, 3, axis=-1)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        bin_oh, res_oh = self.encode_angle(rg[..., 0])
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, bin_oh, res_oh], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt = jnp.split(box_encodings[..., :6], 6, axis=-1)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            pt_size = self.mean_size[pred_classes - 1]
            dxa, dya, dza = jnp.split(pt_size, 3, axis=-1)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = _safe_exp(dxt) * dxa
            dyg = _safe_exp(dyt) * dya
            dzg = _safe_exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = _safe_exp(dxt), _safe_exp(dyt), _safe_exp(dzt)
        angle_cls = box_encodings[..., 6 : 6 + self.angle_bin_num]
        angle_res = box_encodings[..., 6 + self.angle_bin_num :]
        rg = self.decode_angle(angle_cls, angle_res)
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


class PreviousResidualDecoder:
    """Legacy decoder with (w, l, h) encoding order
    (parity: box_coder_utils.py:80-109)."""

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(box_encodings[..., :7], 7, -1)
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = _safe_exp(lt) * dxa
        dyg = _safe_exp(wt) * dya
        dzg = _safe_exp(ht) * dza
        rg = rt + ra
        extra_t = box_encodings[..., 7:]
        extra_a = anchors[..., 7 : 7 + extra_t.shape[-1]]
        return jnp.concatenate(
            [xg, yg, zg, dxg, dyg, dzg, rg, extra_t + extra_a], -1
        )


class PreviousResidualRoIDecoder(PreviousResidualDecoder):
    """RoI variant: heading adds with period wrap
    (parity: box_coder_utils.py:112-141)."""

    @staticmethod
    def decode(box_encodings, anchors):
        out = PreviousResidualDecoder.decode(box_encodings, anchors)
        rg = (out[..., 6:7] + np.pi) % (2 * np.pi) - np.pi
        return jnp.concatenate([out[..., :6], rg, out[..., 7:]], -1)
