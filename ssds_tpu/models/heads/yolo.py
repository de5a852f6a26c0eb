"""YOLO v2 / v3 heads over the shared backbone-extractor API.

Behavioral spec source: reference ``lib/modeling/ssds/yolo.py`` (SURVEY.md
§2.5): 1x1 detection convs emitting ``A*(5+C)`` channels per level; v2 adds
the passthrough (reorg/space-to-depth) route; v3 adds upsample+concat routes
for 3-scale prediction. The reference's v0 YOLO *training* path was flagged
uncertain/experimental (SURVEY.md §2.5); here both inference and a full
v3-style training loss (:mod:`ssds_tpu.ops.yolo`) are provided.

Phase contract (differs from SSD because YOLO decodes per-cell):
- ``'feature'`` → list of pyramid maps;
- ``'train'``   → list of raw per-scale tensors ``[B, H, W, A, 5+C]``;
- ``'eval'``    → ``(boxes [B,K,4] corner-form normalized, scores [B,K,1+C])``
  where column 0 is ``1 - objectness`` (a synthesized background column) and
  column ``1+c`` is ``objectness * sigmoid(class_c)`` — drop-in compatible
  with :func:`ssds_tpu.ops.postprocess.detect_decoded`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssds_tpu.models.heads.common import run_layers
from ssds_tpu.models.layers import Conv, ConvBNReLU, LayerSpec, resize_bilinear
from ssds_tpu.ops.yolo import decode_scale


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """YOLOv2 'reorg' passthrough: NHWC [B,H,W,C] -> [B,H/b,W/b,C*b*b]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // block, w // block, c * block * block)


class ConvSet(nn.Module):
    """YOLOv3 5-conv block: alternating 1x1(ch) / 3x3(2ch) leaky-BN convs."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for k, ch in ((1, self.features), (3, self.features * 2), (1, self.features),
                      (3, self.features * 2), (1, self.features)):
            x = ConvBNReLU(ch, kernel=k, padding=k // 2, act="leaky")(x, train)
        return x


class YOLO(nn.Module):
    base: Tuple[LayerSpec, ...]
    taps: Tuple[int, ...]
    num_anchors: Tuple[int, ...]  # anchors per scale
    num_classes: int  # real classes (NO background)
    anchors: Tuple[Tuple[Tuple[float, float], ...], ...]  # per-scale (w,h) px
    version: int = 3
    # FEATURE_LAYER's channel group, when the yml declares one: validated
    # against the actual tap channels at trace time (VERDICT r3 weak #7 —
    # a silently-ignored channel spec would mask a mis-wired backbone).
    declared_channels: Tuple[int, ...] = ()

    def setup(self):
        self.base_layers = [s() for s in self.base]

    @nn.compact
    def __call__(self, x, phase: str = "train", train: bool = False):
        img_hw = (x.shape[1], x.shape[2])
        sources, x = run_layers(self.base_layers, self.taps, x, train)
        if self.declared_channels:
            got = tuple(int(s.shape[-1]) for s in sources)
            if got != tuple(self.declared_channels):
                raise ValueError(
                    f"MODEL.FEATURE_LAYER declares channels "
                    f"{tuple(self.declared_channels)} for taps {self.taps}, "
                    f"but the backbone produces {got} — fix the yml's channel "
                    "group (or drop it to accept the backbone's channels)")
        c = self.num_classes
        outs = []  # raw [B,H,W,A*(5+C)] high-res -> low-res

        # Module names use the reference scope vocabulary ('extras', 'conf')
        # so TRAINABLE_SCOPE / RESUME_SCOPE prefix filters apply uniformly.
        if self.version == 2:
            s16, s32 = sources[-2], sources[-1]
            y = ConvBNReLU(1024, kernel=3, padding=1, act="leaky", name="extras_0")(s32, train)
            y = ConvBNReLU(1024, kernel=3, padding=1, act="leaky", name="extras_1")(y, train)
            route = ConvBNReLU(64, kernel=1, padding=0, act="leaky", name="extras_route")(s16, train)
            route = space_to_depth(route, 2)
            y = jnp.concatenate([route, y], axis=-1)
            y = ConvBNReLU(1024, kernel=3, padding=1, act="leaky", name="extras_2")(y, train)
            outs.append(Conv(self.num_anchors[0] * (5 + c), kernel=1, padding=0, name="conf0")(y, train))
            feats = [y]
        else:
            s8, s16, s32 = sources[-3], sources[-2], sources[-1]
            t32 = ConvSet(512, name="extras_t32")(s32, train)
            o32 = ConvBNReLU(1024, kernel=3, padding=1, act="leaky", name="extras_o32")(t32, train)
            o32 = Conv(self.num_anchors[-1] * (5 + c), kernel=1, padding=0, name="conf2")(o32, train)
            r16 = ConvBNReLU(256, kernel=1, padding=0, act="leaky", name="extras_r16")(t32, train)
            r16 = resize_bilinear(r16, (s16.shape[1], s16.shape[2]))
            t16 = ConvSet(256, name="extras_t16")(jnp.concatenate([r16, s16], axis=-1), train)
            o16 = ConvBNReLU(512, kernel=3, padding=1, act="leaky", name="extras_o16")(t16, train)
            o16 = Conv(self.num_anchors[-2] * (5 + c), kernel=1, padding=0, name="conf1")(o16, train)
            r8 = ConvBNReLU(128, kernel=1, padding=0, act="leaky", name="extras_r8")(t16, train)
            r8 = resize_bilinear(r8, (s8.shape[1], s8.shape[2]))
            t8 = ConvSet(128, name="extras_t8")(jnp.concatenate([r8, s8], axis=-1), train)
            o8 = ConvBNReLU(256, kernel=3, padding=1, act="leaky", name="extras_o8")(t8, train)
            o8 = Conv(self.num_anchors[-3] * (5 + c), kernel=1, padding=0, name="conf0")(o8, train)
            outs = [o8, o16, o32]
            feats = [t8, t16, t32]

        if phase == "feature":
            return feats

        raw = [
            o.reshape(o.shape[0], o.shape[1], o.shape[2], a, 5 + c)
            for o, a in zip(outs, self.num_anchors)
        ]
        if phase == "train":
            return raw

        # 'eval'/'joint': decode each scale against its pixel anchors, then
        # package SSD-compatible (boxes, scores-with-background) tensors.
        boxes_all, scores_all = [], []
        for r, anchors_px in zip(raw, self.anchors):
            boxes, obj, cls = decode_scale(r.astype(jnp.float32), jnp.asarray(anchors_px), img_hw)
            k = boxes.shape[1]
            cls_scores = obj[..., None] * jax.nn.sigmoid(cls)  # [B, K, C]
            bg = (1.0 - obj)[..., None]
            boxes_all.append(boxes)
            scores_all.append(jnp.concatenate([bg, cls_scores], axis=-1))
        decoded = (jnp.concatenate(boxes_all, axis=1),
                   jnp.concatenate(scores_all, axis=1))
        if phase == "joint":
            return raw, decoded
        return decoded


# Default pixel anchors (YOLO papers, 416 input), high-res scale first.
YOLO_V3_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
YOLO_V2_ANCHORS = (
    ((27, 37), (87, 102), (173, 236), (339, 216), (382, 383)),
)


def _anchors_from_cfg(model_cfg, default):
    raw = getattr(model_cfg, "ANCHORS", None) if model_cfg is not None else None
    if not raw:
        return default
    return tuple(tuple((float(w), float(h)) for w, h in scale) for scale in raw)


def _declared_channels(feature_layer):
    """FEATURE_LAYER's optional second group (per-tap channels)."""
    if len(feature_layer) > 1 and feature_layer[1]:
        return tuple(int(ch) for ch in feature_layer[1])
    return ()


def build_yolo_v2(base, feature_layer, mbox, num_classes, model_cfg=None) -> YOLO:
    taps = tuple(int(i) for i in feature_layer[0])
    anchors = _anchors_from_cfg(model_cfg, YOLO_V2_ANCHORS)
    return YOLO(
        base=tuple(base), taps=taps, num_anchors=tuple(len(a) for a in anchors),
        num_classes=num_classes - 1, anchors=anchors, version=2,
        declared_channels=_declared_channels(feature_layer),
    )


def build_yolo_v3(base, feature_layer, mbox, num_classes, model_cfg=None) -> YOLO:
    taps = tuple(int(i) for i in feature_layer[0])
    anchors = _anchors_from_cfg(model_cfg, YOLO_V3_ANCHORS)
    return YOLO(
        base=tuple(base), taps=taps, num_anchors=tuple(len(a) for a in anchors),
        num_classes=num_classes - 1, anchors=anchors, version=3,
        declared_channels=_declared_channels(feature_layer),
    )
