"""FSSD head: feature fusion + regenerated pyramid.

Behavioral spec source: reference ``lib/modeling/ssds/fssd.py`` (SURVEY.md
§2.5) / the FSSD paper (arXiv:1712.00960, PAPERS.md): 1x1 transform convs on
each selected backbone feature → bilinear-upsample all to the first map's
size → channel-concat → BatchNorm → a small conv "pyramid extractor"
regenerates a fresh pyramid → standard loc/conf heads.

FEATURE_LAYER has TWO groups (fusion sources; pyramid spec)::

    [[[22, 34, 'S'], [512, 1024, 256]],
     [['', 'S', 'S', 'S', '0', '0'], [256, 512, 512, 256, 256, 256]]]

Group 1: ints tap backbone layers; 'S'/'' chain extra conv blocks off the
backbone tail, each becoming a fusion source. Group 2 (pyramid) vocabulary:
``''`` = 3x3 s1 p1 (keep size), ``'S'`` = 3x3 s2 p1 (halve),
``'0'`` = 3x3 s1 p0 (shrink by 2 — the 5→3→1 tail). Every pyramid block's
output is a detection source.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ssds_tpu.models.heads.common import (
    MultiboxHead,
    conv_extra_spec,
    finalize,
    run_layers,
    sep_extra_spec,
    split_feature_layer,
)
from ssds_tpu.models.layers import Conv, ConvBNReLU, LayerSpec, SepConvBNReLU, resize_bilinear

FUSION_CHANNELS = 256  # reference fssd transform width


def pyramid_spec(kind: str, ch: int, lite: bool) -> LayerSpec:
    if lite and kind != "0":
        stride = 2 if kind == "S" else 1
        return lambda: SepConvBNReLU(ch, stride=stride, padding=1)
    if kind == "S":
        return lambda: ConvBNReLU(ch, kernel=3, stride=2, padding=1)
    if kind == "0":
        return lambda: ConvBNReLU(ch, kernel=3, stride=1, padding=0)
    return lambda: ConvBNReLU(ch, kernel=3, stride=1, padding=1)


class FSSD(nn.Module):
    base: Tuple[LayerSpec, ...]
    fusion_extras: Tuple[LayerSpec, ...]
    pyramid: Tuple[LayerSpec, ...]
    taps: Tuple[int, ...]
    num_anchors: Tuple[int, ...]
    num_classes: int
    lite: bool = False

    def setup(self):
        self.base_layers = [s() for s in self.base]
        self.fusion_layers = [s() for s in self.fusion_extras]
        n_sources = len(self.taps) + len(self.fusion_extras)
        self.transforms = [
            Conv(FUSION_CHANNELS, kernel=1, padding=0, relu=True) for _ in range(n_sources)
        ]
        self.fusion_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.pyramid_layers = [s() for s in self.pyramid]
        self.head = MultiboxHead(self.num_anchors, self.num_classes, lite=self.lite)

    def __call__(self, x, phase: str = "train", train: bool = False):
        fusion_sources, x = run_layers(self.base_layers, self.taps, x, train)
        for layer in self.fusion_layers:
            x = layer(x, train)
            fusion_sources.append(x)
        # Transform + upsample to the first source's grid, concat, BN.
        target = fusion_sources[0].shape[1:3]
        transformed = []
        for t, s in zip(self.transforms, fusion_sources):
            y = t(s, train)
            if y.shape[1:3] != target:
                y = resize_bilinear(y, target)
            transformed.append(y)
        fused = jnp.concatenate(transformed, axis=-1)
        fused = self.fusion_bn(fused, use_running_average=not train)

        sources = []
        y = fused
        for layer in self.pyramid_layers:
            y = layer(y, train)
            sources.append(y)
        if phase == "feature":
            return sources
        loc, conf = self.head(sources, train)
        return finalize(phase, loc, conf)


def _build(base, feature_layer, mbox, num_classes, lite: bool) -> FSSD:
    fusion_spec, pyramid_group = feature_layer[0], feature_layer[1]
    taps, extra_specs = split_feature_layer(fusion_spec)
    mk_extra = sep_extra_spec if lite else conv_extra_spec
    fusion_extras = tuple(mk_extra(kind, ch) for kind, ch in extra_specs)
    pyramid = tuple(
        pyramid_spec(str(kind), int(ch), lite)
        for kind, ch in zip(pyramid_group[0], pyramid_group[1])
    )
    return FSSD(
        base=tuple(base),
        fusion_extras=fusion_extras,
        pyramid=pyramid,
        taps=tuple(taps),
        num_anchors=tuple(mbox),
        num_classes=num_classes,
        lite=lite,
    )


def build_fssd(base, feature_layer, mbox, num_classes) -> FSSD:
    return _build(base, feature_layer, mbox, num_classes, lite=False)
