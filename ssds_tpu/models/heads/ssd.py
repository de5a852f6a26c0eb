"""The classic SSD head.

Behavioral spec source: reference ``lib/modeling/ssds/ssd.py`` (SURVEY.md
§2.5): run the backbone layer list collecting sources at the FEATURE_LAYER
indices (L2Norm with scale-20 init on the first source), chain the extra
blocks off the backbone tail (each extra output is a new source), then
per-source 3x3 loc/conf convs; phases 'feature' / 'train' / 'eval'.
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ssds_tpu.models.heads.common import (
    MultiboxHead,
    conv_extra_spec,
    finalize,
    run_layers,
    split_feature_layer,
)
from ssds_tpu.models.layers import L2Norm, LayerSpec


class SSD(nn.Module):
    base: Tuple[LayerSpec, ...]
    extras: Tuple[LayerSpec, ...]
    taps: Tuple[int, ...]
    num_anchors: Tuple[int, ...]
    num_classes: int
    lite: bool = False

    def setup(self):
        self.base_layers = [s() for s in self.base]
        self.extra_layers = [s() for s in self.extras]
        self.norm = L2Norm()
        self.head = MultiboxHead(self.num_anchors, self.num_classes, lite=self.lite)

    def __call__(self, x, phase: str = "train", train: bool = False):
        sources, x = run_layers(self.base_layers, self.taps, x, train)
        if sources:
            sources[0] = self.norm(sources[0], train)
        for layer in self.extra_layers:
            x = layer(x, train)
            sources.append(x)
        if phase == "feature":
            return sources
        loc, conf = self.head(sources, train)
        return finalize(phase, loc, conf)


def build_ssd(base, feature_layer, mbox, num_classes) -> SSD:
    taps, extra_specs = split_feature_layer(feature_layer)
    extras = tuple(conv_extra_spec(kind, ch) for kind, ch in extra_specs)
    return SSD(
        base=tuple(base),
        extras=extras,
        taps=tuple(taps),
        num_anchors=tuple(mbox),
        num_classes=num_classes,
    )
