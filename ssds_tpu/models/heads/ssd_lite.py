"""SSDLite head: SSD wiring with depthwise-separable extras and prediction convs.

Behavioral spec source: reference ``lib/modeling/ssds/ssd_lite.py`` (SURVEY.md
§2.5) — the MobileNet-SSDLite recipe: same source selection as SSD, but every
extra block and every loc/conf head conv is a depthwise 3x3 + pointwise 1x1.
"""

from __future__ import annotations

from ssds_tpu.models.heads.common import sep_extra_spec, split_feature_layer
from ssds_tpu.models.heads.ssd import SSD


def build_ssd_lite(base, feature_layer, mbox, num_classes) -> SSD:
    taps, extra_specs = split_feature_layer(feature_layer)
    extras = tuple(sep_extra_spec(kind, ch) for kind, ch in extra_specs)
    return SSD(
        base=tuple(base),
        extras=extras,
        taps=tuple(taps),
        num_anchors=tuple(mbox),
        num_classes=num_classes,
        lite=True,
    )
