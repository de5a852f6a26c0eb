"""RFBLite: depthwise-separable variant of the RFB head.

Behavioral spec source: reference ``lib/modeling/ssds/rfb_lite.py`` (SURVEY.md
§2.5): BasicRFB branch 3x3 convs become depthwise-separable; prediction convs
use the SSDLite recipe.
"""

from __future__ import annotations

from ssds_tpu.models.heads.rfb import RFB, _build


def build_rfb_lite(base, feature_layer, mbox, num_classes) -> RFB:
    return _build(base, feature_layer, mbox, num_classes, lite=True)
