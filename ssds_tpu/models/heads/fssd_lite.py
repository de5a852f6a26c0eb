"""FSSDLite: depthwise-separable variant of FSSD.

Behavioral spec source: reference ``lib/modeling/ssds/fssd_lite.py``
(SURVEY.md §2.5): identical fusion/pyramid wiring, with depthwise-separable
pyramid blocks and prediction convs.
"""

from __future__ import annotations

from ssds_tpu.models.heads.fssd import FSSD, _build


def build_fssd_lite(base, feature_layer, mbox, num_classes) -> FSSD:
    return _build(base, feature_layer, mbox, num_classes, lite=True)
