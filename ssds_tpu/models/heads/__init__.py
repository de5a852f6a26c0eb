"""Detector-head zoo.

``ssds_map`` mirrors the reference's ``lib/modeling/model_builder.py``
string→builder map (SURVEY.md §2.5). Every builder has the wiring contract
``build_X(base, feature_layer, mbox, num_classes) -> flax.linen.Module``
where ``base`` is a backbone layer-spec list, ``feature_layer`` is
``cfg.MODEL.FEATURE_LAYER`` and ``mbox`` is the per-map anchors/cell list.
"""

from ssds_tpu.models.heads.fssd import build_fssd
from ssds_tpu.models.heads.fssd_lite import build_fssd_lite
from ssds_tpu.models.heads.rfb import build_rfb
from ssds_tpu.models.heads.rfb_lite import build_rfb_lite
from ssds_tpu.models.heads.ssd import build_ssd
from ssds_tpu.models.heads.ssd_lite import build_ssd_lite
from ssds_tpu.models.heads.yolo import build_yolo_v2, build_yolo_v3

ssds_map = {
    "ssd": build_ssd,
    "ssd_lite": build_ssd_lite,
    "fssd": build_fssd,
    "fssd_lite": build_fssd_lite,
    "rfb": build_rfb,
    "rfb_lite": build_rfb_lite,
    "yolo_v2": build_yolo_v2,
    "yolo_v3": build_yolo_v3,
}
