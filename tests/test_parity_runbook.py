"""The pinned acceptance table (VERDICT r4 #5) stays loadable and sane."""

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

from parity_check import ACCEPTANCE, MAP_TOLERANCE  # noqa: E402

from ssds_tpu.config import cfg_from_file  # noqa: E402


def test_acceptance_tolerance_is_the_baseline_bar():
    # BASELINE.json: "within 0.1 mAP (points)" == 0.001 fractional
    assert MAP_TOLERANCE == 0.001


def test_acceptance_rows_cover_baseline_matrix_and_load():
    names = [row[0] for row in ACCEPTANCE]
    # the five BASELINE.json acceptance architectures (+ SSD512)
    for must in ("ssd_vgg16_train_voc.yml", "ssd_vgg16_train_voc_512.yml",
                 "fssd_vgg16_train_voc.yml", "rfb_vgg16_train_voc.yml",
                 "ssd_lite_mobilenetv2_train_coco.yml",
                 "yolo_v3_darknet_53_train_coco.yml"):
        assert must in names, must
    for yml, expected, protocol, source in ACCEPTANCE:
        path = os.path.join(HERE, "experiments", "cfgs", yml)
        assert os.path.exists(path), yml
        cfg = cfg_from_file(path)  # schema-checked load
        assert 0.0 < expected < 1.0, (yml, expected)
        assert protocol and source
        assert cfg.MODEL.SSDS  # a real model row
