"""Host-aug vs device-aug mAP equivalence (VERDICT r4 #3).

DEVICE_AUG substitutes approximations (hue -> per-channel gain, min-IoU
crop -> center-rule crop). tests/test_augment_drift.py bounds the
distribution drift; THIS test proves the training-outcome equivalence the
recommendation actually rests on: the 5-class CLI oracle trained with the
host pipeline and with DEVICE_AUG (identical config/steps otherwise) must
both solve the task and land within a small mAP delta.

Measured on the TPU chip (2026-08-20, 70 epochs): host 0.9924 vs device
0.9971, delta 0.005 — see docs/STATUS.md. The bar here is looser (the CPU
test runs fewer epochs): both >= 0.85, delta <= 0.08.
"""

import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

pytestmark = pytest.mark.slow


def test_host_and_device_aug_reach_equivalent_map(tmp_path):
    from aug_map_parity import run_one

    epochs, lr_step = 60, 45
    map_host = run_one(False, str(tmp_path), epochs, lr_step)
    map_dev = run_one(True, str(tmp_path), epochs, lr_step)
    assert map_host >= 0.85, f"host-aug mAP {map_host}"
    assert map_dev >= 0.85, f"device-aug mAP {map_dev}"
    assert abs(map_host - map_dev) <= 0.08, (map_host, map_dev)
