"""Host-aug vs device-aug mAP equivalence (VERDICT r4 #3).

History: the original device recipe (hue -> channel gains, single-scale
unconstrained affine, photometric on mean-subtracted values) measurably
under-trained — round-5 experiment runs on the TPU chip
(tools/aug_map_parity.py, 5-class CLI oracle, 70 epochs): host 0.9995 vs
device 0.8333. A repeat showed the 70-epoch oracle itself is noisy (host
0.8313 on a second run — unseeded host RNG), so the recipe was rewritten
as a faithful distribution port (ops/augment_device.py round-5 docstring)
AND the protocol moved to saturation: at 120 epochs, measured 2026-08-20
on-chip: **host 1.0000, device 1.0000, delta 0.0** (docs/STATUS.md).

This test pins that result. Bars are slightly loose for backend noise:
both legs >= 0.95, |delta| <= 0.05.
"""

import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

pytestmark = pytest.mark.slow


def test_host_and_device_aug_reach_equivalent_map(tmp_path):
    from aug_map_parity import run_one

    epochs, lr_step = 120, 90
    map_host = run_one(False, str(tmp_path), epochs, lr_step)
    map_dev = run_one(True, str(tmp_path), epochs, lr_step)
    assert map_host >= 0.95, f"host-aug mAP {map_host}"
    assert map_dev >= 0.95, f"device-aug mAP {map_dev}"
    assert abs(map_host - map_dev) <= 0.05, (map_host, map_dev)
