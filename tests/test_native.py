"""Native C++ augmentation kernels vs the numpy oracle."""

import numpy as np
import pytest

from ssds_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_sample_crop_constraints_hold():
    boxes = np.array([[20, 30, 80, 90], [100, 10, 150, 110]], np.float32)
    from ssds_tpu.data.augment import _matrix_iou

    crops = 0
    for seed in range(300):
        r = native.sample_crop(boxes, 160, 120, seed)
        if r is None:
            continue
        crops += 1
        roi, mask = r
        assert 0 <= roi[0] < roi[2] <= 160
        assert 0 <= roi[1] < roi[3] <= 120
        # at least one center inside, mask correct
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2
        inside = np.logical_and(roi[:2] < centers, centers < roi[2:]).all(axis=1)
        np.testing.assert_array_equal(mask, inside)
        assert mask.any()
        # crop aspect/scale bounds from the recipe
        w, h = roi[2] - roi[0], roi[3] - roi[1]
        assert w >= 0.3 * 0.5 * 160 * 0.99 and h >= 0.3 * 0.5 * 120 * 0.99
    # mode None has probability 1/6; crops should dominate
    assert crops > 150


def test_crop_boxes_matches_numpy():
    boxes = np.array([[20, 30, 80, 90], [100, 10, 150, 110]], np.float32)
    roi = np.array([10, 20, 120, 100], np.float32)
    got = native.crop_boxes(boxes, roi)
    want = boxes.copy()
    want[:, :2] = np.maximum(want[:, :2], roi[:2]) - roi[:2]
    want[:, 2:] = np.minimum(want[:, 2:], roi[2:]) - roi[:2]
    np.testing.assert_allclose(got, want)


def test_passthrough_mode_occurs():
    boxes = np.array([[20, 30, 80, 90]], np.float32)
    nones = sum(native.sample_crop(boxes, 160, 120, s) is None for s in range(300))
    assert 20 < nones < 90  # ~1/6 of 300
