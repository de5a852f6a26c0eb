"""Visualization utilities smoke tests (tensorboardX writer into tmpdir)."""

import numpy as np

from ssds_tpu.utils.visualize import (
    draw_boxes,
    viz_feature_maps,
    viz_grads,
    viz_prior_box,
    viz_samples,
)


class _FakeWriter:
    def __init__(self):
        self.images = {}
        self.hists = {}

    def add_image(self, tag, img, step):
        assert img.ndim == 3 and img.shape[0] in (1, 3), img.shape
        self.images[tag] = img

    def add_histogram(self, tag, values, step):
        self.hists[tag] = np.asarray(values)


def test_draw_boxes_shapes():
    img = np.zeros((100, 200, 3), np.uint8)
    out = draw_boxes(img, np.array([[0.1, 0.1, 0.5, 0.5]]))
    assert out.shape == img.shape
    assert out.any()  # something was drawn


def test_viz_prior_box():
    w = _FakeWriter()
    priors = np.random.rand(100, 4).astype(np.float32) * 0.5 + 0.25
    viz_prior_box(w, priors, (300, 300))
    assert "priors/center_cells" in w.images


def test_viz_samples_and_features():
    w = _FakeWriter()

    class _Loader:
        def __iter__(self):
            yield {
                "images": np.random.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8),
                "boxes": np.array([[[0.1, 0.1, 0.6, 0.6]]] * 2, np.float32),
                "valid": np.ones((2, 1), bool),
            }

    viz_samples(w, _Loader())
    assert "samples/0" in w.images
    viz_feature_maps(w, [np.random.rand(1, 8, 8, 16)])
    assert "features/level0" in w.images
    viz_grads(w, {("layer", "kernel"): np.random.randn(4, 4)})
    assert w.hists
