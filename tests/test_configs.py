"""Every shipped experiment config must build: yaml → cfg → model →
feature maps → anchors. Uses only abstract evaluation (eval_shape), so the
whole acceptance matrix is checked in seconds."""

import glob
import os

import pytest

from ssds_tpu.config import cfg_from_file
from ssds_tpu.models.builder import create_model, create_priors

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFGS = sorted(glob.glob(os.path.join(REPO, "experiments", "cfgs", "*.yml")))


@pytest.mark.parametrize("path", CFGS, ids=[os.path.basename(p) for p in CFGS])
def test_config_builds(path):
    cfg = cfg_from_file(path)
    model, fmaps = create_model(cfg.MODEL)
    assert len(fmaps) >= 1
    # strictly decreasing pyramid
    sizes = [h * w for h, w in fmaps]
    assert sizes == sorted(sizes, reverse=True)
    if not str(cfg.MODEL.SSDS).startswith("yolo"):
        assert len(fmaps) == len(cfg.MODEL.ASPECT_RATIOS)
        priors = create_priors(cfg.MODEL, fmaps)
        assert priors.shape[0] > 0 and priors.shape[1] == 4
        assert (priors >= 0).all() and (priors <= 1).all()


def test_classic_geometries():
    cfg = cfg_from_file(os.path.join(REPO, "experiments/cfgs/ssd_vgg16_train_voc.yml"))
    _, fmaps = create_model(cfg.MODEL)
    assert fmaps == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    assert create_priors(cfg.MODEL, fmaps).shape == (8732, 4)

    cfg = cfg_from_file(os.path.join(REPO, "experiments/cfgs/ssd_vgg16_train_voc_512.yml"))
    _, fmaps = create_model(cfg.MODEL)
    assert fmaps == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    assert create_priors(cfg.MODEL, fmaps).shape == (24564, 4)  # canonical SSD512
