import math

import numpy as np
import pytest

from ssds_tpu.ops.anchors import AnchorConfig, generate_anchors, num_anchors_per_cell

SSD300 = AnchorConfig(
    image_size=(300, 300),
    feature_maps=((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)),
    aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
    sizes=(0.1, 0.2, 0.37, 0.54, 0.71, 0.88, 1.05),  # classic SSD300 scales
    steps=(8, 16, 32, 64, 100, 300),
    clip=True,
)


def test_ssd300_anchor_count():
    anchors = generate_anchors(SSD300)
    # 38^2*4 + 19^2*6 + 10^2*6 + 5^2*6 + 3^2*4 + 1*4 = 8732 (SSD paper)
    assert anchors.shape == (8732, 4)
    assert num_anchors_per_cell(SSD300.aspect_ratios) == [4, 6, 6, 6, 4, 4]


def test_anchor_order_and_values_first_map():
    anchors = generate_anchors(SSD300)
    # First cell of map 0: center (0.5*8/300, 0.5*8/300)
    c = 0.5 * 8 / 300
    np.testing.assert_allclose(anchors[0], [c, c, 0.1, 0.1], atol=1e-6)
    s_prime = math.sqrt(0.1 * 0.2)
    np.testing.assert_allclose(anchors[1], [c, c, s_prime, s_prime], atol=1e-6)
    r = math.sqrt(2)
    np.testing.assert_allclose(anchors[2], [c, c, 0.1 * r, 0.1 / r], atol=1e-6)
    np.testing.assert_allclose(anchors[3], [c, c, 0.1 / r, 0.1 * r], atol=1e-6)
    # Second cell is one step to the RIGHT (row-major: j inner).
    c2x = 1.5 * 8 / 300
    np.testing.assert_allclose(anchors[4], [c2x, c, 0.1, 0.1], atol=1e-6)


def test_clip():
    anchors = generate_anchors(SSD300)
    assert anchors.min() >= 0.0 and anchors.max() <= 1.0
    unclipped = generate_anchors(
        AnchorConfig(**{**SSD300.__dict__, "clip": False})
    )
    assert unclipped.max() > 1.0  # the 1x1 map's max-scale box exceeds 1


def test_two_point_sizes_interpolation():
    cfg = AnchorConfig(
        image_size=(300, 300),
        feature_maps=((3, 3), (2, 2), (1, 1)),
        aspect_ratios=((2,), (2,), (2,)),
        sizes=(0.2, 0.8),
    )
    anchors = generate_anchors(cfg)
    assert anchors.shape == ((9 + 4 + 1) * 4, 4)
    # scales linspace(0.2, 0.8, 4) = [0.2, 0.4, 0.6, 0.8]
    np.testing.assert_allclose(anchors[0, 2:], [0.2, 0.2], atol=1e-6)
    np.testing.assert_allclose(anchors[9 * 4, 2:], [0.4, 0.4], atol=1e-6)


def test_auto_steps():
    cfg = AnchorConfig(
        image_size=(300, 300),
        feature_maps=((3, 3),),
        aspect_ratios=((2,),),
        sizes=(0.5, 0.7),
    )
    anchors = generate_anchors(cfg)
    # step = 100 -> first center at 50/300
    np.testing.assert_allclose(anchors[0, :2], [50 / 300, 50 / 300], atol=1e-6)


def test_bad_sizes_raises():
    with pytest.raises(ValueError):
        generate_anchors(
            AnchorConfig(
                image_size=(300, 300),
                feature_maps=((3, 3), (1, 1)),
                aspect_ratios=((2,), (2,)),
                sizes=(0.1, 0.2, 0.3, 0.4, 0.5),
            )
        )
