"""SSD-modified VGG16 backbone.

Behavioral spec source: reference ``lib/modeling/nets/vgg.py`` (SURVEY.md
§2.5): the classic layer-list builder from cfg
``[64,64,'M',128,128,'M',256,256,256,'C',512,512,512,'M',512,512,512]``
(ceil-mode pool3 via 'C'), plus the SSD tail: pool5 3x3 stride 1 pad 1,
dilated conv6 (k3, dilation 6, pad 6), conv7 1x1 — both 1024 channels.

Layer-index parity (the FEATURE_LAYER API): every conv and every ReLU is its
own list entry, exactly like the torch ``nn.ModuleList``, so the classic
``FEATURE_LAYER: [22, 34]`` taps (conv4_3 post-ReLU, conv7 post-ReLU) index
identically:

    idx 0..3   conv1_1 relu conv1_2 relu      idx 16     pool3 (ceil mode)
    idx 4      pool1                          idx 17..22 conv4_1..conv4_3+relus
    idx 5..8   conv2_*                        idx 23     pool4
    idx 9      pool2                          idx 24..29 conv5_*
    idx 10..15 conv3_*                        idx 30     pool5 (3x3 s1 p1)
                                              idx 31..34 conv6 relu conv7 relu

TPU-first notes: NHWC layout; ceil-mode pooling reproduced via explicit
-inf edge padding in :class:`ssds_tpu.models.layers.MaxPool` so the
38x38 first feature map (300 input) matches the reference geometry.
"""

from __future__ import annotations

from typing import List

from ssds_tpu.models.layers import Conv, LayerSpec, MaxPool, ReLU, S2DConv

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "C", 512, 512, 512, "M", 512, 512, 512]


def vgg16(s2d_block: int = 0) -> List[LayerSpec]:
    """Build the SSD-VGG16 layer-spec list (35 entries, indices above).

    ``s2d_block >= 2`` evaluates conv1_1 via the exact space-to-depth
    rewrite (:class:`S2DConv`) — same function, same checkpoint tree, same
    layer indices; only the MXU schedule of the 3-channel stem changes
    (cfg ``MODEL.S2D_STEM``)."""
    specs: List[LayerSpec] = []
    first_conv = True
    for v in _VGG16_CFG:
        if v == "M":
            specs.append(lambda: MaxPool(window=2, stride=2))
        elif v == "C":
            specs.append(lambda: MaxPool(window=2, stride=2, ceil_mode=True))
        else:
            ch = int(v)
            if first_conv and s2d_block >= 2:
                specs.append(lambda ch=ch: S2DConv(ch, block=s2d_block))
            else:
                specs.append(lambda ch=ch: Conv(ch, kernel=3, padding=1))
            first_conv = False
            specs.append(lambda: ReLU())
    # SSD tail (reference vgg.py: pool5 + dilated conv6 + conv7).
    specs.append(lambda: MaxPool(window=3, stride=1, padding=1))
    specs.append(lambda: Conv(1024, kernel=3, padding=6, dilation=6))
    specs.append(lambda: ReLU())
    specs.append(lambda: Conv(1024, kernel=1, padding=0))
    specs.append(lambda: ReLU())
    return specs
