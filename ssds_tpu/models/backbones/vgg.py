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

from ssds_tpu.models.layers import (
    Conv, Identity, LayerSpec, MaxPool, ReLU, S2DBlockPool, S2DStemPairConv)

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "C", 512, 512, 512, "M", 512, 512, 512]


def vgg16(s2d_block: int = 0, s2d_stages: int = 1) -> List[LayerSpec]:
    """Build the SSD-VGG16 layer-spec list (35 entries, indices above).

    ``s2d_block == 2`` evaluates the stem (conv1_1, conv1_2, pool1) in 2x2
    space-to-depth tiling with the exact shifted-k2 kernel rewrite
    (:class:`S2DStemPairConv` / :class:`S2DBlockPool`) — same function,
    same checkpoint tree, same layer indices; only the MXU schedule
    changes. XLA runs 64-channel convs at ~1/7 roofline regardless of
    spatial size (tools/conv_shape_matrix.py); the tiled stem runs at
    256 channels and never pays a depth-to-space (cfg ``MODEL.S2D_STEM``).

    ``s2d_stages == 2`` additionally tiles stage 2 (conv2_1, conv2_2,
    pool2) with the same scheme: conv2_x then run at 256→512 lanes instead
    of 64→128/128→128 (cfg ``MODEL.S2D_STAGES``). The stage-2 first conv
    re-tiles from pool1's normal-space output (one 64-channel
    space-to-depth) and keeps XLA's autodiff wgrad (``custom_wgrad=False``
    — its 256-lane input dodges the bad emitter that motivated the
    hand-written stem wgrad). Exact (tested) but a measured NET REGRESSION
    on v5e (574 vs 661 img/s batch-32): conv2_x's 128 output channels
    already clear most of the codegen cliff, so the 16/9 FLOP inflation
    dominates — auto therefore resolves to stem-only (BENCH_NOTES r3)."""
    specs: List[LayerSpec] = []
    stem = _VGG16_CFG[:3]
    stage2 = _VGG16_CFG[3:6]
    rest = _VGG16_CFG[3:]
    if s2d_block >= 2:
        if s2d_block != 2:
            raise ValueError(
                "MODEL.S2D_STEM: the shifted-k2 stem rewrite is exact for "
                "block 2 only (a 3x3 conv's 4-row window spans >2 blocks "
                "for larger factors)")
        assert stem == [64, 64, "M"]
        specs += [
            lambda: S2DStemPairConv(64, first=True),
            lambda: ReLU(),
            lambda: S2DStemPairConv(64),
            # conv1_2's ReLU folds into the pool (pool∘relu == relu∘pool;
            # across the custom_vjp boundaries XLA can't fuse a standalone
            # relu with either neighbor, costing a full [B,H/2,W/2,4C]
            # materialization — round-3 profile). Identity keeps index 3.
            lambda: Identity(),
            lambda: S2DBlockPool(pre_relu=True),
        ]
        if s2d_stages >= 2:
            assert stage2 == [128, 128, "M"]
            specs += [
                lambda: S2DStemPairConv(128, first=True, custom_wgrad=False),
                lambda: ReLU(),
                lambda: S2DStemPairConv(128),
                lambda: Identity(),
                lambda: S2DBlockPool(pre_relu=True),
            ]
            rest = _VGG16_CFG[6:]
    else:
        rest = _VGG16_CFG
    for v in rest:
        if v == "M":
            specs.append(lambda: MaxPool(window=2, stride=2))
        elif v == "C":
            specs.append(lambda: MaxPool(window=2, stride=2, ceil_mode=True))
        else:
            ch = int(v)
            specs.append(lambda ch=ch: Conv(ch, kernel=3, padding=1))
            specs.append(lambda: ReLU())
    # SSD tail (reference vgg.py: pool5 + dilated conv6 + conv7).
    specs.append(lambda: MaxPool(window=3, stride=1, padding=1))
    specs.append(lambda: Conv(1024, kernel=3, padding=6, dilation=6))
    specs.append(lambda: ReLU())
    specs.append(lambda: Conv(1024, kernel=1, padding=0))
    specs.append(lambda: ReLU())
    return specs
