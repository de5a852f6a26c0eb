"""ResNet backbones (18/34/50/101), truncated to feature extractors.

Behavioral spec source: reference ``lib/modeling/nets/resnet.py`` (SURVEY.md
§2.5): torchvision-style BasicBlock/Bottleneck builders truncated to a
feature-extractor ModuleList.

Layer-index parity (the FEATURE_LAYER API for this repo's configs): the list
is FLAT — entry 0 is the stem (7x7 conv s2 + BN + ReLU + 3x3 maxpool s2),
then one entry per residual block, in stage order:

    resnet_18:  stem, 2+2+2+2 blocks  -> 9 entries,  stage ends at 2,4,6,8
    resnet_34:  stem, 3+4+6+3 blocks  -> 17 entries, stage ends at 3,7,13,16
    resnet_50:  stem, 3+4+6+3 blocks  -> 17 entries (Bottleneck, 4x channels)
    resnet_101: stem, 3+4+23+3 blocks -> 34 entries, stage ends at 3,7,30,33

Strides: stem /4, stage2 /8, stage3 /16, stage4 /32. SSD300 configs tap the
stage-2 end (stride 8, 38x38) and stage-3 end (stride 16, 19x19).
"""

from __future__ import annotations

from typing import List

from flax import linen as nn

from ssds_tpu.models.layers import ConvBNReLU, LayerSpec, MaxPool, relu


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (torchvision BasicBlock)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNReLU(self.features, kernel=3, stride=self.stride, padding=1)(x, train)
        y = ConvBNReLU(self.features, kernel=3, padding=1, act="none")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBNReLU(self.features, kernel=1, stride=self.stride, padding=0, act="none")(
                x, train
            )
        return relu(y + x)


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 → 1x1 expand (4x) + shortcut (torchvision Bottleneck)."""

    features: int  # bottleneck width; output is features * 4
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        y = ConvBNReLU(self.features, kernel=1, padding=0)(x, train)
        y = ConvBNReLU(self.features, kernel=3, stride=self.stride, padding=1)(y, train)
        y = ConvBNReLU(out_ch, kernel=1, padding=0, act="none")(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = ConvBNReLU(out_ch, kernel=1, stride=self.stride, padding=0, act="none")(x, train)
        return relu(y + x)


class _Stem(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(64, kernel=7, stride=2, padding=3)(x, train)
        return MaxPool(window=3, stride=2, padding=1)(x, train)


def _resnet(block, stage_blocks) -> List[LayerSpec]:
    specs: List[LayerSpec] = [lambda: _Stem()]
    widths = (64, 128, 256, 512)
    for stage, (width, n) in enumerate(zip(widths, stage_blocks)):
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            specs.append(lambda w=width, s=stride, blk=block: blk(w, stride=s))
    return specs


def resnet_18() -> List[LayerSpec]:
    return _resnet(BasicBlock, (2, 2, 2, 2))


def resnet_34() -> List[LayerSpec]:
    return _resnet(BasicBlock, (3, 4, 6, 3))


def resnet_50() -> List[LayerSpec]:
    return _resnet(Bottleneck, (3, 4, 6, 3))


def resnet_101() -> List[LayerSpec]:
    return _resnet(Bottleneck, (3, 4, 23, 3))
