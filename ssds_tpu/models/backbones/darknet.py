"""DarkNet backbones (19 and 53) for the YOLO heads.

Behavioral spec source: reference ``lib/modeling/nets/darknet.py`` (SURVEY.md
§2.5): darknet_19 = conv-leaky-BN stacks with maxpools; darknet_53 =
conv-leaky-BN stem + residual stages.

Layer-index parity (FEATURE_LAYER API):

    darknet_19: flat conv/pool list —
      idx: 0 conv32 | 1 pool | 2 conv64 | 3 pool | 4..6 conv128 stack | 7 pool
      | 8..10 conv256 stack | 11 pool | 12..16 conv512 stack (/16) | 17 pool
      | 18..22 conv1024 stack (/32). YOLOv2 taps [16, 22].
    darknet_53: idx 0 = stem conv32; then per stage one downsample conv entry
      followed by one entry per residual block:
      idx 1 down64 | 2 res | 3 down128 | 4,5 res | 6 down256 | 7..14 res(8)
      | 15 down512 | 16..23 res(8) | 24 down1024 | 25..28 res(4).
      YOLOv3 taps [14, 23, 28] (strides 8, 16, 32).
"""

from __future__ import annotations

from typing import List

from flax import linen as nn

from ssds_tpu.models.layers import ConvBNReLU, LayerSpec, MaxPool


class DarkResidual(nn.Module):
    """darknet_53 residual: 1x1 half-channels → 3x3 full + identity."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNReLU(self.features // 2, kernel=1, padding=0, act="leaky")(x, train)
        y = ConvBNReLU(self.features, kernel=3, padding=1, act="leaky")(y, train)
        return x + y


def darknet_19() -> List[LayerSpec]:
    def conv(ch, k):
        return lambda: ConvBNReLU(ch, kernel=k, padding=k // 2, act="leaky")

    pool = lambda: MaxPool(window=2, stride=2)
    specs: List[LayerSpec] = [conv(32, 3), pool, conv(64, 3), pool]
    specs += [conv(128, 3), conv(64, 1), conv(128, 3), pool]
    specs += [conv(256, 3), conv(128, 1), conv(256, 3), pool]
    specs += [conv(512, 3), conv(256, 1), conv(512, 3), conv(256, 1), conv(512, 3), pool]
    specs += [conv(1024, 3), conv(512, 1), conv(1024, 3), conv(512, 1), conv(1024, 3)]
    return specs


def darknet_53() -> List[LayerSpec]:
    specs: List[LayerSpec] = [lambda: ConvBNReLU(32, kernel=3, padding=1, act="leaky")]
    for ch, n_blocks in ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)):
        specs.append(lambda ch=ch: ConvBNReLU(ch, kernel=3, stride=2, padding=1, act="leaky"))
        for _ in range(n_blocks):
            specs.append(lambda ch=ch: DarkResidual(ch))
    return specs
