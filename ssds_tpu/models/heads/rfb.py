"""RFB head: Receptive-Field-Block detector.

Behavioral spec source: reference ``lib/modeling/ssds/rfb.py`` (SURVEY.md
§2.5) / the RFBNet paper (arXiv:1711.07767): multi-branch blocks of 1x1/3x3
convs with increasing dilation plus an identity shortcut. ``BasicRFB_a``
(finer dilations, 1x3/3x1 factorized branches) replaces L2Norm on the
stride-8 source; ``BasicRFB`` blocks replace the plain extras.

FEATURE_LAYER vocabulary for RFB heads:

- ``int`` — tap the backbone layer output (source0 then passes BasicRFB_a);
- ``'R'`` — BasicRFB stride-1 block chained off the tail (RFBNet300's conv7
            → RFB source);
- ``'S'`` — BasicRFB stride-2 block (halve);
- ``''``  — plain 1x1 + 3x3 pad-0 conv pair (the 3→1 tail where dilated
            branches no longer fit).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ssds_tpu.models.heads.common import (
    MultiboxHead,
    conv_extra_spec,
    finalize,
    run_layers,
)
from ssds_tpu.models.layers import ConvBNReLU, LayerSpec, SepConvBNReLU, relu


class BasicRFB(nn.Module):
    """Three dilated branches + scaled residual (RFBNet paper Fig. 4 left)."""

    features: int
    stride: int = 1
    scale: float = 1.0
    visual: int = 1
    lite: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = max(self.features // 8, 8)

        def c(ch, k=3, s=1, p=1, d=1, act="relu"):
            return lambda y: ConvBNReLU(ch, kernel=k, stride=s, padding=p, dilation=d, act=act)(
                y, train
            )

        def sep(ch, s=1, p=1):
            return lambda y: SepConvBNReLU(ch, stride=s, padding=p)(y, train)

        conv3 = sep if self.lite else (lambda ch, s=1, p=1: c(ch, 3, s, p))
        b0 = c(2 * inter, 1, 1, 0)(x)
        b0 = c(2 * inter, 3, self.stride, self.visual, self.visual, act="none")(b0)

        b1 = c(inter, 1, 1, 0)(x)
        b1 = conv3(2 * inter, self.stride, 1)(b1)
        b1 = c(2 * inter, 3, 1, self.visual + 1, self.visual + 1, act="none")(b1)

        b2 = c(inter, 1, 1, 0)(x)
        b2 = conv3(inter * 3 // 2, 1, 1)(b2)
        b2 = conv3(2 * inter, self.stride, 1)(b2)
        b2 = c(2 * inter, 3, 1, 2 * self.visual + 1, 2 * self.visual + 1, act="none")(b2)

        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = c(self.features, 1, 1, 0, act="none")(out)
        # the reference always applies a learned 1x1 shortcut conv (BasicConv
        # relu=False) — never an identity — so weight import stays 1:1
        shortcut = c(self.features, 1, self.stride, 0, act="none")(x)
        return relu(out * self.scale + shortcut)


class BasicRFB_a(nn.Module):
    """Four-branch finer-grained RFB for the stride-8 map (paper Fig. 4 right):
    factorized 1x3 / 3x1 convs with dilations 1/3/3/5."""

    features: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.features // 4

        def c(ch, kh, kw, d=1, act="relu"):
            ph, pw = d * (kh - 1) // 2, d * (kw - 1) // 2
            def apply(y):
                y = nn.Conv(
                    ch, (kh, kw), padding=((ph, ph), (pw, pw)),
                    kernel_dilation=(d, d), use_bias=False, dtype=y.dtype,
                )(y)
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=y.dtype)(y)
                return relu(y) if act == "relu" else y
            return apply

        b0 = c(inter, 1, 1)(x)
        b0 = c(inter, 3, 3, d=1, act="none")(b0)

        b1 = c(inter, 1, 1)(x)
        b1 = c(inter, 3, 1)(b1)
        b1 = c(inter, 3, 3, d=3, act="none")(b1)

        b2 = c(inter, 1, 1)(x)
        b2 = c(inter, 1, 3)(b2)
        b2 = c(inter, 3, 3, d=3, act="none")(b2)

        b3 = c(inter // 2, 1, 1)(x)
        b3 = c((inter // 4) * 3, 1, 3)(b3)
        b3 = c(inter, 3, 1)(b3)
        b3 = c(inter, 3, 3, d=5, act="none")(b3)

        out = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        out = c(self.features, 1, 1, act="none")(out)
        # learned 1x1 shortcut, unconditional (reference parity — see BasicRFB)
        shortcut = c(self.features, 1, 1, act="none")(x)
        return relu(out * self.scale + shortcut)


class RFB(nn.Module):
    base: Tuple[LayerSpec, ...]
    extras: Tuple[LayerSpec, ...]
    taps: Tuple[int, ...]
    num_anchors: Tuple[int, ...]
    num_classes: int
    lite: bool = False

    def setup(self):
        self.base_layers = [s() for s in self.base]
        self.extra_layers = [s() for s in self.extras]
        self.norm = BasicRFB_a(512, scale=1.0)
        self.head = MultiboxHead(self.num_anchors, self.num_classes, lite=self.lite)

    def __call__(self, x, phase: str = "train", train: bool = False):
        sources, x = run_layers(self.base_layers, self.taps, x, train)
        if sources:
            sources[0] = self.norm(sources[0], train)
        for layer in self.extra_layers:
            x = layer(x, train)
            sources.append(x)
        if phase == "feature":
            return sources
        loc, conf = self.head(sources, train)
        return finalize(phase, loc, conf)


def rfb_extra_spec(kind: str, ch: int, lite: bool) -> LayerSpec:
    if kind == "R":
        return lambda: BasicRFB(ch, stride=1, scale=1.0, visual=2, lite=lite)
    if kind == "S":
        return lambda: BasicRFB(ch, stride=2, scale=1.0, visual=1, lite=lite)
    return conv_extra_spec(kind, ch)


def _build(base, feature_layer, mbox, num_classes, lite: bool) -> RFB:
    taps, extras = [], []
    for layer, ch in zip(feature_layer[0], feature_layer[1]):
        if isinstance(layer, int):
            taps.append(layer)
        else:
            extras.append(rfb_extra_spec(str(layer), int(ch), lite))
    return RFB(
        base=tuple(base),
        extras=tuple(extras),
        taps=tuple(taps),
        num_anchors=tuple(mbox),
        num_classes=num_classes,
        lite=lite,
    )


def build_rfb(base, feature_layer, mbox, num_classes) -> RFB:
    return _build(base, feature_layer, mbox, num_classes, lite=False)
