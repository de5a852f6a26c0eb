"""Shared head scaffolding: extras construction, multibox convs, phase dispatch.

Behavioral spec source: reference ``lib/modeling/ssds/ssd.py`` helpers
(``add_extras`` / ``multibox``; SURVEY.md §2.5). The FEATURE_LAYER vocabulary
shared by all heads:

- ``int``  — tap the output of that backbone layer index as a source;
- ``'S'``  — extra block: 1x1 conv (ch//2) then 3x3 stride-2 pad-1 conv (ch),
             halving the map;
- ``''``   — extra block: 1x1 conv (ch//2) then 3x3 pad-0 conv (ch),
             shrinking the map by 2 (the classic SSD300 3→1 tail).

Phase dispatch (reference ``SSD.forward(x, phase)``):
- ``'feature'`` → list of pyramid feature maps (used for shape inference);
- ``'train'``   → ``(loc [B,K,4], conf [B,K,C])`` raw logits;
- ``'eval'``    → ``(loc, softmax(conf))``.

TPU-first notes: NHWC throughout; the ``[B,H,W,A*4] → [B,H*W*A,4]`` reshape
is row-major and matches the anchor order produced by
:func:`ssds_tpu.ops.anchors.generate_anchors`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssds_tpu.models.layers import (
    Conv, LayerSpec, SepConvBNReLU, Sequential, _ConvParams)


def split_feature_layer(feature_layer) -> Tuple[List[int], List[Tuple[str, int]]]:
    """Split FEATURE_LAYER into backbone taps and extra-block specs."""
    taps: List[int] = []
    extras: List[Tuple[str, int]] = []
    for layer, ch in zip(feature_layer[0], feature_layer[1]):
        if isinstance(layer, int):
            taps.append(layer)
        else:
            extras.append((str(layer), int(ch)))
    return taps, extras


def conv_extra_spec(kind: str, ch: int) -> LayerSpec:
    """Plain-conv extra block ('S' or '') per the vocabulary above."""
    if kind == "S":
        return lambda: Sequential(
            (
                lambda: Conv(ch // 2, kernel=1, padding=0, relu=True),
                lambda: Conv(ch, kernel=3, stride=2, padding=1, relu=True),
            )
        )
    return lambda: Sequential(
        (
            lambda: Conv(ch // 2, kernel=1, padding=0, relu=True),
            lambda: Conv(ch, kernel=3, padding=0, relu=True),
        )
    )


def sep_extra_spec(kind: str, ch: int) -> LayerSpec:
    """Depthwise-separable extra block (the *_lite variants, reference
    ``lib/modeling/ssds/ssd_lite.py`` conv_dw extras)."""
    if kind == "S":
        return lambda: Sequential(
            (
                lambda: Conv(ch // 2, kernel=1, padding=0, relu=True),
                lambda: SepConvBNReLU(ch, stride=2, padding=1),
            )
        )
    return lambda: Sequential(
        (
            lambda: Conv(ch // 2, kernel=1, padding=0, relu=True),
            lambda: SepConvBNReLU(ch, stride=1, padding=0),
        )
    )


class _PredParams(nn.Module):
    """Kernel+bias holder reproducing :class:`Conv`'s param paths
    (``<name>/Conv_0/{kernel,bias}``) without running its conv — the
    fused-prediction path below declares loc/conf params separately (same
    checkpoint tree, same per-path init RNG → bit-identical init) but runs
    ONE conv over their trace-time concatenation."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return _ConvParams(self.shape, name="Conv_0")()


class MultiboxHead(nn.Module):
    """Per-source loc/conf prediction convs + flatten/concat.

    ``lite=False``: 3x3 pad-1 plain convs (reference ``multibox``) — run
    as ONE conv per source over the channel-concatenated loc|conf kernels
    (exact: convolution is linear in output channels; the split back is a
    lane slice). Rationale: every per-source prediction conv is sub-128
    output channels (16–84 at SSD300), the measured XLA cliff shape
    (tools/conv_shape_matrix.py); fused they run at 100–150 lanes, and
    fwd/dgrad/wgrad kernel counts halve.
    ``lite=True``: depthwise 3x3 + pointwise 1x1 (SSDLite recipe).
    """

    num_anchors: Tuple[int, ...]
    num_classes: int
    lite: bool = False

    @nn.compact
    def __call__(self, sources: Sequence[jnp.ndarray], train: bool = False):
        locs, confs = [], []
        for k, (x, a) in enumerate(zip(sources, self.num_anchors)):
            if self.lite:
                loc = Conv(x.shape[-1], kernel=3, padding=1, groups=x.shape[-1],
                           name=f"loc_dw{k}")(x, train)
                loc = Conv(a * 4, kernel=1, padding=0, name=f"loc_pw{k}")(loc, train)
                conf = Conv(x.shape[-1], kernel=3, padding=1, groups=x.shape[-1],
                            name=f"conf_dw{k}")(x, train)
                conf = Conv(a * self.num_classes, kernel=1, padding=0,
                            name=f"conf_pw{k}")(conf, train)
            else:
                cin = x.shape[-1]
                wl, bl = _PredParams((3, 3, cin, a * 4), name=f"loc{k}")()
                wc, bc = _PredParams(
                    (3, 3, cin, a * self.num_classes), name=f"conf{k}")()
                if wl.dtype == jnp.int8:
                    # int8 serving path (ssds_tpu/quant.py): the loc|conf
                    # concat of int8 kernels is still one MXU conv; the
                    # per-cout scales were concatenated in the same order
                    # by quantize_variables.
                    from ssds_tpu import quant as _q

                    s_x = self.get_variable("quant", f"act_scale_src{k}")
                    acc = _q.int8_conv(
                        _q.quantize_act(x, s_x),
                        jnp.concatenate([wl, wc], axis=-1),
                        stride=(1, 1), padding=((1, 1), (1, 1)))
                    y = _q.dequant(
                        acc, s_x, self.get_variable("quant", f"w_scale_src{k}"),
                        jnp.concatenate([bl, bc]), x.dtype)
                else:
                    # zero-sized source guard: see layers.Conv's sow
                    if not self.is_initializing() and x.size > 0:
                        self.sow("quant_calib", f"act_absmax_src{k}",
                                 jnp.max(jnp.abs(x.astype(jnp.float32))))
                    w = jnp.concatenate([wl, wc], axis=-1).astype(x.dtype)
                    bias = jnp.concatenate([bl, bc]).astype(x.dtype)
                    y = jax.lax.conv_general_dilated(
                        x, w, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
                loc, conf = y[..., :a * 4], y[..., a * 4:]
            b = x.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, self.num_classes))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)


def finalize(phase: str, loc: jnp.ndarray, conf: jnp.ndarray):
    """Phase-dependent output packaging (train: raw; eval: softmaxed conf;
    joint: both from ONE forward — the single-pass eval epoch's contract)."""
    if phase == "eval":
        return loc.astype(jnp.float32), jax.nn.softmax(conf.astype(jnp.float32), axis=-1)
    if phase == "joint":
        return (loc, conf), (
            loc.astype(jnp.float32),
            jax.nn.softmax(conf.astype(jnp.float32), axis=-1),
        )
    return loc, conf


def run_layers(layers, taps, x, train: bool):
    """Run a backbone layer list, collecting tapped sources."""
    sources = []
    tapset = set(taps)
    for i, layer in enumerate(layers):
        x = layer(x, train)
        if i in tapset:
            sources.append(x)
    return sources, x
