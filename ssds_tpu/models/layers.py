"""Shared flax building blocks for backbones and heads.

All blocks are NHWC (TPU-native layout) and take ``(x, train=False)`` so a
head can iterate a heterogeneous layer list uniformly. Convolution padding
follows the torch conventions of the reference models (explicit symmetric
padding) so feature-map sizes match the reference exactly — this pins the
anchor-set geometry (SURVEY.md §7 "hard parts": ceil-mode pooling / dilated
conv6 sizing).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# A LayerSpec is a zero-argument callable returning a linen Module; backbone
# builders return lists of these (the reference's nn.ModuleList equivalent).
LayerSpec = Callable[[], nn.Module]


class ReLU(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.relu(x)


class LeakyReLU(nn.Module):
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.leaky_relu(x, self.negative_slope)


class MaxPool(nn.Module):
    """2D max pool with torch-style ``ceil_mode`` support.

    Torch ceil-mode windows may extend past the input edge; equivalent to
    right/bottom padding with -inf. Reference VGG pool3 (ceil) turns 75 -> 38
    (lib/modeling/nets/vgg.py 'C' entry, SURVEY.md §2.5).
    """

    window: int = 2
    stride: int = 2
    padding: int = 0
    ceil_mode: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = self.window, self.stride, self.padding
        h, w = x.shape[1], x.shape[2]

        def edge_pad(size):
            if self.ceil_mode:
                out = math.ceil((size + 2 * p - k) / s) + 1
                # torch: last window must start inside the (left-padded) input
                if (out - 1) * s >= size + p:
                    out -= 1
            else:
                out = math.floor((size + 2 * p - k) / s) + 1
            return max((out - 1) * s + k - size - p, 0)

        pads = ((0, 0), (p, edge_pad(h)), (p, edge_pad(w)), (0, 0))
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), pads
        )


class Conv(nn.Module):
    """Plain conv (+ optional ReLU), torch-style explicit padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=x.dtype,
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/b, W/b, b*b*C], channel index (dy*b+dx)*C+c."""
    b_, h, w, c = x.shape
    x = x.reshape(b_, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b_, h // block, w // block, block * block * c)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b_, hs, ws, cs = x.shape
    c = cs // (block * block)
    x = x.reshape(b_, hs, ws, block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b_, hs * block, ws * block, c)


def expand_s2d_kernel(w: jnp.ndarray, block: int) -> jnp.ndarray:
    """Exact space-to-depth rewrite of a k3/s1/p1 conv kernel.

    Given ``w [3, 3, Cin, Cout]``, returns ``[3, 3, b²·Cin, b²·Cout]`` such
    that ``d2s(conv_p1(s2d(x, b), w_s2d)) == conv_p1(x, w)`` exactly: output
    position (b·Y+dy, b·X+dx) reads input row ``ry = dy+ky-1``, which lives
    in s2d tile ``KY = ry//b + 1`` at sub-row ``ry % b``. Zero-filled slots
    contribute nothing, so imported reference checkpoints keep their logits
    bit-for-bit (the MXU sees b²·Cin input lanes instead of Cin).
    """
    k, _, cin, cout = w.shape
    assert k == 3, "s2d rewrite implemented for 3x3 stride-1 pad-1 convs"
    out = jnp.zeros((3, 3, block * block * cin, block * block * cout), w.dtype)
    for dy in range(block):
        for dx in range(block):
            o0 = (dy * block + dx) * cout
            for ky in range(k):
                for kx in range(k):
                    ry, rx = dy + ky - 1, dx + kx - 1
                    KY, dyp = ry // block + 1, ry % block
                    KX, dxp = rx // block + 1, rx % block
                    i0 = (dyp * block + dxp) * cin
                    out = out.at[KY, KX, i0:i0 + cin, o0:o0 + cout].set(w[ky, kx])
    return out


class _ConvParams(nn.Module):
    """Bare kernel+bias holder with nn.Conv's param names/inits, so an
    S2DConv named like a Conv yields the IDENTICAL checkpoint tree."""

    shape: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],)) \
            if self.use_bias else None
        return w, b


class S2DConv(nn.Module):
    """Space-to-depth evaluation of a 3x3 s1 p1 conv (exact same function).

    The parameters ARE the plain conv's ``[3,3,Cin,Cout]`` kernel (at the
    same flax path as :class:`Conv`, via the inner ``Conv_0`` holder), so
    checkpoints are interchangeable with the plain stem; only the compute
    schedule changes: s2d(b) -> 3x3 conv with b²·Cin input channels -> d2s.
    Motivation: a 3-channel 300² stem conv uses 3/128 MXU input lanes
    (SURVEY.md §2.9 perf items; BENCH_NOTES round-1 profile).
    """

    features: int
    block: int = 2
    relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        w, b = _ConvParams((3, 3, cin, self.features), name="Conv_0")()
        ws = expand_s2d_kernel(w.astype(x.dtype), self.block)
        xs = space_to_depth(x, self.block)
        ys = jax.lax.conv_general_dilated(
            xs, ws, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = depth_to_space(ys, self.block)
        if b is not None:
            y = y + b.astype(y.dtype)
        if self.relu:
            y = nn.relu(y)
        return y


class ConvBNReLU(nn.Module):
    """conv → BN → activation; XLA fuses the chain into one kernel.

    The reference's ``conv_bn`` (lib/modeling/nets/mobilenet.py) and the
    conv-leaky-BN stacks of darknet share this block (act='leaky').
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    act: str = "relu"  # relu | relu6 | leaky | none

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=x.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=x.dtype
        )(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "relu6":
            x = jnp.minimum(nn.relu(x), 6.0)
        elif self.act == "leaky":
            x = nn.leaky_relu(x, 0.1)
        return x


class SepConvBNReLU(nn.Module):
    """Depthwise-separable conv: 3x3 depthwise BN act + 1x1 pointwise BN act.

    The reference's ``conv_dw`` (MobileNetV1 / SSDLite recipe,
    lib/modeling/nets/mobilenet.py, lib/modeling/ssds/ssd_lite.py).
    """

    features: int
    stride: int = 1
    padding: int = 1
    act: str = "relu"
    expand_kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBNReLU(
            in_ch, kernel=self.expand_kernel, stride=self.stride,
            padding=self.padding, groups=in_ch, act=self.act,
        )(x, train)
        x = ConvBNReLU(self.features, kernel=1, padding=0, act=self.act)(x, train)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2 block (reference ``InvertedResidual``): 1x1 expand →
    3x3 depthwise (stride) → 1x1 linear project, residual when shapes allow."""

    features: int
    stride: int = 1
    expand_ratio: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU(hidden, kernel=1, padding=0, act="relu6")(y, train)
        y = ConvBNReLU(
            hidden, kernel=3, stride=self.stride, padding=1, groups=hidden, act="relu6"
        )(y, train)
        y = ConvBNReLU(self.features, kernel=1, padding=0, act="none")(y, train)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class L2Norm(nn.Module):
    """Channelwise L2 normalization with a learned per-channel scale.

    Parity: reference ``lib/layers/modules/l2norm.py`` (init scale 20,
    applied to VGG conv4_3; SURVEY.md §2.4).
    """

    scale_init: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NOTE: explicit dtype — a weak-typed init (jnp.full without dtype)
        # changes aval after the first optimizer update and forces two extra
        # jit recompiles of the train step.
        gamma = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.scale_init, dtype=jnp.float32),
            (x.shape[-1],),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)) + self.eps
        return (x.astype(jnp.float32) / norm * gamma).astype(x.dtype)


class Sequential(nn.Module):
    """Run a list of LayerSpecs in order (torch nn.Sequential role)."""

    specs: Tuple[LayerSpec, ...]

    def setup(self):
        self.layers = [spec() for spec in self.specs]

    def __call__(self, x, train: bool = False):
        for layer in self.layers:
            x = layer(x, train)
        return x


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize (torch align_corners=False semantics via jax.image)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")
