"""Shared flax building blocks for backbones and heads.

All blocks are NHWC (TPU-native layout) and take ``(x, train=False)`` so a
head can iterate a heterogeneous layer list uniformly. Convolution padding
follows the torch conventions of the reference models (explicit symmetric
padding) so feature-map sizes match the reference exactly — this pins the
anchor-set geometry (SURVEY.md §7 "hard parts": ceil-mode pooling / dilated
conv6 sizing).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# A LayerSpec is a zero-argument callable returning a linen Module; backbone
# builders return lists of these (the reference's nn.ModuleList equivalent).
LayerSpec = Callable[[], nn.Module]


@jax.custom_vjp
def relu(x):
    """ReLU whose VJP keys on the OUTPUT instead of the input.

    ``jnp.maximum(x, 0)``'s autodiff residual is the pre-activation, so in
    a conv→relu chain XLA materializes BOTH tensors (the round-3 step
    profile shows ~1.1 ms two-output ``broadcast_maximum`` fusions after
    every large conv, ~3.5 ms/step at SSD300 batch 32). ``out > 0`` is
    equivalent to ``x > 0`` when ``out = max(x, 0)`` (and torch's
    ``relu'(0) == 0`` matches), so keying the backward on the output lets
    the forward keep a single tensor that the next conv's wgrad needs
    anyway."""
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, (y,)


def _relu_bwd(res, g):
    (y,) = res
    return (jnp.where(y > 0, g, 0).astype(g.dtype),)


relu.defvjp(_relu_fwd, _relu_bwd)


@jax.custom_vjp
def relu6(x):
    """relu6 with an output-keyed VJP (see :func:`relu`); grad passes only
    where 0 < y < 6 (torch semantics at both kinks)."""
    return jnp.minimum(jnp.maximum(x, 0), 6.0)


def _relu6_fwd(x):
    y = jnp.minimum(jnp.maximum(x, 0), 6.0)
    return y, (y,)


def _relu6_bwd(res, g):
    (y,) = res
    return (jnp.where((y > 0) & (y < 6), g, 0).astype(g.dtype),)


relu6.defvjp(_relu6_fwd, _relu6_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def leaky_relu(x, slope=0.1):
    """leaky relu with an output-keyed VJP (see :func:`relu`): the sign of
    ``y`` determines the branch for any ``slope > 0``."""
    return jnp.where(x > 0, x, slope * x)


def _leaky_fwd(x, slope):
    y = jnp.where(x > 0, x, slope * x)
    return y, (y,)


def _leaky_bwd(slope, res, g):
    (y,) = res
    return (jnp.where(y > 0, g, slope * g).astype(g.dtype),)


leaky_relu.defvjp(_leaky_fwd, _leaky_bwd)


class ReLU(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return relu(x)


class Identity(nn.Module):
    """Positional placeholder keeping layer-index parity when an adjacent
    layer absorbs this slot's op (e.g. the stem ReLU folded into
    :class:`S2DBlockPool` — ``pool(relu(x)) == relu(pool(x))``)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class LeakyReLU(nn.Module):
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return leaky_relu(x, self.negative_slope)


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
    """Plain conv (+ optional ReLU), torch-style explicit padding.

    Serving-time int8 (ssds_tpu/quant.py): when the checkpoint kernel's
    dtype is int8 (produced by ``quant.quantize_variables``), the forward
    runs ``s8 x s8 -> s32`` on the MXU with a float dequant epilogue —
    same param tree, the dtype is the switch. During calibration (apply
    with ``mutable=['quant_calib']``) the input absmax is sow'd; otherwise
    the sow is a no-op and XLA DCEs the stat.
    """

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
        sub = (self.get_variable("params", "Conv_0")
               if self.has_variable("params", "Conv_0") else None)
        if sub is not None and sub["kernel"].dtype == jnp.int8:
            from ssds_tpu import quant as _q

            acc = _q.int8_conv(
                _q.quantize_act(x, self.get_variable("quant", "act_scale")),
                sub["kernel"], stride=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                dilation=(self.dilation, self.dilation), groups=self.groups)
            x = _q.dequant(acc, self.get_variable("quant", "act_scale"),
                           self.get_variable("quant", "w_scale"),
                           sub.get("bias") if self.use_bias else None, x.dtype)
        else:
            # x.size == 0: a zero-sized feature map (tiny test IMAGE_SIZE
            # can shrink a deep pyramid level to nothing) — jnp.max has no
            # identity on empty arrays, and such a level contributes no
            # calibration signal anyway.
            if not self.is_initializing() and x.size > 0:
                self.sow("quant_calib", "act_absmax",
                         jnp.max(jnp.abs(x.astype(jnp.float32))))
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                dtype=x.dtype,
                name="Conv_0",
            )(x)
        if self.relu:
            x = relu(x)
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
    S2DStemPairConv named like a Conv yields the IDENTICAL checkpoint tree."""

    shape: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],)) \
            if self.use_bias else None
        return w, b


def expand_s2d_kernel_k2(w: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Shifted-tiling 2x2 rewrite of a k3/s1/p1 conv kernel (stem scheme).

    Returns ``[2, 2, 4·Cin, 4·Cout]`` such that a VALID 2x2 conv between
    *alternating* space-to-depth tilings computes the original conv exactly:
    the input tiling's block ``K`` holds logical rows ``{2K+s, 2K+1+s}`` and
    the output tiling's block ``Y`` rows ``{2Y+s+1, 2Y+s+2}`` for any shift
    ``s`` — an output row ``r`` reads input rows ``r-1..r+1``, a 4-row
    window covering exactly two input blocks, hence kernel size 2 (vs 3 for
    the same-tiling rewrite, 16/9 vs 4x FLOP inflation). Index algebra:
    ``ky = 2·KY + py - dy`` (and likewise for x), zero outside ``0..2``.

    Why: XLA's TPU conv codegen runs 64-channel convs at ~1/7 of the MXU
    roofline regardless of spatial size (tools/conv_shape_matrix.py);
    evaluating the VGG stem in 4·C-channel tiled space recovers full MXU
    throughput (BENCH_NOTES round-2).
    """
    k, _, cin, cout = w.shape
    assert k == 3 and block == 2, "k2 rewrite derived for 3x3 convs, block 2"
    out = jnp.zeros((2, 2, 4 * cin, 4 * cout), w.dtype)
    for dy in range(2):
        for dx in range(2):
            o0 = (dy * 2 + dx) * cout
            for KY in range(2):
                for KX in range(2):
                    for py in range(2):
                        for px in range(2):
                            ky, kx = 2 * KY + py - dy, 2 * KX + px - dx
                            if 0 <= ky < 3 and 0 <= kx < 3:
                                i0 = (py * 2 + px) * cin
                                out = out.at[
                                    KY, KX, i0:i0 + cin, o0:o0 + cout
                                ].set(w[ky, kx])
    return out


@jax.custom_vjp
def _conv2x2_valid(xs, w2):
    """VALID 2x2 NHWC conv with a hand-written backward.

    XLA's autodiff wgrad for the *first* stem conv (12 input channels)
    picks the ``EmitInputBatchInLanes`` emitter, which needs the whole
    [B,151,151,256] cotangent spatially reversed first — a 1.1 ms pure
    data-movement ``reverse`` plus a 0.54 ms conv for an 18-GFLOP job
    (round-3 step profile). This VJP computes the same wgrad as ONE
    dot_general over four shifted input slices (reads the cotangent once,
    no reverse), and the dgrad as the standard flipped-kernel VALID conv.
    The dgrad branch is dead code when the input is the image (no image
    gradients anywhere in training) and XLA eliminates it."""
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv2x2_valid_fwd(xs, w2):
    return _conv2x2_valid(xs, w2), (xs, w2)


def _conv2x2_valid_bwd(res, dy):
    xs, w2 = res
    ho, wo = dy.shape[1], dy.shape[2]
    ci = xs.shape[-1]
    # dgrad: pad-by-1 then VALID conv with the spatially-flipped,
    # in/out-transposed kernel (textbook transposed convolution).
    wt = jnp.flip(w2, axis=(0, 1)).swapaxes(2, 3)
    dxs = jax.lax.conv_general_dilated(
        jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0))), wt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # wgrad: dw[ky,kx,i,o] = sum_{b,y,x} xs[b,y+ky,x+kx,i] * dy[b,y,x,o].
    # Concatenating the four (ky,kx) slices lets one dot_general read the
    # cotangent a single time (concat lowers fine on TPU; it is the
    # transposes that relayout — BENCH_NOTES round-1 S2D study).
    xcat = jnp.concatenate(
        [xs[:, ky:ky + ho, kx:kx + wo, :] for ky in range(2) for kx in range(2)],
        axis=-1)
    dw = jax.lax.dot_general(
        xcat, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.float32)
    return dxs, dw.reshape(2, 2, ci, dy.shape[-1]).astype(w2.dtype)


_conv2x2_valid.defvjp(_conv2x2_valid_fwd, _conv2x2_valid_bwd)


class S2DStemPairConv(nn.Module):
    """One of the two VGG stem convs evaluated in 2x2 space-to-depth tiling.

    The parameters ARE the plain conv's ``[3,3,Cin,Cout]`` kernel (at the
    same flax path as :class:`Conv`, via the inner ``Conv_0`` holder), so
    checkpoints and the torch importer are untouched; only the compute
    schedule changes. ``first=True`` takes the normal-space image, tiles it
    (aligned), and emits the *shifted* tiling ``[H/2+1, W/2+1, 4·C]`` whose
    out-of-range border sub-rows are zeroed (they are exactly the next
    conv's SAME padding). ``first=False`` consumes that shifted tiling and
    emits the aligned tiling ``[H/2, W/2, 4·C]``. Chained as
    conv→relu→conv→relu→:class:`S2DBlockPool`, the stem never leaves tiled
    space, so no depth-to-space transpose exists anywhere — the reassembly
    cost that sank the round-1 same-tiling S2D stem (BENCH_NOTES).
    """

    features: int
    first: bool = False
    block: int = 2
    # Hand-written wgrad (see _conv2x2_valid): a win only for tiny input
    # channel counts where XLA picks the cotangent-reversing
    # EmitInputBatchInLanes emitter (the 12-lane image conv); for wider
    # first-convs (stage 2's 256-lane input) the autodiff wgrad is already
    # emitted well and the xcat concat would quadruple the read volume.
    custom_wgrad: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.block
        cin = x.shape[-1] if self.first else x.shape[-1] // (b * b)
        w, bias = _ConvParams((3, 3, cin, self.features), name="Conv_0")()
        w2 = expand_s2d_kernel_k2(w.astype(x.dtype), b)
        if self.first:
            xs = space_to_depth(x, b)
            xs = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
            # custom wgrad: kills the [B,H+1,W+1,4C] cotangent reverse that
            # XLA's emitter choice inserts for the 12-input-channel conv
            # (not used for the second conv, whose 4C-in xcat would be 4x
            # the tensor and whose autodiff wgrad is already at roofline).
            if self.custom_wgrad:
                y = _conv2x2_valid(xs, w2)
            else:
                y = jax.lax.conv_general_dilated(
                    xs, w2, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        else:
            xs = x
            y = jax.lax.conv_general_dilated(
                xs, w2, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + jnp.tile(bias, b * b).astype(y.dtype)
        if self.first:
            # Zero the logical rows -1/H (cols -1/W) that the shifted tiling
            # carries at its borders: group dy=0 of the first block row is
            # logical row -1, group dy=1 of the last is row H. They are the
            # second conv's SAME-padding zeros (relu keeps them zero). Built
            # as a broadcast over the channel axis — a reshape to split the
            # 4·C minor dim costs a lane relayout of the whole tensor
            # (tools/s2d_stem_bench.py v2 vs v3).
            _, hs, ws_, _ = y.shape
            row = jnp.arange(hs)[:, None, None]
            col = jnp.arange(ws_)[None, :, None]
            g = jnp.repeat(jnp.arange(b * b), self.features)[None, None, :]
            gy, gx = g // b, g % b
            mask = ((row > 0) | (gy != 0)) & ((row < hs - 1) | (gy != 1)) & \
                   ((col > 0) | (gx != 0)) & ((col < ws_ - 1) | (gx != 1))
            y = jnp.where(mask[None], y, 0)
        return y


@jax.custom_vjp
def _group_max4(x):
    """Max over 4 equal channel groups: ``[..., 4C] -> [..., C]``.

    Custom VJP: jnp.maximum's tie-splitting gradient (grad / #maxima) lowers
    to ~4.6 ms/step of divide+select fusions at stem scale; first-max-wins
    routing (torch maxpool backward semantics — the parity target anyway)
    is pure compare+select."""
    c = x.shape[-1] // 4
    return jnp.maximum(jnp.maximum(x[..., :c], x[..., c:2 * c]),
                       jnp.maximum(x[..., 2 * c:3 * c], x[..., 3 * c:]))


def _group_max4_fwd(x):
    c = x.shape[-1] // 4
    x0, x1 = x[..., :c], x[..., c:2 * c]
    x2, x3 = x[..., 2 * c:3 * c], x[..., 3 * c:]
    m01 = jnp.maximum(x0, x1)
    m23 = jnp.maximum(x2, x3)
    out = jnp.maximum(m01, m23)
    # First-max-wins winner index, stored int8 (1/8 of keeping x). The index
    # is derived as a pairwise TOURNAMENT with left-biased ties — equivalent
    # to scanning groups 0..3 for the first maximum (torch maxpool backward
    # semantics) — rather than comparing each group against `out`: an
    # out-dependent index chain forced XLA to evaluate the pool forward
    # twice (a value-only pass for the forward continuation plus a
    # value+index pass, 3.3 ms combined at stem scale, round-3 profile);
    # the tournament shares only the cheap compares with `out`.
    left = m01 >= m23
    idx = jnp.where(left,
                    jnp.where(x0 >= x1, jnp.int8(0), jnp.int8(1)),
                    jnp.where(x2 >= x3, jnp.int8(2), jnp.int8(3)))
    # Materialize value+index from ONE fused pass: without the barrier XLA
    # sibling-duplicates the tournament — a value-only fusion for the
    # forward continuation plus a value+index fusion (2× the 230 MB read,
    # round-3 profile).
    out, idx = jax.lax.optimization_barrier((out, idx))
    return out, (idx,)


def _group_max4_bwd(res, g):
    (idx,) = res
    grads = [jnp.where(idx == jnp.int8(i), g, 0) for i in range(4)]
    return (jnp.concatenate(grads, axis=-1),)


_group_max4.defvjp(_group_max4_fwd, _group_max4_bwd)


@jax.custom_vjp
def _group_max4_relu(x):
    """relu folded into the group max: ``relu(pool(x)) == pool(relu(x))``
    (relu is monotonic and order-preserving on the positives, and a
    non-positive pool max means every group was non-positive). Folding
    erases the standalone stem ReLU's [B,150,150,4C] materialization
    (~2 ms/step at SSD300 batch 32 — round-3 profile: the tiled-stem relu
    can't fuse into either neighbor across the custom_vjp boundaries)."""
    c = x.shape[-1] // 4
    m = jnp.maximum(jnp.maximum(x[..., :c], x[..., c:2 * c]),
                    jnp.maximum(x[..., 2 * c:3 * c], x[..., 3 * c:]))
    return jnp.maximum(m, 0)


def _group_max4_relu_fwd(x):
    c = x.shape[-1] // 4
    x0, x1 = x[..., :c], x[..., c:2 * c]
    x2, x3 = x[..., 2 * c:3 * c], x[..., 3 * c:]
    m01 = jnp.maximum(x0, x1)
    m23 = jnp.maximum(x2, x3)
    m = jnp.maximum(m01, m23)
    left = m01 >= m23
    idx = jnp.where(left,
                    jnp.where(x0 >= x1, jnp.int8(0), jnp.int8(1)),
                    jnp.where(x2 >= x3, jnp.int8(2), jnp.int8(3)))
    # relu'(0) == 0 (torch semantics): a non-positive max routes gradient
    # nowhere — encode as dead index 4 so the backward stays one compare.
    idx = jnp.where(m > 0, idx, jnp.int8(4))
    out = jnp.maximum(m, 0)
    # Known residual cost, measured and accepted (round-4 step profile):
    # XLA sibling-splits this two-output barrier into a value fusion and
    # an index fusion, each re-reading the 4c stem output (1.36 + 1.13 ms
    # at SSD300 batch-32 stem scale). Packing value+index into ONE
    # [..., 2c] bf16 buffer behind the barrier does force a single pass,
    # but the concat write + downstream slice/convert copies cost MORE
    # than the saved read (47.32 vs 46.53 ms/step device time) — reverted.
    out, idx = jax.lax.optimization_barrier((out, idx))
    return out, (idx,)


def _group_max4_relu_bwd(res, g):
    (idx,) = res
    grads = [jnp.where(idx == jnp.int8(i), g, 0) for i in range(4)]
    return (jnp.concatenate(grads, axis=-1),)


_group_max4_relu.defvjp(_group_max4_relu_fwd, _group_max4_relu_bwd)


class S2DBlockPool(nn.Module):
    """pool1 evaluated in aligned 2x2 tiling: a 2x2/s2 max pool is exactly
    the max over the 4 sub-position channel groups, landing back in normal
    space at ``[H/2, W/2, C]`` with zero data movement (replaces the
    reduce_window + select_and_scatter pair of :class:`MaxPool`)."""

    block: int = 2
    # True: the preceding ReLU is folded in (its spec slot becomes Identity)
    pre_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Only block == 2 exists in practice (vgg16 rejects other blocks).
        # A generic pairwise-max fallback would also inherit jnp.maximum's
        # tie-SPLITTING gradient, silently diverging from the first-max-wins
        # VJP of _group_max4 — so fail loud instead of differing quietly.
        assert self.block == 2, f"S2DBlockPool supports block=2 only, got {self.block}"
        return _group_max4_relu(x) if self.pre_relu else _group_max4(x)


class ConvBNReLU(nn.Module):
    """conv → BN → activation; XLA fuses the chain into one kernel.

    The reference's ``conv_bn`` (lib/modeling/nets/mobilenet.py) and the
    conv-leaky-BN stacks of darknet share this block (act='leaky').

    Serving-time int8 mirrors :class:`Conv` (ssds_tpu/quant.py): the input
    absmax is sow'd during calibration, and when the kernel's dtype is
    int8 the conv runs ``s8 x s8 -> s32`` on the MXU with the dequant
    epilogue in float — BN (eval-mode affine) and the activation then fuse
    behind it, so BN folding is unnecessary. Depthwise instances
    (``groups == in_ch``) sow too but are never quantized
    (quant.quantize_variables skips ``kernel.shape[2] == 1``).
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
        sub = (self.get_variable("params", "Conv_0")
               if self.has_variable("params", "Conv_0") else None)
        if sub is not None and sub["kernel"].dtype == jnp.int8:
            from ssds_tpu import quant as _q

            acc = _q.int8_conv(
                _q.quantize_act(x, self.get_variable("quant", "act_scale")),
                sub["kernel"], stride=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                dilation=(self.dilation, self.dilation), groups=self.groups)
            x = _q.dequant(acc, self.get_variable("quant", "act_scale"),
                           self.get_variable("quant", "w_scale"), None,
                           x.dtype)
        else:
            if not self.is_initializing() and x.size > 0:
                self.sow("quant_calib", "act_absmax",
                         jnp.max(jnp.abs(x.astype(jnp.float32))))
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=x.dtype,
                name="Conv_0",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=x.dtype
        )(x)
        if self.act == "relu":
            x = relu(x)
        elif self.act == "relu6":
            x = relu6(x)
        elif self.act == "leaky":
            x = leaky_relu(x, 0.1)
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
