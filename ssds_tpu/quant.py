"""Post-training int8 quantization (PTQ) for the serving path.

Measured reality on v5e through XLA (round 4, ``tools/serve_profile.py``
+ the epilogue matrix in BENCH_NOTES.md): ``s8 x s8 -> s32`` convolutions
top out at ~196 T(op)/s — the same *absolute* rate as the bf16 MXU peak,
not 2x it. int8's end-to-end win therefore comes from bf16 convs running
*below* peak (memory-bound shapes: the same conv4 shape measures bf16 130
vs int8 196 T/s at batch 32) and from halved activation/weight HBM
traffic; dequant/requant epilogues fuse into the conv for free. The
batch-32 int8 forward sits within ~10% of this measured int8 conv
roofline. (``tools/int8_bench.py``'s early "2.25x" figure was batch-8
bf16 under-utilization, not a 2x MXU rate.) This module implements the
standard symmetric PTQ recipe, TPU-first:

- **per-tensor activation scales** from calibration absmax (a handful of
  representative forwards);
- **per-output-channel weight scales** (absmax / 127);
- int32 accumulation on the MXU, float epilogue (dequant + bias + ReLU),
  which XLA fuses into the convolution.

The reference (ssds.pytorch) serves fp32 only — there is no reference
equivalent (SURVEY.md §2.9 lists no native/quantized inference); this is
beyond-parity TPU headroom, not a port.

Design: **no global mode flag.** The conv wrappers
(:class:`ssds_tpu.models.layers.Conv`, the fused prediction convs in
``models/heads/common.py``) switch to the int8 path when their kernel's
dtype IS ``int8`` — the quantized variables produced here are the switch,
so jit tracing stays pure and the fp path is byte-identical to before.
Calibration statistics ride a sow'd ``quant_calib`` collection that costs
nothing (XLA-DCE'd) unless the caller marks it mutable.

Flow::

    amax  = collect_absmax(calib_apply, variables, batches)
    qvars = quantize_variables(variables, amax)
    model.apply(qvars, x, phase="eval")      # int8 convs on the MXU

or one call on the detector: ``ObjectDetector.quantize_int8(images)``.

Depthwise kernels (``kernel.shape[2] == 1``) are left in float — their
arithmetic intensity is too low for the MXU to matter and per-channel
scaling across ``feature_group_count`` needs a different axis contract.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from flax.core import unfreeze

# Leaf names sow'd by the conv wrappers during calibration. ``act_absmax``
# = layers.Conv (one input per module); ``act_absmax_src{k}`` = the fused
# prediction conv over source k in heads/common.py MultiboxHead.
CALIB_LEAF = "act_absmax"
CALIB_SRC_PREFIX = "act_absmax_src"


def quantize_act(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric per-tensor activation quantization to int8."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def int8_conv(xq, wq, *, stride=(1, 1), padding=((0, 0), (0, 0)),
              dilation=(1, 1), groups=1) -> jnp.ndarray:
    """s8 x s8 -> s32 convolution on the MXU (NHWC / HWIO)."""
    return jax.lax.conv_general_dilated(
        xq, wq, stride, padding, rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def dequant(acc_i32, act_scale, w_scale, bias, out_dtype) -> jnp.ndarray:
    """Float epilogue: rescale int32 accumulators, add bias. XLA fuses
    this (and a following ReLU) into the conv's epilogue."""
    y = acc_i32.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def collect_absmax(calib_apply: Callable, variables, batches: Iterable,
                   ) -> Dict[Tuple[str, ...], float]:
    """Run calibration forwards; return {flat module path: absmax}.

    ``calib_apply(variables, batch)`` must apply the model with
    ``mutable=["quant_calib"]`` and return ``(out, aux)`` where
    ``aux["quant_calib"]`` is the sow'd collection. Maxes across batches
    on the host.
    """
    amax: Dict[Tuple[str, ...], float] = {}
    for batch in batches:
        _, aux = calib_apply(variables, batch)
        cal = traverse_util.flatten_dict(unfreeze(jax.device_get(
            aux["quant_calib"] if "quant_calib" in aux else aux)))
        for key, val in cal.items():
            v = float(np.max(np.asarray(val)))  # sow leaves are tuples
            amax[key] = max(amax.get(key, 0.0), v)
    if not amax:
        raise ValueError(
            "calibration produced no quant_calib statistics — was the "
            "apply run with mutable=['quant_calib']?")
    return amax


def _quantize_kernel(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: returns (w_int8, w_scale[cout])."""
    s = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def quantize_variables(variables, amax: Dict[Tuple[str, ...], float],
                       skip_re: Optional[str] = None):
    """Build int8 serving variables from fp variables + calibration absmax.

    Returns a new ``variables`` dict where every calibrated conv kernel is
    int8 (per-cout scales in a new ``quant`` collection alongside the
    per-module activation scales). Params tree STRUCTURE is unchanged —
    only kernel dtypes flip, which is what routes the conv wrappers onto
    the int8 path. ``skip_re``: regex over the '/'-joined module path;
    matching convs stay float (e.g. ``"loc|conf"`` to keep prediction
    heads full-precision).
    """
    params = traverse_util.flatten_dict(unfreeze(variables["params"]))
    fparams = {k: np.asarray(jax.device_get(v), np.float32)
               for k, v in params.items()}
    out = dict(params)
    quant: Dict[Tuple[str, ...], np.ndarray] = {}
    skip = re.compile(skip_re) if skip_re else None

    def prepare(kpath):
        """(int8 kernel, per-cout scale), or None if this conv stays fp.

        skip_re is matched against the kernel's own module path (so
        "loc|conf" skips the fused head's loc{k}/conf{k} params even
        though their calibration stat lives on the parent MultiboxHead).
        """
        if skip is not None and skip.search("/".join(kpath[:-1])):
            return None
        if kpath not in fparams:
            return None
        w = fparams[kpath]
        if w.ndim != 4 or w.shape[2] == 1:  # depthwise / degenerate: keep fp
            return None
        return _quantize_kernel(w)

    for key, a in sorted(amax.items()):
        mpath, leaf = key[:-1], key[-1]
        act_scale = np.float32(max(a, 1e-8) / 127.0)
        if leaf == CALIB_LEAF:
            kpath = mpath + ("Conv_0", "kernel")
            qs = prepare(kpath)
            if qs is not None:
                out[kpath] = jnp.asarray(qs[0])
                quant[mpath + ("act_scale",)] = act_scale
                quant[mpath + ("w_scale",)] = qs[1]
        elif leaf.startswith(CALIB_SRC_PREFIX):
            # the fused loc|conf conv quantizes as a UNIT: both kernels or
            # neither (a half-quantized pair would concat mixed dtypes)
            k = leaf[len(CALIB_SRC_PREFIX):]
            kp_loc = mpath + (f"loc{k}", "Conv_0", "kernel")
            kp_conf = mpath + (f"conf{k}", "Conv_0", "kernel")
            qs_loc, qs_conf = prepare(kp_loc), prepare(kp_conf)
            if qs_loc is not None and qs_conf is not None:
                out[kp_loc] = jnp.asarray(qs_loc[0])
                out[kp_conf] = jnp.asarray(qs_conf[0])
                quant[mpath + (f"act_scale_src{k}",)] = act_scale
                # loc|conf concat order matches MultiboxHead's fused kernel
                quant[mpath + (f"w_scale_src{k}",)] = np.concatenate(
                    [qs_loc[1], qs_conf[1]])

    if not quant:
        raise ValueError("nothing was quantized (skip_re matched all convs?)")
    new = dict(variables)
    new["params"] = traverse_util.unflatten_dict(out)
    new["quant"] = traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in quant.items()})
    return new


def num_quantized(variables) -> int:
    """How many conv kernels in ``variables`` are int8 (0 = fp model)."""
    flat = traverse_util.flatten_dict(unfreeze(variables["params"]))
    return sum(1 for v in flat.values()
               if hasattr(v, "dtype") and v.dtype == jnp.int8)
