#!/usr/bin/env python
"""Itemize the batch-32 fused predict program (VERDICT r3 weak #1).

Times, each as its OWN jitted program at batch 32 on the real chip:
  fwd        — mean-sub + bf16 conv forward (loc, conf)
  fwd_dec    — + decode to corner boxes
  fwd_topk   — + per-class score mask + lax.top_k over [B,C,K]
  fwd_nms    — + batched NMS keep mask
  full       — + compaction/zeroing (the production detect tail)
  full_pruned — full with the PRE_NMS_TOP_N=1024 prune (production default)

The difference between successive rows isolates each stage's marginal cost
(stages fuse, so this is approximate but actionable). Run:
    python tools/b32_profile.py [batch] [--int8]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ssds_tpu.compile_cache import enable_compile_cache
from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.ops.boxes import decode
from ssds_tpu.ops.nms import NEG_INF
from ssds_tpu.ops.postprocess import PostProcessConfig, _detect_batched, _nms_mask

ARGS = [a for a in sys.argv[1:] if not a.startswith("-")]
BATCH = int(ARGS[0]) if ARGS else 32
INT8 = "--int8" in sys.argv


def main():
    enable_compile_cache()
    cfg = default_config()
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    if INT8:
        from ssds_tpu import quant

        def calib_apply(v, img):
            return model.apply(v, img.astype(jnp.bfloat16), phase="eval",
                               train=False, mutable=["quant_calib"])

        rngq = np.random.default_rng(0)
        calib = [jnp.asarray(rngq.normal(0, 50, (1, 300, 300, 3)), jnp.float32)]
        amax = quant.collect_absmax(calib_apply, variables, calib)
        variables = quant.quantize_variables(variables, amax)
        print(f"# int8: {quant.num_quantized(variables)} kernels quantized",
              flush=True)
    post = PostProcessConfig()
    means = jnp.asarray((104, 117, 123), jnp.float32)

    def fwd(v, img):
        x = img.astype(jnp.float32) - means
        x = x.astype(jnp.bfloat16)
        return model.apply(v, x, phase="eval", train=False)

    def to_scores(conf):
        s = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)  # [B,C,K]
        masked = jnp.where(s > post.score_threshold, s, NEG_INF)
        bg = jnp.arange(s.shape[1]) == post.background_label
        return jnp.where(bg[None, :, None], NEG_INF, masked)

    def prog_fwd(v, img):
        loc, conf = fwd(v, img)
        return loc.sum() + conf.sum()

    def prog_dec(v, img):
        loc, conf = fwd(v, img)
        d = decode(loc.astype(jnp.float32), priors, post.variance)
        return d.sum() + conf.sum()

    def prog_topk(v, img):
        loc, conf = fwd(v, img)
        d = decode(loc.astype(jnp.float32), priors, post.variance)
        masked = to_scores(conf)
        cs, ci = jax.lax.top_k(masked, post.top_k)
        return d.sum() + cs.sum() + ci.sum()

    def prog_nms(v, img):
        loc, conf = fwd(v, img)
        d = decode(loc.astype(jnp.float32), priors, post.variance)
        masked = to_scores(conf)
        b, c, k = masked.shape
        cs, ci = jax.lax.top_k(masked, post.top_k)
        cb = jax.vmap(lambda bx, i: bx[i])(d, ci.reshape(b, -1)).reshape(
            b, c, post.top_k, 4)
        keep = _nms_mask(cb.reshape(b * c, post.top_k, 4),
                         cs.reshape(b * c, post.top_k), post.iou_threshold)
        return keep.sum() + cs.sum()

    def prog_full(v, img):
        loc, conf = fwd(v, img)
        d = decode(loc.astype(jnp.float32), priors, post.variance)
        s = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)
        return _detect_batched(d[:, None], s, post).sum()

    post_pruned = PostProcessConfig(pre_nms_top_n=1024)

    def prog_full_pruned(v, img):
        loc, conf = fwd(v, img)
        d = decode(loc.astype(jnp.float32), priors, post_pruned.variance)
        s = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)
        return _detect_batched(d[:, None], s, post_pruned).sum()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (BATCH, 300, 300, 3), dtype=np.uint8))

    progs = [("fwd", prog_fwd), ("fwd_dec", prog_dec), ("fwd_topk", prog_topk),
             ("fwd_nms", prog_nms), ("full", prog_full),
             ("full_pruned", prog_full_pruned)]
    prev = 0.0
    for name, f in progs:
        jf = jax.jit(f)
        out = jf(variables, img)
        jax.device_get(out)
        def run(iters):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = jf(variables, img)
            jax.device_get(o)
            return time.perf_counter() - t0
        run(5)
        n = 20
        samples = sorted((run(2 * n) - run(n)) / n for _ in range(3))
        ms = samples[1] * 1e3
        print(f"{name:10s} {ms:8.2f} ms/step   marginal {ms - prev:+7.2f} ms   "
              f"({BATCH / samples[1]:7.1f} img/s)", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
