"""Inference-only ObjectDetector for the demo path.

Behavioral spec source: reference ``lib/ssds.py`` (SURVEY.md §2.2):
``ObjectDetector.__init__`` = create_model + load RESUME_CHECKPOINT +
PriorBox + Detect (eval mode); ``predict(img, threshold, check_time)`` =
preprocess single image → forward → Detect → rescale boxes to the original
image → score filter, with optional per-stage timing.

TPU-first design (SURVEY.md §7 "latency north star"): everything after the
host-side resize — mean-subtraction, the conv forward, decode, NMS, top-k —
is ONE jitted program; the only host↔device traffic is one [1,H,W,3] uint8
upload and one [C,top_k,5] download.
"""

from __future__ import annotations

import copy
import time
from functools import partial
from typing import Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ssds_tpu import checkpoint as ckpt_lib
from ssds_tpu.compile_cache import enable_compile_cache
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.ops.postprocess import PostProcessConfig, detect, detect_decoded


class ObjectDetector:
    def __init__(self, cfg):
        self.cfg = cfg
        enable_compile_cache()
        model_cfg = cfg.MODEL
        if int(model_cfg.get("S2D_STEM", 0) or 0) < 0:
            # auto resolves OFF for the inference wrapper: the tiled stem's
            # +6.6% is a train-step (batch-32) win; at batch 1 it costs ~3%
            # (840 -> 817 img/s). The param tree is identical either way, so
            # checkpoints interchange with the Solver's auto-ON models.
            # Resolved on a COPY: the caller's cfg stays auto, so a Solver
            # built later from the same object still resolves auto-ON.
            model_cfg = copy.deepcopy(model_cfg)
            model_cfg.S2D_STEM = 0
        self.model, self.feature_maps = create_model(model_cfg)
        self.is_yolo = str(model_cfg.SSDS).startswith("yolo")
        self.img_hw = (int(model_cfg.IMAGE_SIZE[0]), int(model_cfg.IMAGE_SIZE[1]))
        self.half = bool(model_cfg.HALF_PRECISION)
        priors = None if self.is_yolo else create_priors(model_cfg, self.feature_maps)

        variables = init_model(self.model, model_cfg, jax.random.PRNGKey(0))
        if cfg.RESUME_CHECKPOINT:
            variables = ckpt_lib.resume_checkpoint(variables, cfg.RESUME_CHECKPOINT, "")
        self.variables = variables

        post = PostProcessConfig(
            num_classes=int(cfg.POST_PROCESS.NUM_CLASSES),
            background_label=int(cfg.POST_PROCESS.BACKGROUND_LABEL),
            score_threshold=float(cfg.POST_PROCESS.SCORE_THRESHOLD),
            iou_threshold=float(cfg.POST_PROCESS.IOU_THRESHOLD),
            max_detections=int(cfg.POST_PROCESS.MAX_DETECTIONS),
            top_k=int(cfg.POST_PROCESS.TOP_K),
            variance=tuple(cfg.POST_PROCESS.VARIANCE),
            pre_nms_top_n=int(cfg.POST_PROCESS.get("PRE_NMS_TOP_N", 0)),
        )
        means = jnp.asarray(cfg.DATASET.PIXEL_MEANS, jnp.float32)
        self._means = means
        model, is_yolo, half = self.model, self.is_yolo, self.half
        priors_j = None if priors is None else jnp.asarray(priors)

        @jax.jit
        def _forward(variables, img_u8):
            # img_u8: [B, H, W, 3] uint8 BGR at model input size
            x = img_u8.astype(jnp.float32) - means
            if half:
                x = x.astype(jnp.bfloat16)
            return model.apply(variables, x, phase="eval", train=False)

        def _post(out):
            if is_yolo:
                boxes, scores = out
                return detect_decoded(boxes, scores, post)
            loc, conf = out
            return detect(loc, conf, priors_j, post)

        @jax.jit
        def _predict_fused(variables, img_u8):
            return _post(_forward.__wrapped__(variables, img_u8))

        def _predict_split(variables, img_u8):
            return _post(_forward(variables, img_u8))

        # The single fused program has the fewest launches (the batch-1
        # latency path) and is the default. Root cause of the round-1
        # "fused compile faults the backend" bug (tools/fused_probe.py):
        # the XLA lowering of broadcast-to-[B,C,K,4] + take_along_axis,
        # when fused behind the conv forward, crashed the TPU worker;
        # detect's candidate gather is now a vmapped fancy-index gather
        # (ops/postprocess.py), which compiles clean and measures 841 img/s
        # batch-1 vs 372 for the split programs. SSDS_TPU_FUSED_PREDICT=0
        # remains as the escape hatch to the two-program path.
        import os

        h, w = self.img_hw
        dummy = jnp.zeros((1, h, w, 3), jnp.uint8)
        if os.environ.get("SSDS_TPU_FUSED_PREDICT", "1") == "1":
            self._predict = _predict_fused
        else:
            self._predict = _predict_split
        self._predict(self.variables, dummy).block_until_ready()
        if str(model_cfg.get("QUANT", "")) == "int8":
            self.quantize_int8()

    def quantize_int8(self, calib_images=None, skip_re=None) -> int:
        """Post-training int8 quantization of the serving path.

        Symmetric PTQ (ssds_tpu/quant.py): calibrate per-conv activation
        scales on a few forwards, re-encode conv kernels as per-channel
        int8, and let the jitted predict retrace onto the MXU's s8 path
        (~2x bf16 rate, half the weight HBM traffic). No reference
        equivalent — ssds.pytorch serves fp32 (SURVEY.md §2.9).

        calib_images: iterable of [B, H, W, 3] uint8 batches at the model
        input size (real images recommended for best scales); None = four
        seeded synthetic batches (perf-representative; accuracy scales
        should come from real data). skip_re: regex over module paths to
        keep matching convs in float. Returns the number of int8 kernels.
        """
        from ssds_tpu import quant

        h, w = self.img_hw
        if calib_images is None:
            rng = np.random.default_rng(0)
            calib_images = [rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
                            for _ in range(4)]
        means, half, model = self._means, self.half, self.model

        @jax.jit
        def calib_apply(variables, img_u8):
            x = img_u8.astype(jnp.float32) - means
            if half:
                x = x.astype(jnp.bfloat16)
            return model.apply(variables, x, phase="eval", train=False,
                               mutable=["quant_calib"])

        amax = quant.collect_absmax(calib_apply, self.variables, calib_images)
        self.variables = quant.quantize_variables(
            self.variables, amax, skip_re=skip_re)
        dummy = jnp.zeros((1, h, w, 3), jnp.uint8)
        jax.block_until_ready(self._predict(self.variables, dummy))
        return quant.num_quantized(self.variables)

    def predict_batch(self, imgs, threshold: float = 0.6):
        """Batched :meth:`predict` — one fused device program for N images.

        The reference's ``ObjectDetector.predict`` (lib/ssds.py:~60) is
        single-image; this additive API is the batched-serving surface
        between it and the export artifact: images of ANY sizes are
        host-resized, stacked, pushed through ONE jitted
        preprocess→forward→detect program (batch >= 4 engages the pruned +
        one-hot-gather throughput path, ops/postprocess.py), and each
        image's detections are rescaled to its own original size.

        Note: a distinct batch size compiles a distinct XLA program (first
        call per size is slow) — keep the batch size constant in serving
        loops and pad the final partial batch if needed.

        Args:
          imgs: sequence of HWC BGR uint8 arrays (sizes may differ).
          threshold: score filter applied per image.

        Returns:
          list of ``(boxes_px [N,4], labels [N], scores [N])`` tuples, one
          per input image, in order.
        """
        h, w = self.img_hw
        x = np.stack([
            cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
            for img in imgs]).astype(np.uint8)
        dets = np.asarray(jax.block_until_ready(
            self._predict(self.variables, x)))  # [B, C, K, 5]
        results = []
        for img, rows in zip(imgs, dets):
            orig_h, orig_w = img.shape[:2]
            scale = np.array([orig_w, orig_h, orig_w, orig_h], np.float32)
            cls, slot = np.nonzero(rows[..., 0] > threshold)
            picked = rows[cls, slot]
            order = np.argsort(-picked[:, 0], kind="stable")
            results.append((
                picked[order, 1:5] * scale,
                (cls[order] - 1).astype(np.int32),  # drop background offset
                picked[order, 0].astype(np.float32),
            ))
        return results

    def predict(self, img: np.ndarray, threshold: float = 0.6, check_time: bool = False):
        """img: HWC BGR uint8 (any size). Returns (boxes_px [N,4], labels
        [N], scores [N]) above threshold; with check_time, also a dict of
        per-stage seconds (preprocess/forward+detect/postfilter/total)."""
        t_all = time.perf_counter()
        orig_h, orig_w = img.shape[:2]
        t0 = time.perf_counter()
        resized = cv2.resize(img, (self.img_hw[1], self.img_hw[0]),
                             interpolation=cv2.INTER_LINEAR)
        x = resized[None].astype(np.uint8)
        t_pre = time.perf_counter() - t0

        t0 = time.perf_counter()
        dets = np.asarray(jax.block_until_ready(self._predict(self.variables, x)))[0]
        t_fwd = time.perf_counter() - t0

        t0 = time.perf_counter()
        scale = np.array([orig_w, orig_h, orig_w, orig_h], np.float32)
        boxes, labels, scores = [], [], []
        for c in range(dets.shape[0]):
            rows = dets[c]
            keep = rows[:, 0] > threshold
            for r in rows[keep]:
                scores.append(float(r[0]))
                boxes.append(r[1:5] * scale)
                labels.append(c - 1)  # drop background offset
        t_post = time.perf_counter() - t0
        total = time.perf_counter() - t_all

        boxes = np.asarray(boxes).reshape(-1, 4)
        labels = np.asarray(labels, np.int32)
        scores = np.asarray(scores, np.float32)
        if check_time:
            return (boxes, labels, scores), {
                "preprocess": t_pre, "forward_detect": t_fwd,
                "postfilter": t_post, "total": total,
            }
        return boxes, labels, scores
