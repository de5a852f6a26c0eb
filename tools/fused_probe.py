#!/usr/bin/env python
"""Bisect the fused-predict backend fault (VERDICT round-1 item 7).

The split programs (forward | detect) each compile and run on the tunneled
TPU, but the single fused program intermittently faults the backend at
compile/first-run. This probe fuses the SSD300-VGG16 forward with
progressively more of the detect tail, each variant in its OWN subprocess
(a faulted device wedges the owning process), and reports which fragment
first faults:

  v0  forward only (control — known good)
  v1  + decode
  v2  + score mask + lax.top_k over [B, C, 8732]
  v3  + candidate gather (take_along_axis)
  v4  + batched NMS mask (suppression propagation)
  v5  + compact/argsort + dense output (= full fused predict, known bad)

Usage: python tools/fused_probe.py            # orchestrate all variants
       python tools/fused_probe.py --variant 3  # one variant, this process
"""
import json
import os
import subprocess
import sys
import time

COOLDOWN_S = 75  # tunneled backend recovers from a kernel fault in ~1 min


def run_variant(n: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, create_priors, init_model
    from ssds_tpu.ops.boxes import decode
    from ssds_tpu.ops.nms import NEG_INF
    from ssds_tpu.ops.postprocess import PostProcessConfig, _detect_batched, _nms_mask

    cfg = default_config()
    cfg.MODEL.SSDS = "ssd"
    cfg.MODEL.NETS = "vgg16"
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    post = PostProcessConfig()
    means = jnp.asarray(cfg.DATASET.PIXEL_MEANS, jnp.float32)

    def tail(loc, conf):
        decoded = decode(loc.astype(jnp.float32), priors, post.variance)
        if n == 1:
            return decoded
        scores = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)  # [B, C, K]
        masked = jnp.where(scores > post.score_threshold, scores, NEG_INF)
        bg = jnp.arange(scores.shape[1]) == post.background_label
        masked = jnp.where(bg[None, :, None], NEG_INF, masked)
        cand_scores, cand_idx = jax.lax.top_k(masked, post.top_k)
        if n == 2:
            return cand_scores
        b, c = scores.shape[:2]
        boxes_pc = jnp.broadcast_to(decoded[:, None], (b, c) + decoded.shape[1:])
        cand_boxes = jnp.take_along_axis(boxes_pc, cand_idx[..., None], axis=2)
        if n == 3:
            return cand_boxes
        keep = _nms_mask(
            cand_boxes.reshape(b * c, post.top_k, 4),
            cand_scores.reshape(b * c, post.top_k),
            post.iou_threshold,
        ).reshape(b, c, post.top_k)
        if n == 4:
            return keep
        return _detect_batched(decoded[:, None], scores, post)

    @jax.jit
    def fused(variables, img_u8):
        x = img_u8.astype(jnp.float32) - means
        x = x.astype(jnp.bfloat16)
        loc, conf = model.apply(variables, x, phase="eval", train=False)
        if n == 0:
            return loc
        return tail(loc, conf)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1, 300, 300, 3)), jnp.uint8)
    t0 = time.perf_counter()
    out = fused(variables, img)
    s = jax.device_get(jnp.sum(jnp.asarray(out, jnp.float32)))
    print(json.dumps({"variant": n, "ok": True,
                      "compile_s": round(time.perf_counter() - t0, 1),
                      "checksum": float(s)}), flush=True)


def main():
    results = {}
    for n in range(6):
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--variant", str(n)],
            capture_output=True, text=True, timeout=900,
            cwd=repo, env=env,
        )
        ok = any(l.strip().startswith("{") for l in proc.stdout.splitlines())
        tail_err = proc.stderr.strip().splitlines()[-1][:200] if proc.stderr.strip() else ""
        results[n] = (ok, tail_err)
        print(f"v{n}: {'OK  ' + proc.stdout.strip() if ok else 'FAULT ' + tail_err}",
              flush=True)
        if not ok:
            time.sleep(COOLDOWN_S)
    return results


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--variant":
        run_variant(int(sys.argv[2]))
    else:
        main()
