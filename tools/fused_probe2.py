#!/usr/bin/env python
"""Round 2 of the fused-predict fault bisect (see fused_probe.py).

Probe 1 result (2026-08-16): forward+decode+top_k fuse fine (v0–v2 OK);
the first fault is the [B,C,K,4] take_along_axis candidate gather (v3:
"TPU worker process crashed"). v4/v5 faults may be contamination from the
v3 worker crash. This probe tests gather reformulations fused with the
full conv forward, each in its own subprocess, 120 s cooldown after any
fault:

  w0  gather-as-matmul: one_hot(cand_idx) @ decoded (MXU, no gather op)
  w1  per-batch fancy-index gather via vmap (different lowering)
  w2  w0 + batched sorted_nms mask (isolates NMS from the compact tail)
  w3  w0 + full tail (NMS + argsort compact + dense out) = fused predict
      with only the big gather reformulated
  w4  w3 but the small compact gathers as one-hot matmuls too (fallback)

Usage: python tools/fused_probe2.py [--variant wN]
"""
import json
import os
import subprocess
import sys
import time

COOLDOWN_S = 120


def _gather_matmul(decoded, cand_idx):
    """[B,K,4] gathered by [B,C,T] -> [B,C,T,4] via one-hot matmul (MXU)."""
    import jax.numpy as jnp

    b, k, _ = decoded.shape
    onehot = (cand_idx[..., None] == jnp.arange(k)).astype(jnp.float32)
    # [B,C,T,K] @ [B,K,4] -> [B,C,T,4]
    return jnp.einsum("bctk,bkf->bctf", onehot, decoded)


def run_variant(name: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, create_priors, init_model
    from ssds_tpu.ops.boxes import decode
    from ssds_tpu.ops.nms import NEG_INF, sorted_nms
    from ssds_tpu.ops.postprocess import PostProcessConfig

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
        scores = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)  # [B,C,K]
        b, c, k = scores.shape
        t = post.top_k
        masked = jnp.where(scores > post.score_threshold, scores, NEG_INF)
        bg = jnp.arange(c) == post.background_label
        masked = jnp.where(bg[None, :, None], NEG_INF, masked)
        cand_scores, cand_idx = jax.lax.top_k(masked, t)  # [B,C,T]

        if name == "w1":
            return jax.vmap(lambda d, i: d[i])(
                decoded, cand_idx.reshape(b, -1)).reshape(b, c, t, 4)
        if name in ("w5", "w6", "w7", "w8"):
            cand_boxes = jax.vmap(lambda d, i: d[i])(
                decoded, cand_idx.reshape(b, -1)).reshape(b, c, t, 4)
        else:
            cand_boxes = _gather_matmul(decoded, cand_idx)
        if name == "w0":
            return cand_boxes

        keep = jax.vmap(lambda bx, s: sorted_nms(bx, s, post.iou_threshold))(
            cand_boxes.reshape(b * c, t, 4), cand_scores.reshape(b * c, t)
        ).reshape(b, c, t)
        if name == "w2":
            return keep

        if name in ("w5", "w8"):
            # compaction via top_k over masked scores: kept rows are already
            # score-descending, so top_k(masked) = stable front-compaction
            m = post.max_detections
            kept_scores = jnp.where(keep, cand_scores, NEG_INF)
            out_scores, out_idx = jax.lax.top_k(kept_scores, m)  # [B,C,M]
            oh = (out_idx[..., None] == jnp.arange(t)).astype(jnp.float32)
            prec = jax.lax.Precision.HIGHEST if name == "w8" else None
            out_boxes = jnp.einsum("bcij,bcjf->bcif", oh, cand_boxes,
                                   precision=prec)
            rows = jnp.concatenate([out_scores[..., None], out_boxes], axis=-1)
            rows = jnp.where(out_scores[..., None] > NEG_INF / 2, rows, 0.0)
            return jnp.where(bg[None, :, None, None], 0.0, rows)

        order = jnp.argsort(~keep, axis=-1, stable=True)
        if name in ("w3", "w7"):
            keep_s = jnp.take_along_axis(keep, order, axis=-1)
            scores_s = jnp.take_along_axis(cand_scores, order, axis=-1)
            boxes_s = jnp.take_along_axis(cand_boxes, order[..., None], axis=2)
        else:  # w4: compact gathers as one-hot matmuls too
            oh = (order[..., None] == jnp.arange(t)).astype(jnp.float32)
            keep_s = jnp.einsum("bcij,bcj->bci", oh, keep.astype(jnp.float32)) > 0.5
            scores_s = jnp.einsum("bcij,bcj->bci", oh, cand_scores)
            boxes_s = jnp.einsum("bcij,bcjf->bcif", oh, cand_boxes)
        rows = jnp.concatenate([scores_s[..., None], boxes_s], axis=-1)
        rows = jnp.where(keep_s[..., None], rows, 0.0)
        rows = jnp.where(bg[None, :, None, None], 0.0, rows)
        return rows[:, :, : post.max_detections]

    @jax.jit
    def fused(variables, img_u8):
        x = (img_u8.astype(jnp.float32) - means).astype(jnp.bfloat16)
        loc, conf = model.apply(variables, x, phase="eval", train=False)
        return tail(loc, conf)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1, 300, 300, 3)), jnp.uint8)
    t0 = time.perf_counter()
    out = fused(variables, img)
    s = jax.device_get(jnp.sum(jnp.asarray(out, jnp.float32)))
    compile_s = round(time.perf_counter() - t0, 1)
    # throughput: pipelined dispatch, device_get sync, 2N-N differencing
    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fused(variables, img)
        jax.device_get(jnp.sum(jnp.asarray(o, jnp.float32)))
        return time.perf_counter() - t0
    run(30)
    per = min((run(200) - run(100)) / 100 for _ in range(2))
    print(json.dumps({"variant": name, "ok": True, "compile_s": compile_s,
                      "fps": round(1.0 / per, 1),
                      "checksum": float(s)}), flush=True)


def main():
    for name in sys.argv[1:] or ["w0", "w1", "w2", "w3", "w4"]:
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--variant", name],
            capture_output=True, text=True, timeout=900, cwd=repo, env=env,
        )
        ok = any(l.strip().startswith("{") for l in proc.stdout.splitlines())
        tail_err = proc.stderr.strip().splitlines()[-1][:160] if proc.stderr.strip() else ""
        print(f"{name}: {'OK  ' + proc.stdout.strip() if ok else 'FAULT ' + tail_err}",
              flush=True)
        if not ok:
            time.sleep(COOLDOWN_S)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--variant":
        run_variant(sys.argv[2])
    else:
        main()
