#!/usr/bin/env python
"""Per-op xplane profile of the batch-N serving forward (fp or int8).

Answers "where do the int8 program's 9.76 ms go?" (round-4 follow-up to
tools/b32_profile.py's stage itemization): prints the top ops by self-time
for the conv forward at the given batch, so quantize/dequant overhead and
low-efficiency convs are visible individually.

Usage: python tools/serve_profile.py [batch] [--int8] [--full]
                                     [--cfg experiments/cfgs/<x>.yml]
"""

import glob
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ssds_tpu.compile_cache import enable_compile_cache
from ssds_tpu.config import cfg_from_file, default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.ops.boxes import decode
from ssds_tpu.ops.postprocess import PostProcessConfig, _detect_batched

ARGS = [a for a in sys.argv[1:] if not a.startswith("-")]
BATCH = int(ARGS[0]) if ARGS else 32
INT8 = "--int8" in sys.argv
FULL = "--full" in sys.argv  # profile the full detect program, not just fwd
CFG = None
if "--cfg" in sys.argv:
    CFG = sys.argv[sys.argv.index("--cfg") + 1]


def main():
    enable_compile_cache()
    cfg = cfg_from_file(CFG) if CFG else default_config()
    cfg.RESUME_CHECKPOINT = ""
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    if INT8:
        from ssds_tpu import quant

        def calib_apply(v, img):
            return model.apply(v, img.astype(jnp.bfloat16), phase="eval",
                               train=False, mutable=["quant_calib"])

        rngq = np.random.default_rng(0)
        hh, ww = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
        calib = [jnp.asarray(rngq.normal(0, 50, (1, hh, ww, 3)), jnp.float32)]
        amax = quant.collect_absmax(calib_apply, variables, calib)
        variables = quant.quantize_variables(variables, amax)
        print(f"# int8: {quant.num_quantized(variables)} kernels", flush=True)

    means = jnp.asarray((104, 117, 123), jnp.float32)
    post = PostProcessConfig(pre_nms_top_n=1024)

    def prog(v, img):
        x = (img.astype(jnp.float32) - means).astype(jnp.bfloat16)
        loc, conf = model.apply(v, x, phase="eval", train=False)
        if not FULL:
            return loc.sum() + conf.sum()
        d = decode(loc.astype(jnp.float32), priors, post.variance)
        s = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)
        return _detect_batched(d[:, None], s, post).sum()

    rng = np.random.default_rng(0)
    h, w = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    img = jnp.asarray(rng.integers(0, 255, (BATCH, h, w, 3), dtype=np.uint8))
    jf = jax.jit(prog)
    jax.device_get(jf(variables, img))
    t0 = time.perf_counter()
    o = None
    for _ in range(30):
        o = jf(variables, img)
    jax.device_get(o)
    print(f"# step: {(time.perf_counter() - t0) / 30 * 1e3:.2f} ms", flush=True)

    logdir = f"/tmp/serve_profile_{'int8' if INT8 else 'fp'}_{BATCH}"
    jax.profiler.start_trace(logdir)
    for _ in range(10):
        o = jf(variables, img)
    jax.device_get(o)
    jax.profiler.stop_trace()

    # Parse the xplane directly (tensorboard_plugin_profile's converter is
    # broken against this image's protobuf/tensorflow pairing): per-op
    # self-times + the profiler's own flops/bytes stats give an efficiency
    # and source-line column per op.
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    xs.ParseFromString(open(xplanes[-1], "rb").read())
    plane = max((pl for pl in xs.planes if pl.name != "/host:CPU"),
                key=lambda pl: sum(len(ln.events) for ln in pl.lines))
    ev_meta, stat_meta = plane.event_metadata, plane.stat_metadata
    rows = defaultdict(lambda: [0.0, 0, 0, "?", ""])  # ms, flops, bytes, cat, src
    cat_t = defaultdict(float)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = ev_meta[ev.metadata_id]
            st = {stat_meta[s.metadata_id].name:
                  (s.str_value or s.int64_value or s.uint64_value)
                  for s in m.stats}
            r = rows[m.name]
            r[0] += ev.duration_ps / 1e9
            r[1] = st.get("flops", 0)
            r[2] = st.get("bytes_accessed", 0)
            r[3] = str(st.get("hlo_category", "?"))
            r[4] = str(st.get("source", ""))
            cat_t[r[3]] += ev.duration_ps / 1e9
    total = sum(v[0] for v in rows.values())
    print(f"# device XLA-op self time: {total / 10:.2f} ms/step "
          f"({len(rows)} ops)")
    for c, ms in sorted(cat_t.items(), key=lambda kv: -kv[1])[:8]:
        print(f"#   {c:28s} {ms / 10:8.3f} ms {100 * ms / total:5.1f}%")
    print(f"{'op':52s} {'ms':>7s} {'TF/s':>6s} {'GB/s':>6s}  src")
    for name, (ms, fl, by, cat, src) in sorted(
            rows.items(), key=lambda kv: -kv[1][0])[:28]:
        ms_step = ms / 10
        tfs = (fl / 1e12) / (ms_step / 1e3) if fl and ms_step else 0
        gbs = (by / 1e9) / (ms_step / 1e3) if by and ms_step else 0
        print(f"{name[:52]:52s} {ms_step:7.3f} {tfs:6.1f} {gbs:6.0f}  "
              f"{src.split('/')[-1]}")


if __name__ == "__main__":
    main()
