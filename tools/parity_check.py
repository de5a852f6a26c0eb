#!/usr/bin/env python
"""One-command mAP-parity harness for the day real artifacts appear.

BASELINE.json's acceptance bar is "VOC07 mAP within 0.1 of the PyTorch
reference" (reference ``test.py`` / ``lib/ssds_train.py:test_epoch``,
SURVEY.md §3.2). This machine has neither the reference ``.pth`` weights
nor VOC — so this tool packages the whole parity pipeline behind one
command, runnable the moment either appears:

    python tools/parity_check.py --cfg experiments/cfgs/ssd_vgg16_train_voc.yml \\
        --pth /path/to/ssd_vgg16_voc.pth \\
        [--data /path/to/VOCdevkit] \\
        [--reference /root/reference] \\
        [--image /path/to/test.jpg]

Stages (each skipped gracefully when its input is absent):

1. **Import audit** — load the ``.pth`` through
   :func:`ssds_tpu.torch_import.import_torch_checkpoint`; report mapped /
   unmatched / relaxed-match counts. Healthy: >=99% mapped, 0 relaxed.
2. **Per-layer activation diff** (needs ``--reference`` pointing at a
   readable ssds.pytorch checkout + torch): build the reference torch
   model via its own ``lib/modeling/model_builder.create_model``, load the
   same ``.pth``, run both models on the same input, and print a
   max-abs-diff table for the loc/conf outputs (and per-source features
   where exposed). Healthy: diffs at bf16/fp32 noise level.
3. **mAP** (needs ``--data``) — run our ``Solver.test_model()`` over
   TEST_SETS with the imported weights; compare against the reference's
   published number by hand (BASELINE.md table).

Self-test (no artifacts needed, proves the harness end-to-end):

    python tools/parity_check.py --selftest

fabricates a reference-layout state_dict from a freshly-initialized model
(tests/test_torch_import_families machinery), saves it as a real torch
``.pth``, and runs stages 1+3 on a generated synthetic VOC.
"""

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# --------------------------------------------------------------------------
# The pinned acceptance table (VERDICT r4 #5): the five BASELINE.json
# acceptance configs, each with the reference's expected mAP (BASELINE.md —
# source-paper numbers; the reference README zoo was unreadable offline) and
# the acceptance tolerance. mAP here is FRACTIONAL (0.772 == 77.2%); the
# BASELINE.json bar "within 0.1 mAP (points) of the reference" is 0.001.
# `expected_map` is the published number for the architecture; the day a
# real reference checkpoint appears, compare against THAT checkpoint's own
# published row first, the paper number second.
# --------------------------------------------------------------------------
MAP_TOLERANCE = 0.001  # 0.1 mAP points, fractional scale

ACCEPTANCE = [
    # (cfg under experiments/cfgs, expected fractional mAP, eval protocol, source)
    ("ssd_vgg16_train_voc.yml", 0.772, "VOC07 test",
     "SSD paper arXiv:1512.02325 (BASELINE.md)"),
    ("ssd_vgg16_train_voc_512.yml", 0.798, "VOC07 test",
     "SSD paper arXiv:1512.02325 (BASELINE.md)"),
    ("fssd_vgg16_train_voc.yml", 0.788, "VOC07 test",
     "FSSD paper arXiv:1712.00960 (BASELINE.md)"),
    ("rfb_vgg16_train_voc.yml", 0.805, "VOC07 test",
     "RFB paper arXiv:1711.07767 (BASELINE.md)"),
    ("ssd_lite_mobilenetv2_train_coco.yml", 0.221, "COCO val AP@[.5:.95]",
     "MobileNetV2 paper arXiv:1801.04381 (SSDLite row; no BASELINE.md row "
     "— reference README zoo unreadable offline)"),
    ("yolo_v3_darknet_53_train_coco.yml", 0.553, "COCO val AP@0.5 (416)",
     "YOLOv3 paper arXiv:1804.02767 (no BASELINE.md row)"),
]


def stage_import(cfg, pth):
    import numpy as np

    from ssds_tpu.models.builder import create_model, init_model
    from ssds_tpu.torch_import import import_torch_checkpoint

    print(f"== stage 1: import audit: {pth}")
    model, fmaps = create_model(cfg.MODEL)
    variables = init_model(model, cfg.MODEL)
    import torch

    sd = torch.load(pth, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    n_tensors = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    imported = import_torch_checkpoint(variables, pth, verbose=True)

    # count how many leaves changed (== landed)
    from flax import traverse_util
    a = traverse_util.flatten_dict(variables)
    b = traverse_util.flatten_dict(imported)
    landed = sum(1 for k in a if not np.array_equal(np.asarray(a[k]),
                                                    np.asarray(b[k])))
    print(f"   state_dict tensors: {n_tensors}; model leaves changed: {landed}")
    return model, fmaps, imported


def stage_activation_diff(cfg, pth, reference, imported, model, image_path=None):
    print(f"== stage 2: per-layer activation diff vs reference at {reference}")
    if not os.path.isdir(reference) or not os.listdir(reference):
        print("   SKIP: reference checkout absent/empty")
        return
    import numpy as np

    sys.path.insert(0, reference)
    try:
        import torch

        from lib.modeling.model_builder import create_model as ref_create_model
        from lib.utils.config_parse import cfg_from_file as ref_cfg_from_file
    except Exception as e:  # noqa: BLE001 — diagnostic tool, report and move on
        print(f"   SKIP: cannot import reference modules: {e}")
        return
    # reference cfg: same yml (the schema is the compatibility contract)
    ref_cfg_from_file(cfg._source_yml) if hasattr(cfg, "_source_yml") else None
    from lib.utils.config_parse import cfg as ref_cfg

    ref_model, _ = ref_create_model(ref_cfg.MODEL)
    sd = torch.load(pth, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    ref_model.load_state_dict(
        {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()},
        strict=False)
    ref_model.eval()

    h, w = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    if image_path:
        import cv2
        img = cv2.resize(cv2.imread(image_path), (w, h)).astype(np.float32)
    else:
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    means = np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32)
    x = img - means

    with torch.no_grad():
        t_loc, t_conf = ref_model(
            torch.from_numpy(x.transpose(2, 0, 1)[None]), phase="train")

    import jax.numpy as jnp
    out = model.apply(imported, jnp.asarray(x[None]), phase="train",
                      train=False)
    loc, conf = out
    for name, ours, theirs in (("loc", loc, t_loc), ("conf", conf, t_conf)):
        o = np.asarray(ours, np.float32).reshape(-1)
        t = np.asarray(theirs.numpy(), np.float32).reshape(-1)
        if o.shape != t.shape:
            print(f"   {name}: SHAPE MISMATCH ours={o.shape} ref={t.shape}")
            continue
        d = np.abs(o - t)
        print(f"   {name}: max|Δ|={d.max():.3e} mean|Δ|={d.mean():.3e} "
              f"(ref scale {np.abs(t).mean():.3e})")


def stage_map(cfg, imported):
    print(f"== stage 3: mAP over TEST_SETS at {cfg.DATASET.DATASET_DIR}")
    probe = os.path.join(cfg.DATASET.DATASET_DIR)
    if not os.path.isdir(probe):
        print("   SKIP: dataset dir absent")
        return None
    from ssds_tpu.solver import Solver

    solver = Solver(cfg)
    solver.params = imported["params"]
    solver.batch_stats = imported.get("batch_stats", solver.batch_stats)
    mAP = solver.test_model()
    print(f"   mAP = {mAP:.4f}   (reference SSD300-VGG16 VOC07: 0.772 "
          "[SSD paper]; acceptance: within 0.001 of the reference "
          "checkpoint's own published number)")
    return mAP


def selftest():
    """Fabricate a reference-layout .pth + synthetic VOC; run stages 1+3."""
    import tempfile

    sys.path.insert(0, os.path.join(HERE, "tests"))
    import numpy as np
    from test_solver_e2e import CFG_TEMPLATE, make_voc
    from test_torch_import_families import _export_sd, ssd_lite_key

    import torch

    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.models.builder import create_model, init_model

    tmp = tempfile.mkdtemp(prefix="parity_selftest_")
    root = os.path.join(tmp, "VOCdevkit")
    make_voc(root, n_images=8)
    cfg_path = os.path.join(tmp, "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.format(root=root, exp=os.path.join(tmp, "exp"),
                                    epochs=1, ckpt_epochs=1, prob=-1))
    cfg = cfg_from_file(cfg_path)

    model, _ = create_model(cfg.MODEL)
    variables = init_model(model, cfg.MODEL)
    sd = _export_sd(variables, ssd_lite_key)
    pth = os.path.join(tmp, "fabricated.pth")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, pth)
    print(f"# fabricated reference-layout checkpoint: {pth} "
          f"({len(sd)} tensors)")
    model, fmaps, imported = stage_import(cfg, pth)
    mAP = stage_map(cfg, imported)
    print("selftest OK")
    return mAP


def when_data(run_oracle: bool = True):
    """The day-the-data-appears dry run (VERDICT r4 #5): validate every row
    of the pinned acceptance table TODAY — each config loads, its model
    builds, and the exact parity command is printed with its expected mAP
    and tolerance — then prove the measurement chain itself with a
    round-trip oracle: train a tiny model to mAP~1.0 on a synthetic VOC,
    export its weights as a reference-layout torch ``.pth``, re-import that
    file through the production importer, and require the imported model's
    mAP to (a) be >= 0.99 and (b) match the pre-export mAP within
    MAP_TOLERANCE — the exact comparison the runbook applies to real data.
    """
    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.models.builder import create_model

    print("== acceptance table (BASELINE.json matrix; tolerance "
          f"+/-{MAP_TOLERANCE:.3f} fractional mAP = 0.1 points)")
    failures = []
    for yml, expected, protocol, source in ACCEPTANCE:
        path = os.path.join(HERE, "experiments", "cfgs", yml)
        try:
            cfg = cfg_from_file(path)
            cfg.RESUME_CHECKPOINT = ""
            model, fmaps = create_model(cfg.MODEL)
        except Exception as e:  # noqa: BLE001 — report every broken row
            failures.append((yml, e))
            print(f"   FAIL {yml}: {type(e).__name__}: {e}")
            continue
        print(f"   ok   {yml}: expected {protocol} mAP {expected:.3f} "
              f"[{source}]\n        run: python tools/parity_check.py "
              f"--cfg experiments/cfgs/{yml} --pth <weights.pth> "
              f"--data <dataset root>")
    if failures:
        raise SystemExit(f"{len(failures)} acceptance rows failed to build")
    if run_oracle:
        map_direct, map_imported = roundtrip_oracle()
        if map_imported < 0.99:
            raise SystemExit(f"round-trip oracle mAP {map_imported:.4f} < "
                             "0.99 — the parity chain itself is broken")
        if abs(map_imported - map_direct) > MAP_TOLERANCE:
            raise SystemExit(
                f"imported mAP {map_imported:.4f} != direct mAP "
                f"{map_direct:.4f} (> {MAP_TOLERANCE}) — the torch import "
                "loses accuracy")
        print(f"   round-trip: direct mAP {map_direct:.4f}, imported "
              f"{map_imported:.4f} (|delta| <= {MAP_TOLERANCE})")
    print("when-data dry run OK — parity is one command per row above")


def roundtrip_oracle():
    """Train tiny -> export reference-layout .pth -> import -> eval.

    Returns (direct mAP, imported mAP). Runs on whatever backend jax
    defaults to (~2 min on the TPU chip, longer on CPU).
    """
    import tempfile

    sys.path.insert(0, os.path.join(HERE, "tests"))
    import torch
    from test_solver_e2e import CFG_TEMPLATE, make_voc
    from test_torch_import_families import _export_sd, ssd_lite_key

    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.solver import Solver

    print("== measurement-chain proof: train -> export .pth -> import -> eval")
    tmp = tempfile.mkdtemp(prefix="parity_whendata_")
    root = os.path.join(tmp, "VOCdevkit")
    make_voc(root, n_images=8)
    cfg_path = os.path.join(tmp, "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.format(root=root, exp=os.path.join(tmp, "exp"),
                                    epochs=40, ckpt_epochs=40, prob=-1))
    cfg = cfg_from_file(cfg_path)
    solver = Solver(cfg)
    solver.train_model()
    map_direct = solver.test_model()

    sd = _export_sd({"params": solver.params,
                     "batch_stats": solver.batch_stats}, ssd_lite_key)
    pth = os.path.join(tmp, "trained_reference_layout.pth")
    torch.save({"state_dict": sd}, pth)
    print(f"   exported reference-layout checkpoint: {pth} ({len(sd)} tensors)")

    _, _, imported = stage_import(cfg, pth)
    map_imported = stage_map(cfg, imported)
    return float(map_direct), float(map_imported)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg")
    ap.add_argument("--pth")
    ap.add_argument("--data", help="VOCdevkit/COCO root (overrides DATASET_DIR)")
    ap.add_argument("--reference", default="/root/reference",
                    help="readable ssds.pytorch checkout for stage 2")
    ap.add_argument("--image", help="real image for the activation diff")
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--when-data", action="store_true",
                    help="dry-run the pinned acceptance table + the synthetic "
                         "oracle chain (no real data needed)")
    ap.add_argument("--table-only", action="store_true",
                    help="with --when-data: skip the synthetic-oracle run "
                         "(fast, no device work)")
    args = ap.parse_args()

    if args.when_data:
        when_data(run_oracle=not args.table_only)
        return
    if args.selftest:
        selftest()
        return
    if not args.cfg or not args.pth:
        ap.error("--cfg and --pth are required (or --selftest)")

    from ssds_tpu.config import cfg_from_file

    cfg = cfg_from_file(args.cfg)
    cfg._source_yml = args.cfg
    cfg.RESUME_CHECKPOINT = ""
    if args.data:
        cfg.DATASET.DATASET_DIR = args.data

    model, fmaps, imported = stage_import(cfg, args.pth)
    stage_activation_diff(cfg, args.pth, args.reference, imported, model,
                          args.image)
    stage_map(cfg, imported)


if __name__ == "__main__":
    main()
