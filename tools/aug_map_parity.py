#!/usr/bin/env python
"""Host-aug vs device-aug mAP equivalence experiment (VERDICT r4 #3).

DEVICE_AUG is the recommended input path on weak hosts: the host loader
degrades to resize-only and the batched augmentation
(:mod:`ssds_tpu.ops.augment_device`) runs inside the jitted train step.
Its recipe is an approximation of the host pipeline (hue -> per-channel
gain, min-IoU crop -> center-rule crop; see the module docstring), so
distribution-drift bounds alone (tests/test_augment_drift.py) don't prove
training equivalence. This experiment does it at the mAP level: the same
5-class generated-VOC CLI oracle (tests/test_multiclass_map_cli.py),
trained twice with identical config/steps except DATASET.DEVICE_AUG, must
reach the same mAP within a small delta.

    python tools/aug_map_parity.py [--epochs 70] [--out result.json]

Prints one JSON line: {"map_host": .., "map_device": .., "delta": ..}.
Results are recorded in docs/STATUS.md; the pass bar is asserted by
tests/test_device_aug_map_parity.py.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

CFG = """
MODEL:
  SSDS: ssd_lite
  NETS: mobilenet_v1_025
  IMAGE_SIZE: [96, 96]
  NUM_CLASSES: 21
  FEATURE_LAYER: [[11, 13], [128, 256]]
  ASPECT_RATIOS: [[2, 3], [2, 3]]
  SIZES: [0.2, 0.55, 0.9]
  HALF_PRECISION: False
TRAIN:
  MAX_EPOCHS: {epochs}
  CHECKPOINTS_EPOCHS: {epochs}
  BATCH_SIZE: 16
  TRAINABLE_SCOPE: ''
  OPTIMIZER: {{OPTIMIZER: sgd, LEARNING_RATE: 0.03, MOMENTUM: 0.9, WEIGHT_DECAY: 0.0}}
  LR_SCHEDULER: {{SCHEDULER: multi_step, STEPS: [{lr_step}], GAMMA: 0.2, WARM_UP_EPOCHS: 2}}
TEST: {{BATCH_SIZE: 16, TEST_SCOPE: [1000, 1001]}}
POST_PROCESS: {{NUM_CLASSES: 21, SCORE_THRESHOLD: 0.01, IOU_THRESHOLD: 0.5,
  MAX_DETECTIONS: 20, PRE_NMS_TOP_N: 1024}}
DATASET:
  DATASET: voc
  DATASET_DIR: {root}
  TRAIN_SETS: [['2007', 'trainval']]
  TEST_SETS: [['2007', 'test']]
  PROB: 0.6
  DEVICE_AUG: {device_aug}
  NUM_WORKERS: 2
  MAX_GT: 8
EXP_DIR: {exp}
LOG_DIR: {exp}/logs
RESUME_CHECKPOINT: ''
CHECKPOINTS_PREFIX: augpar
PHASE: ['train']
"""


def _cli(script, cfg_path, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, os.path.join(HERE, script), "--cfg", cfg_path],
        capture_output=True, text=True, timeout=3600, cwd=HERE, env=env)


def run_one(device_aug: bool, workdir: str, epochs: int, lr_step: int,
            env_extra=None) -> float:
    """Generate data (once per workdir), train + test via the real CLIs,
    return the mAP test.py prints."""
    from test_multiclass_map_cli import make_multiclass_voc

    root = os.path.join(workdir, "VOCdevkit")
    if not os.path.exists(root):
        make_multiclass_voc(root, n_images=100)
    tag = "device" if device_aug else "host"
    exp = os.path.join(workdir, f"exp_{tag}")
    cfg_path = os.path.join(workdir, f"cfg_{tag}.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root, exp=exp, epochs=epochs, lr_step=lr_step,
                           device_aug=device_aug))
    train = _cli("train.py", cfg_path, env_extra)
    if train.returncode != 0:
        raise RuntimeError(f"train({tag}) failed:\n" + train.stdout[-2000:]
                           + train.stderr[-2000:])
    test = _cli("test.py", cfg_path, env_extra)
    if test.returncode != 0:
        raise RuntimeError(f"test({tag}) failed:\n" + test.stdout[-2000:]
                           + test.stderr[-2000:])
    lines = [ln for ln in test.stdout.splitlines() if ln.startswith("test: mAP=")]
    if not lines:
        raise RuntimeError(f"no mAP line from test({tag}):\n" + test.stdout[-2000:])
    return float(lines[-1].split("mAP=")[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=70)
    ap.add_argument("--lr-step", type=int, default=50)
    ap.add_argument("--workdir", default="/tmp/aug_map_parity")
    ap.add_argument("--out")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    map_host = run_one(False, args.workdir, args.epochs, args.lr_step)
    print(f"# host-aug mAP = {map_host:.4f}", file=sys.stderr, flush=True)
    map_dev = run_one(True, args.workdir, args.epochs, args.lr_step)
    print(f"# device-aug mAP = {map_dev:.4f}", file=sys.stderr, flush=True)
    result = {"map_host": round(map_host, 4), "map_device": round(map_dev, 4),
              "delta": round(abs(map_host - map_dev), 4),
              "epochs": args.epochs}
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
