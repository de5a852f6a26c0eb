"""Multi-class mAP oracle through the REAL CLI chain (VERDICT r3 item 6).

The single-class e2e (tests/test_solver_e2e.py) proves loss-drop and one
recovered box; this is the harder stand-in for VOC while no real data
exists on this machine: a GENERATED 5-class, 100-image VOC (class ==
rectangle color — learnable but not trivial: multiple objects per image,
varied sizes/positions) must train through ``python train.py --cfg`` and
reach **mAP >= 0.9** through ``python test.py --cfg`` — the full
production path: config → Solver → loader → jitted train step →
checkpoint manifest → auto-resume in the test CLI → fused eval forward →
detect → PASCAL devkit AP.

Reference anchor: test.py / lib/ssds_train.py:test_epoch (SURVEY.md §3.2);
acceptance bar BASELINE.json "VOC07 mAP parity".
"""

import os
import subprocess
import sys
import xml.etree.ElementTree as ET

import cv2
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# 5 VOC class names; class identity = fill color (BGR)
CLASSES = [
    ("aeroplane", (60, 60, 230)),
    ("bicycle", (60, 230, 60)),
    ("bird", (230, 60, 60)),
    ("boat", (40, 220, 220)),
    ("bottle", (220, 40, 220)),
]

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
  PROB: -1
  NUM_WORKERS: 2
  MAX_GT: 8
EXP_DIR: {exp}
LOG_DIR: {exp}/logs
RESUME_CHECKPOINT: ''
CHECKPOINTS_PREFIX: mc
PHASE: ['train']
"""


def make_multiclass_voc(root, n_images=100, seed=0):
    voc = os.path.join(root, "VOC2007")
    os.makedirs(os.path.join(voc, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(voc, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(voc, "ImageSets", "Main"), exist_ok=True)
    rng = np.random.default_rng(seed)
    ids = []
    W = H = 192
    for i in range(n_images):
        name = f"{i:06d}"
        ids.append(name)
        img = np.full((H, W, 3), 25, np.uint8)
        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        ET.SubElement(size, "width").text = str(W)
        ET.SubElement(size, "height").text = str(H)
        placed = []
        for _ in range(int(rng.integers(1, 4))):  # 1-3 objects
            cls, color = CLASSES[int(rng.integers(len(CLASSES)))]
            for _attempt in range(20):
                w = int(rng.uniform(45, 90))
                h = int(rng.uniform(45, 90))
                x1 = int(rng.uniform(2, W - w - 2))
                y1 = int(rng.uniform(2, H - h - 2))
                x2, y2 = x1 + w, y1 + h
                # keep objects disjoint so NMS/AP bookkeeping is unambiguous
                if all(x2 + 6 < a or x1 > c + 6 or y2 + 6 < b or y1 > d + 6
                       for a, b, c, d in placed):
                    break
            else:
                continue
            placed.append((x1, y1, x2, y2))
            img[y1:y2, x1:x2] = color
            obj = ET.SubElement(ann, "object")
            ET.SubElement(obj, "name").text = cls
            ET.SubElement(obj, "difficult").text = "0"
            bb = ET.SubElement(obj, "bndbox")
            ET.SubElement(bb, "xmin").text = str(x1 + 1)
            ET.SubElement(bb, "ymin").text = str(y1 + 1)
            ET.SubElement(bb, "xmax").text = str(x2)
            ET.SubElement(bb, "ymax").text = str(y2)
        cv2.imwrite(os.path.join(voc, "JPEGImages", name + ".jpg"), img)
        ET.ElementTree(ann).write(os.path.join(voc, "Annotations", name + ".xml"))
    # train and test on the same overfit set (the oracle is recovery, not
    # generalization — SURVEY §4 "overfit smoke standing in for VOC")
    for s in ("trainval", "test"):
        with open(os.path.join(voc, "ImageSets", "Main", s + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    return ids


def _run(script, cfg_path):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--cfg", cfg_path],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu")),
    )


@pytest.mark.slow
def test_multiclass_map_through_cli_chain(tmp_path):
    root = str(tmp_path / "VOCdevkit")
    exp = str(tmp_path / "exp")
    make_multiclass_voc(root, n_images=100)
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root, exp=exp, epochs=50, lr_step=35))

    train = _run("train.py", cfg_path)
    assert train.returncode == 0, train.stdout[-3000:] + train.stderr[-3000:]

    test = _run("test.py", cfg_path)
    assert test.returncode == 0, test.stdout[-3000:] + test.stderr[-3000:]
    line = [ln for ln in test.stdout.splitlines() if ln.startswith("test: mAP=")]
    assert line, test.stdout[-3000:]
    mAP = float(line[-1].split("mAP=")[1])
    assert mAP >= 0.9, f"multi-class CLI chain reached only mAP={mAP}"


CFG_COCO = """
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
  DATASET: coco
  DATASET_DIR: {root}
  TRAIN_SETS: [['2017', 'train']]
  TEST_SETS: [['2017', 'train']]
  PROB: -1
  NUM_WORKERS: 2
  MAX_GT: 8
EXP_DIR: {exp}
LOG_DIR: {exp}/logs
RESUME_CHECKPOINT: ''
CHECKPOINTS_PREFIX: mcc
PHASE: ['train']
"""


def make_multiclass_coco(root, n_images=100, seed=0):
    """Same generated scenes as make_multiclass_voc, in COCO format:
    root/annotations/instances_train2017.json + root/train2017/*.jpg."""
    import json

    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    rng = np.random.default_rng(seed)
    W = H = 192
    images, anns = [], []
    aid = 1
    for i in range(n_images):
        fname = f"{i:012d}.jpg"
        img = np.full((H, W, 3), 25, np.uint8)
        placed = []
        for _ in range(int(rng.integers(1, 4))):
            ci = int(rng.integers(len(CLASSES)))
            _, color = CLASSES[ci]
            for _attempt in range(20):
                w = int(rng.uniform(45, 90))
                h = int(rng.uniform(45, 90))
                x1 = int(rng.uniform(2, W - w - 2))
                y1 = int(rng.uniform(2, H - h - 2))
                x2, y2 = x1 + w, y1 + h
                if all(x2 + 6 < a or x1 > c + 6 or y2 + 6 < b or y1 > d + 6
                       for a, b, c, d in placed):
                    break
            else:
                continue
            placed.append((x1, y1, x2, y2))
            img[y1:y2, x1:x2] = color
            anns.append({
                "id": aid, "image_id": i, "category_id": ci + 1,
                "bbox": [float(x1), float(y1), float(w), float(h)],
                "iscrowd": 0, "area": float(w * h),
            })
            aid += 1
        cv2.imwrite(os.path.join(root, "train2017", fname), img)
        images.append({"id": i, "file_name": fname, "height": H, "width": W})
    data = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": k + 1, "name": n} for k, (n, _) in enumerate(CLASSES)],
    }
    with open(os.path.join(root, "annotations", "instances_train2017.json"), "w") as f:
        json.dump(data, f)


@pytest.mark.slow
def test_multiclass_map_through_cli_chain_coco(tmp_path):
    """The same multi-class CLI oracle through the COCO-format path
    (VERDICT r3 item 6 second half): generated COCO-JSON dataset,
    train.py -> test.py, native COCOeval. The gate is AP50 >= 0.9 (the
    VOC-comparable IoU-.5 metric); the strict AP@[.50:.95] headline is
    additionally required to clear 0.5 (localization must be tight, but
    a 96-px model on 192-px scenes is not expected to saturate AP75+)."""
    root = str(tmp_path / "coco")
    exp = str(tmp_path / "exp")
    make_multiclass_coco(root, n_images=100)
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG_COCO.format(root=root, exp=exp, epochs=50, lr_step=35))

    train = _run("train.py", cfg_path)
    assert train.returncode == 0, train.stdout[-3000:] + train.stderr[-3000:]

    test = _run("test.py", cfg_path)
    assert test.returncode == 0, test.stdout[-3000:] + test.stderr[-3000:]
    line = [ln for ln in test.stdout.splitlines() if ln.startswith("test: mAP=")]
    assert line, test.stdout[-3000:]
    ap = float(line[-1].split("mAP=")[1])
    ap50 = [ln for ln in test.stdout.splitlines()
            if "IoU=0.50 " in ln and "(AP)" in ln]
    assert ap50, test.stdout[-3000:]
    ap50_v = float(ap50[-1].rsplit("=", 1)[1])
    assert ap50_v >= 0.9, f"COCO CLI chain AP50={ap50_v} (AP={ap})"
    assert ap >= 0.5, f"COCO CLI chain AP={ap}"
