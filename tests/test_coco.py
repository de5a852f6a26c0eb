"""COCODetection + native COCO evaluator on a synthetic dataset."""

import json
import os

import cv2
import numpy as np
import pytest

from ssds_tpu.data.coco import COCODetection


@pytest.fixture
def coco_root(tmp_path):
    root = str(tmp_path / "coco")
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "val2017"), exist_ok=True)
    images, anns = [], []
    rng = np.random.default_rng(0)
    aid = 1
    for i in range(4):
        fname = f"{i:012d}.jpg"
        img = np.full((100, 120, 3), 40, np.uint8)
        cv2.imwrite(os.path.join(root, "val2017", fname), img)
        images.append({"id": i, "file_name": fname, "height": 100, "width": 120})
        for _ in range(2):
            x, y = float(rng.uniform(5, 60)), float(rng.uniform(5, 50))
            w, h = float(rng.uniform(20, 40)), float(rng.uniform(20, 40))
            anns.append({
                "id": aid, "image_id": i, "category_id": int(rng.choice([1, 3, 7])),
                "bbox": [x, y, w, h], "iscrowd": 0, "area": w * h,
            })
            aid += 1
    data = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": 1, "name": "person"}, {"id": 3, "name": "car"},
                       {"id": 7, "name": "train"}],
    }
    with open(os.path.join(root, "annotations", "instances_val2017.json"), "w") as f:
        json.dump(data, f)
    return root


def test_coco_dataset_loads(coco_root):
    ds = COCODetection(coco_root, [["2017", "val"]], preproc=None)
    assert len(ds) == 4
    assert ds.num_classes == 3
    img, target, hw = ds[0]
    assert img.shape == (100, 120, 3)
    assert target.shape[1] == 5
    # labels remapped contiguous [0, 3)
    assert set(np.unique(target[:, 4])).issubset({0.0, 1.0, 2.0})


def test_coco_eval_perfect_predictions(coco_root):
    ds = COCODetection(coco_root, [["2017", "val"]], preproc=None)
    n_img, n_cls = len(ds), ds.num_classes
    all_boxes = [[[] for _ in range(n_img)] for _ in range(n_cls + 1)]
    for im in range(n_img):
        _, iid = ds.ids[im]
        for box in ds.annotations[iid]:
            c = int(box[4])
            all_boxes[c + 1][im].append([box[0], box[1], box[2], box[3], 0.99])
    ap = ds.evaluate_detections(all_boxes, os.path.join(coco_root, "out"))
    assert ap == pytest.approx(1.0, abs=1e-6)


def test_coco_eval_misses_score_low(coco_root):
    ds = COCODetection(coco_root, [["2017", "val"]], preproc=None)
    n_img, n_cls = len(ds), ds.num_classes
    # no detections at all -> AP 0
    all_boxes = [[[] for _ in range(n_img)] for _ in range(n_cls + 1)]
    ap = ds.evaluate_detections(all_boxes, os.path.join(coco_root, "out2"))
    assert ap == pytest.approx(0.0, abs=1e-6)


def test_coco_via_factory(coco_root):
    """load_data wires the COCO dataset through the loader (factory branch)."""
    from ssds_tpu.config import default_config
    from ssds_tpu.data.factory import load_data

    cfg = default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.DATASET_DIR = coco_root
    cfg.DATASET.TEST_SETS = [["2017", "val"]]
    cfg.DATASET.MAX_GT = 8
    cfg.DATASET.NUM_WORKERS = 0
    loader = load_data(cfg.DATASET, "test", image_size=[96, 96], batch_size=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (2, 96, 96, 3)
    assert b["images"].dtype == np.uint8
    assert b["valid"].any()
