"""COCODetection + native COCO evaluator on a synthetic dataset."""

import json
import os

import cv2
import numpy as np
import pytest

from ssds_tpu.data.coco import COCODetection

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


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


def _stats(gt, dt, img_ids, cat_ids=(0,)):
    from ssds_tpu.data import coco_eval

    return coco_eval.evaluate(gt, dt, img_ids=list(img_ids), cat_ids=list(cat_ids))


def test_cocoeval_crowd_is_ignore_region():
    """A detection whose only match is an iscrowd GT is neither TP nor FP —
    even when it OUTRANKS the true positive (hand-computed COCOeval case:
    without ignore semantics the high-scoring crowd det would halve AP)."""
    gt = {(0, 0): (
        np.array([[10, 10, 50, 50], [60, 60, 100, 100]], float),  # real, crowd
        np.array([False, True]),
        np.array([1600.0, 1600.0]),
    )}
    dt = {(0, 0): np.array([
        [60, 60, 100, 100, 0.95],  # inside the crowd only
        [10, 10, 50, 50, 0.90],    # exact match on the real GT
    ])}
    stats = _stats(gt, dt, [0])
    assert stats["AP"] == pytest.approx(1.0, abs=1e-6)
    assert stats["AP50"] == pytest.approx(1.0, abs=1e-6)

    # and a detection matching NOTHING is still an FP (ranked first -> AP .5)
    dt_fp = {(0, 0): np.array([
        [200, 200, 240, 240, 0.95],
        [10, 10, 50, 50, 0.90],
    ])}
    stats = _stats(gt, dt_fp, [0])
    assert stats["AP50"] == pytest.approx(0.5, abs=0.02)


def test_cocoeval_crowd_iou_uses_detection_area():
    """IoU against a crowd divides by the DETECTION area: a small det fully
    inside a big crowd has crowd-IoU 1.0 (ignored), though corner IoU ~0.04."""
    gt = {(0, 0): (
        np.array([[0, 0, 200, 200], [300, 300, 340, 340]], float),
        np.array([True, False]),   # big crowd + one real GT
        np.array([40000.0, 1600.0]),
    )}
    dt = {(0, 0): np.array([
        [50, 50, 90, 90, 0.95],      # tiny det inside the crowd: ignore
        [300, 300, 340, 340, 0.90],  # TP
    ])}
    stats = _stats(gt, dt, [0])
    assert stats["AP"] == pytest.approx(1.0, abs=1e-6)


def test_cocoeval_maxdets_is_per_image():
    """maxDets=100 caps detections PER IMAGE: a TP ranked 101st within its
    own image is dropped even though the global det budget (100 x n_images)
    would have kept it (the round-1 evaluator's global-cap bug)."""
    gt = {(0, 0): (np.array([[10, 10, 50, 50]], float),
                   np.array([False]), np.array([1600.0]))}
    junk = [[60 + i * 0.01, 60, 70, 70, 0.99 - i * 1e-4] for i in range(100)]
    dt = {(0, 0): np.array(junk + [[10, 10, 50, 50, 0.5]])}
    stats = _stats(gt, dt, [0, 1])  # 2 images -> global cap would be 200
    assert stats["AP"] == pytest.approx(0.0, abs=1e-6)
    assert stats["AR100"] == pytest.approx(0.0, abs=1e-6)
    # drop one junk det -> the TP fits within the per-image cap
    dt2 = {(0, 0): np.array(junk[:99] + [[10, 10, 50, 50, 0.5]])}
    stats2 = _stats(gt, dt2, [0, 1])
    assert stats2["AR100"] == pytest.approx(1.0, abs=1e-6)


def test_cocoeval_area_ranges():
    """AP_small/medium/large: GTs outside the range are ignored (their
    matched dets too); absent ranges report -1 like COCOeval."""
    gt = {(0, 0): (
        np.array([[0, 0, 16, 16], [100, 100, 300, 300]], float),  # small, large
        np.array([False, False]),
        np.array([256.0, 40000.0]),
    )}
    dt = {(0, 0): np.array([
        [0, 0, 16, 16, 0.9],
        [100, 100, 300, 300, 0.8],
    ])}
    stats = _stats(gt, dt, [0])
    assert stats["AP"] == pytest.approx(1.0, abs=1e-6)
    assert stats["APs"] == pytest.approx(1.0, abs=1e-6)
    assert stats["APl"] == pytest.approx(1.0, abs=1e-6)
    assert stats["APm"] == -1.0  # no medium GT anywhere


def test_cocoeval_ar_maxdets_ladder():
    """AR1 sees only the best det per image; AR10/AR100 see them all."""
    gt = {(0, 0): (
        np.array([[0, 0, 40, 40], [100, 100, 140, 140]], float),
        np.array([False, False]),
        np.array([1600.0, 1600.0]),
    )}
    dt = {(0, 0): np.array([
        [0, 0, 40, 40, 0.9],
        [100, 100, 140, 140, 0.8],
    ])}
    stats = _stats(gt, dt, [0])
    assert stats["AR1"] == pytest.approx(0.5, abs=1e-6)
    assert stats["AR10"] == pytest.approx(1.0, abs=1e-6)
    assert stats["AR100"] == pytest.approx(1.0, abs=1e-6)


def test_coco_dataset_keeps_crowds_for_eval(tmp_path):
    """Crowd annotations are excluded from training targets but reach the
    evaluator as ignore regions through evaluate_detections."""
    root = str(tmp_path / "coco")
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "val2017"), exist_ok=True)
    cv2.imwrite(os.path.join(root, "val2017", "000000000000.jpg"),
                np.full((100, 120, 3), 40, np.uint8))
    data = {
        "images": [{"id": 0, "file_name": "000000000000.jpg",
                    "height": 100, "width": 120}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [10, 10, 40, 40], "iscrowd": 0, "area": 1600},
            {"id": 2, "image_id": 0, "category_id": 1,
             "bbox": [60, 60, 40, 30], "iscrowd": 1, "area": 1200},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    with open(os.path.join(root, "annotations", "instances_val2017.json"), "w") as f:
        json.dump(data, f)
    ds = COCODetection(root, [["2017", "val"]], preproc=None)
    # training targets: crowd excluded
    _, target, _ = ds[0]
    assert target.shape[0] == 1
    # eval: a high-scoring det on the crowd must not cost AP
    all_boxes = [[[]], [[[60, 60, 100, 90, 0.99], [10, 10, 50, 50, 0.9]]]]
    ap = ds.evaluate_detections(all_boxes, os.path.join(root, "out"))
    assert ap == pytest.approx(1.0, abs=1e-6)
    # and the COCO-format results file is written
    with open(os.path.join(root, "out", "detections_results.json")) as f:
        res = json.load(f)
    assert len(res) == 2 and res[0]["category_id"] == 1


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


def test_coco_solver_lifecycle(coco_root, tmp_path):
    """Full Solver train->checkpoint->test_model over the COCO branch
    (loader wiring, contiguous label mapping through loss and detect, and
    the native COCOeval path from inside the Solver — the VOC twin lives
    in test_solver_e2e.py)."""
    from ssds_tpu.config import default_config
    from ssds_tpu.solver import Solver

    exp = str(tmp_path / "exp_coco")
    cfg = default_config()
    cfg.MODEL.SSDS = "ssd_lite"
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.NUM_CLASSES = 4  # 3 synthetic categories + background
    cfg.MODEL.FEATURE_LAYER = [[11, 13], [128, 256]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.3, 0.6, 0.9]
    cfg.MODEL.HALF_PRECISION = False
    cfg.POST_PROCESS.NUM_CLASSES = 4
    cfg.POST_PROCESS.MAX_DETECTIONS = 10
    cfg.TRAIN.MAX_EPOCHS = 1
    cfg.TRAIN.CHECKPOINTS_EPOCHS = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.TRAINABLE_SCOPE = ""
    cfg.TEST.BATCH_SIZE = 2
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.DATASET_DIR = coco_root
    cfg.DATASET.TRAIN_SETS = [["2017", "val"]]
    cfg.DATASET.TEST_SETS = [["2017", "val"]]
    cfg.DATASET.PROB = -1.0
    cfg.DATASET.NUM_WORKERS = 0
    cfg.DATASET.MAX_GT = 8
    cfg.EXP_DIR = exp
    cfg.LOG_DIR = os.path.join(exp, "logs")
    cfg.CHECKPOINTS_PREFIX = "coco_smoke"
    cfg.PHASE = ["train"]

    solver = Solver(cfg)
    solver.train_model()
    assert os.path.exists(os.path.join(exp, "coco_smoke_epoch_1.ckpt"))

    ap = solver.test_model()  # native COCOeval AP@[.5:.95] via the Solver
    assert 0.0 <= ap <= 1.0
