"""COCO detection dataset + native bbox evaluation (no pycocotools).

Behavioral spec source: reference ``lib/dataset/coco.py`` (SURVEY.md §2.6):
``COCODetection`` over pycocotools with category-id remap to contiguous
labels and ``evaluate_detections`` → ``COCOeval`` bbox summary. pycocotools
is not available in this environment (offline), so the annotation loading
uses the raw JSON and the evaluator delegates to
:mod:`ssds_tpu.data.coco_eval`, a faithful native reimplementation of the
COCOeval bbox protocol (crowd-as-ignore, per-image maxDets, area ranges,
101-point interpolated precision, the full 12-metric summary).

Crowd handling: ``iscrowd`` annotations are EXCLUDED from training targets
(matching the reference's target transform) but KEPT as ignore regions for
evaluation — detections matching only a crowd are neither TP nor FP.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import cv2
import numpy as np

from ssds_tpu.data import coco_eval as _coco_eval


class COCODetection:
    """COCO dataset: index -> (preprocessed image, targets [N,5] pixel)."""

    def __init__(self, root, image_sets, preproc=None, target_transform=None,
                 dataset_name="COCO"):
        self.root = root
        self.image_set = image_sets
        self.preproc = preproc
        self.name = dataset_name
        self.ids = []           # (img_path, image_id)
        self.annotations = {}   # image_id -> [N, 5] (x1, y1, x2, y2, label)
        self.img_info = {}      # image_id -> (height, width)
        # eval-only ignore regions + segmentation areas (COCOeval protocol):
        # image_id -> ([N,5] crowd boxes+label, [N] area) and per-annotation
        # areas for the non-crowd GT rows (parallel to self.annotations)
        self.crowds = {}        # image_id -> [N, 5]
        self.crowd_areas = {}   # image_id -> [N]
        self.gt_areas = {}      # image_id -> [N] (parallel to annotations)

        cat_ids = None
        for year, split in image_sets:
            ann_file = os.path.join(root, "annotations", f"instances_{split}{year}.json")
            img_dir = os.path.join(root, f"{split}{year}")
            with open(ann_file) as f:
                data = json.load(f)
            if cat_ids is None:
                cat_ids = sorted(c["id"] for c in data["categories"])
                self.cat_ids = cat_ids
                self.cat_to_contiguous = {c: i for i, c in enumerate(cat_ids)}
                self.contiguous_to_cat = {i: c for c, i in self.cat_to_contiguous.items()}
                self.classes = tuple(
                    c["name"] for c in sorted(data["categories"], key=lambda c: c["id"])
                )
            anns_by_img = defaultdict(list)
            areas_by_img = defaultdict(list)
            crowds_by_img = defaultdict(list)
            crowd_areas_by_img = defaultdict(list)
            for a in data["annotations"]:
                x, y, w, h = a["bbox"]
                if w <= 0 or h <= 0:
                    continue
                row = [x, y, x + w, y + h, self.cat_to_contiguous[a["category_id"]]]
                # COCOeval area-range decisions use the annotation's 'area'
                # (segmentation area), falling back to the bbox area
                area = float(a.get("area", w * h))
                if a.get("iscrowd", 0):
                    crowds_by_img[a["image_id"]].append(row)
                    crowd_areas_by_img[a["image_id"]].append(area)
                else:
                    anns_by_img[a["image_id"]].append(row)
                    areas_by_img[a["image_id"]].append(area)
            for img in data["images"]:
                iid = img["id"]
                self.ids.append((os.path.join(img_dir, img["file_name"]), iid))
                self.img_info[iid] = (img["height"], img["width"])
                self.annotations[iid] = np.asarray(
                    anns_by_img.get(iid, np.zeros((0, 5))), np.float32
                ).reshape(-1, 5)
                self.gt_areas[iid] = np.asarray(
                    areas_by_img.get(iid, np.zeros(0)), np.float32)
                self.crowds[iid] = np.asarray(
                    crowds_by_img.get(iid, np.zeros((0, 5))), np.float32
                ).reshape(-1, 5)
                self.crowd_areas[iid] = np.asarray(
                    crowd_areas_by_img.get(iid, np.zeros(0)), np.float32)
        self.num_classes = len(self.cat_ids)

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, index):
        path, iid = self.ids[index]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        orig_hw = img.shape[:2]
        target = self.annotations[iid]
        if self.preproc is not None:
            img, target = self.preproc(img, target)
        return img, target, orig_hw

    def pull_image(self, index):
        path, _ = self.ids[index]
        return cv2.imread(path, cv2.IMREAD_COLOR)

    def pull_anno(self, index):
        _, iid = self.ids[index]
        return iid, self.annotations[iid]

    def pull_img_anno(self, index):
        path, iid = self.ids[index]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        gt = self.annotations[iid]
        h, w = self.img_info[iid]
        return img, gt, h, w

    # ---- evaluation ----

    def evaluate_detections(self, all_boxes, output_dir):
        """all_boxes[class][image] = [[x1,y1,x2,y2,score], ...]; class index
        is 1-based (0 = background), mirroring the VOC convention. Runs the
        full COCOeval bbox protocol (crowds as ignore regions, per-image
        maxDets, area ranges), writes ``detections_results.json`` (COCO
        result format), prints the 12-metric summary, and returns AP
        (IoU .50:.95, area=all, maxDets=100)."""
        os.makedirs(output_dir, exist_ok=True)

        gt_by_img_cat = {}
        for _, iid in self.ids:
            ann, areas = self.annotations[iid], self.gt_areas[iid]
            crowd, crowd_areas = self.crowds[iid], self.crowd_areas[iid]
            for c in range(self.num_classes):
                g = ann[:, 4] == c
                k = crowd[:, 4] == c
                if not g.any() and not k.any():
                    continue
                boxes = np.concatenate([ann[g][:, :4], crowd[k][:, :4]])
                iscrowd = np.concatenate(
                    [np.zeros(int(g.sum()), bool), np.ones(int(k.sum()), bool)])
                area = np.concatenate([areas[g], crowd_areas[k]])
                gt_by_img_cat[(iid, c)] = (boxes, iscrowd, area)

        dt_by_img_cat = {}
        results_json = []
        for c in range(self.num_classes):
            for im_ind, (_, iid) in enumerate(self.ids):
                d = all_boxes[c + 1][im_ind]
                if d is None or len(d) == 0:
                    continue
                d = np.asarray(d, np.float64).reshape(-1, 5)
                dt_by_img_cat[(iid, c)] = d
                for row in d:
                    results_json.append({
                        "image_id": int(iid),
                        "category_id": int(self.contiguous_to_cat[c]),
                        "bbox": [float(row[0]), float(row[1]),
                                 float(row[2] - row[0]), float(row[3] - row[1])],
                        "score": float(row[4]),
                    })
        with open(os.path.join(output_dir, "detections_results.json"), "w") as f:
            json.dump(results_json, f)

        stats = _coco_eval.evaluate(
            gt_by_img_cat, dt_by_img_cat,
            img_ids=[iid for _, iid in self.ids],
            cat_ids=list(range(self.num_classes)),
        )
        for line in stats.summary_lines():
            print(line)
        return float(stats["AP"])
