"""COCO detection dataset + native bbox evaluation (no pycocotools).

Behavioral spec source: reference ``lib/dataset/coco.py`` (SURVEY.md §2.6):
``COCODetection`` over pycocotools with category-id remap to contiguous
labels and ``evaluate_detections`` → ``COCOeval`` bbox summary. pycocotools
is not available in this environment (offline), so the annotation loading
uses the raw JSON and the evaluator is a native numpy reimplementation of
the COCOeval bbox protocol: per-category greedy score-ordered matching at
IoU thresholds .50:.05:.95, 101-point interpolated precision, maxDets=100,
AP/AP50/AP75 summary.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import cv2
import numpy as np


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
            for a in data["annotations"]:
                if a.get("iscrowd", 0):
                    continue
                x, y, w, h = a["bbox"]
                if w <= 0 or h <= 0:
                    continue
                anns_by_img[a["image_id"]].append(
                    [x, y, x + w, y + h, self.cat_to_contiguous[a["category_id"]]]
                )
            for img in data["images"]:
                iid = img["id"]
                self.ids.append((os.path.join(img_dir, img["file_name"]), iid))
                self.img_info[iid] = (img["height"], img["width"])
                self.annotations[iid] = np.asarray(
                    anns_by_img.get(iid, np.zeros((0, 5))), np.float32
                ).reshape(-1, 5)
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
        is 1-based (0 = background), mirroring the VOC convention. Returns
        COCO AP (IoU .50:.95) and prints the summary triple."""
        os.makedirs(output_dir, exist_ok=True)
        iou_thrs = np.arange(0.5, 1.0, 0.05)
        ap_per_cls = np.full((len(iou_thrs), self.num_classes), np.nan)

        for c in range(self.num_classes):
            # Gather detections and GT for this class over all images.
            dets = []  # (img_index, score, box)
            for im_ind in range(len(self.ids)):
                d = all_boxes[c + 1][im_ind]
                if d is None or len(d) == 0:
                    continue
                for row in np.asarray(d):
                    dets.append((im_ind, row[4], row[:4]))
            gts = {}
            npos = 0
            for im_ind, (_, iid) in enumerate(self.ids):
                ann = self.annotations[iid]
                g = ann[ann[:, 4] == c][:, :4]
                gts[im_ind] = g
                npos += len(g)
            if npos == 0:
                continue
            if not dets:
                ap_per_cls[:, c] = 0.0
                continue
            dets.sort(key=lambda t: -t[1])
            dets = dets[: 100 * len(self.ids)]

            for ti, thr in enumerate(iou_thrs):
                matched = {im: np.zeros(len(g), bool) for im, g in gts.items()}
                tp = np.zeros(len(dets))
                fp = np.zeros(len(dets))
                for di, (im, _, bb) in enumerate(dets):
                    g = gts[im]
                    if len(g) == 0:
                        fp[di] = 1
                        continue
                    ixmin = np.maximum(g[:, 0], bb[0])
                    iymin = np.maximum(g[:, 1], bb[1])
                    ixmax = np.minimum(g[:, 2], bb[2])
                    iymax = np.minimum(g[:, 3], bb[3])
                    iw = np.maximum(ixmax - ixmin, 0)
                    ih = np.maximum(iymax - iymin, 0)
                    inter = iw * ih
                    uni = (
                        (bb[2] - bb[0]) * (bb[3] - bb[1])
                        + (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
                        - inter
                    )
                    ious = inter / np.maximum(uni, 1e-12)
                    # best unmatched GT
                    order = np.argsort(-ious)
                    hit = -1
                    for j in order:
                        if ious[j] < thr:
                            break
                        if not matched[im][j]:
                            hit = j
                            break
                    if hit >= 0:
                        matched[im][hit] = True
                        tp[di] = 1
                    else:
                        fp[di] = 1
                tp_c = np.cumsum(tp)
                fp_c = np.cumsum(fp)
                rec = tp_c / npos
                prec = tp_c / np.maximum(tp_c + fp_c, 1e-12)
                # 101-point interpolation (COCOeval protocol)
                rthrs = np.linspace(0, 1, 101)
                mprec = prec.copy()
                for i in range(len(mprec) - 1, 0, -1):
                    mprec[i - 1] = max(mprec[i - 1], mprec[i])
                inds = np.searchsorted(rec, rthrs, side="left")
                q = np.zeros(101)
                valid = inds < len(mprec)
                q[valid] = mprec[inds[valid]]
                ap_per_cls[ti, c] = q.mean()

        ap = np.nanmean(ap_per_cls)
        ap50 = np.nanmean(ap_per_cls[0])
        ap75 = np.nanmean(ap_per_cls[5])
        print(f"COCO AP={ap:.4f} AP50={ap50:.4f} AP75={ap75:.4f}")
        return float(ap)
