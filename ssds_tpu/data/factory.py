"""Dataset factory + host input pipeline.

Behavioral spec source: reference ``lib/dataset/dataset_factory.py``
(SURVEY.md §2.6): ``dataset_map={'voc','coco'}``; ``load_data(cfg.DATASET,
phase)`` picks TRAIN_SETS/TEST_SETS, builds ``preproc(IMAGE_SIZE,
PIXEL_MEANS, PROB)`` (PROB=-1 for eval), wraps in a loader with
``detection_collate``.

TPU-first deltas from the reference's torch DataLoader:

- **Static shapes**: ``detection_collate`` pads per-image targets to
  ``MAX_GT`` rows with a validity mask instead of returning ragged lists —
  one XLA program per phase, no recompiles (SURVEY.md §7 hard parts).
- **Threaded prefetch** instead of worker *processes*: cv2's imread/resize
  release the GIL, so threads saturate decode without pickling overhead; a
  bounded queue keeps ``PREFETCH`` batches ready so the accelerator never
  waits on the host.
- Train batches drop the last partial batch (shape stability); eval pads the
  final batch and reports the true count.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Tuple

import numpy as np

from ssds_tpu.data.augment import preproc
from ssds_tpu.data.coco import COCODetection
from ssds_tpu.data.voc import VOCDetection

dataset_map = {"voc": VOCDetection, "coco": COCODetection}

PREFETCH = 4


def detection_collate(samples, max_gt: int) -> dict:
    """Stack images; pad targets to ``[B, max_gt]`` with a validity mask.

    Parity: reference ``detection_collate`` stacks images and keeps targets
    as a ragged list (SURVEY.md §2.6); here the ragged list becomes padded
    dense arrays for XLA.
    """
    # dtype preserved: the pipeline emits uint8 and the device does mean-sub
    images = np.stack([s[0] for s in samples])
    b = len(samples)
    boxes = np.zeros((b, max_gt, 4), np.float32)
    labels = np.zeros((b, max_gt), np.int32)
    valid = np.zeros((b, max_gt), bool)
    sizes = np.zeros((b, 2), np.int32)
    for i, sample in enumerate(samples):
        target = sample[1]
        if len(sample) > 2:
            sizes[i] = sample[2]
        t = np.asarray(target, np.float32).reshape(-1, 5)
        # an all-zero single row is the "no GT" sentinel from preproc
        if not (t.shape[0] == 1 and not t.any()):
            n = min(t.shape[0], max_gt)
            boxes[i, :n] = t[:n, :4]
            labels[i, :n] = t[:n, 4].astype(np.int32)
            valid[i, :n] = True
    return {"images": images, "boxes": boxes, "labels": labels, "valid": valid, "sizes": sizes}


class DetectionLoader:
    """Threaded, prefetching batch loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, max_gt: int, shuffle: bool,
                 drop_last: bool, num_workers: int = 4, seed: int = 0,
                 shard_id: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size  # PER-PROCESS batch size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.epoch = 0
        # multi-host data sharding: every process sees the same permutation
        # (same seed) and takes its interleaved slice
        self.shard_id = shard_id
        self.num_shards = max(1, num_shards)

    def _shard_indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_id::self.num_shards]
        return idx

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = self._shard_indices()
        batches = []
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                chunk = chunk + chunk[: self.batch_size - len(chunk)]  # pad by wrap
            batches.append(chunk)
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self.epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=PREFETCH)
        task_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            task_q.put((bi, b))
        results = {}
        lock = threading.Lock()

        def worker():
            while True:
                try:
                    bi, chunk = task_q.get_nowait()
                except queue.Empty:
                    return
                samples = [self.dataset[i] for i in chunk]
                batch = detection_collate(samples, self.max_gt)
                with lock:
                    results[bi] = batch

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        next_bi = 0
        import time
        while next_bi < len(batches):
            with lock:
                batch = results.pop(next_bi, None)
            if batch is None:
                time.sleep(0.002)
                continue
            yield batch
            next_bi += 1


def load_data(dataset_cfg, phase: str, image_size=None, batch_size: int = 32,
              shard_id: int = 0, num_shards: int = 1) -> DetectionLoader:
    """Build the phase's loader (reference ``load_data(cfg.DATASET, phase)``).

    ``phase``: 'train' (TRAIN_SETS, augmentation PROB), 'eval'/'test'
    (TEST_SETS, PROB=-1), 'visualize' (TRAIN_SETS, PROB=-1).
    """
    name = dataset_cfg.DATASET
    if name not in dataset_map:
        raise KeyError(f"unknown DATASET.DATASET={name!r}")
    image_size = image_size or [300, 300]
    means = tuple(dataset_cfg.PIXEL_MEANS)
    if phase == "train":
        sets, prob, shuffle, drop_last = dataset_cfg.TRAIN_SETS, dataset_cfg.PROB, True, True
    elif phase in ("eval", "test"):
        sets, prob, shuffle, drop_last = dataset_cfg.TEST_SETS, -1, False, False
    elif phase == "visualize":
        sets, prob, shuffle, drop_last = dataset_cfg.TRAIN_SETS, -1, False, False
    else:
        raise ValueError(f"unknown phase {phase!r}")
    pre = preproc(image_size, means, prob)
    dataset = dataset_map[name](dataset_cfg.DATASET_DIR, sets, preproc=pre)
    return DetectionLoader(
        dataset,
        batch_size=batch_size,
        max_gt=int(dataset_cfg.MAX_GT),
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=int(dataset_cfg.NUM_WORKERS),
        shard_id=shard_id,
        num_shards=num_shards,
    )
