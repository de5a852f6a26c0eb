"""Experiment configuration: the reference's YAML schema, verbatim.

Behavioral spec source: reference ``lib/utils/config_parse.py`` (SURVEY.md
§2.3): a tree of defaults, recursively merged with a YAML file, with
type-checked merges and unknown-key errors. Every layer of the framework
reads from this tree; preserving the key schema is what lets existing
``experiments/cfgs/*.yml`` files run unchanged.

Design notes (TPU-first deltas from the reference):
- The reference mutates a process-global ``cfg`` EasyDict. Here
  :func:`cfg_from_file` RETURNS a fresh config tree (pure-function style,
  jit-friendly plumbing); a module-level ``cfg`` singleton is still exposed
  and updated in place for API parity with reference call sites.
- A ``TPU`` subtree is added (mesh shape, dtype policy, padded-GT size) —
  new keys for capabilities the reference lacks (SURVEY.md §2.8); defaults
  keep single-chip behavior so reference YAMLs need no edits.
"""

from __future__ import annotations

import copy
from typing import Any

import numpy as np
import yaml


class AttrDict(dict):
    """dict with attribute access (the reference's EasyDict role)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _ad(**kwargs) -> AttrDict:
    return AttrDict(kwargs)


def default_config() -> AttrDict:
    """The full default tree — key-for-key the reference schema (SURVEY.md §2.3)."""
    c = _ad(
        MODEL=_ad(
            SSDS="ssd",
            NETS="vgg16",
            IMAGE_SIZE=[300, 300],
            NUM_CLASSES=21,
            FEATURE_LAYER=[[22, 34, "S", "S", "", ""], [512, 1024, 512, 256, 256, 256]],
            STEPS=[],
            # -1 auto (tiled stem for vgg16 at even image sizes, +6.6% train
            # step), 0 off, 2 force the exact shifted-k2 space-to-depth stem
            S2D_STEM=-1,
            # how many VGG stages run tiled when S2D_STEM is on: -1 auto
            # (= stem only; stage 2 measured slower on v5e), 2 stem + conv2_x
            S2D_STAGES=-1,
            SIZES=[0.2, 0.95],
            ASPECT_RATIOS=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
            CLIP=True,
            HALF_PRECISION=True,  # bf16 compute on TPU
            # '' = fp serving; 'int8' = post-training-quantize the
            # ObjectDetector at construction (ssds_tpu/quant.py; the MXU's
            # s8 path, ~2x bf16). Calibration uses synthetic batches — call
            # detector.quantize_int8(real_images) for data-accurate scales.
            QUANT="",
            ANCHORS=[],  # YOLO-only: per-scale pixel (w, h) anchors; [] = paper defaults
        ),
        TRAIN=_ad(
            MAX_EPOCHS=300,
            CHECKPOINTS_EPOCHS=5,
            BATCH_SIZE=32,
            TRAINABLE_SCOPE="base,norm,extras,transforms,pyramids,loc,conf",
            RESUME_SCOPE="",
            OPTIMIZER=_ad(
                OPTIMIZER="sgd",
                LEARNING_RATE=0.001,
                DIFFERENTIAL_LEARNING_RATE=[],
                MOMENTUM=0.9,
                WEIGHT_DECAY=0.0005,
                EPS=1e-8,
                CLIP_GRADIENT=0.0,  # global-norm clip; 0 = off

            ),
            LR_SCHEDULER=_ad(
                SCHEDULER="step",
                STEPS=[1],
                GAMMA=0.98,
                LR_MIN=0.0,
                WARM_UP_EPOCHS=0,
            ),
        ),
        TEST=_ad(
            BATCH_SIZE=64,
            TEST_SCOPE=[0, 300],
        ),
        POST_PROCESS=_ad(
            NUM_CLASSES=21,
            BACKGROUND_LABEL=0,
            SCORE_THRESHOLD=0.01,
            IOU_THRESHOLD=0.6,
            MAX_DETECTIONS=100,
            TOP_K=200,
            VARIANCE=[0.1, 0.2],
            # TPU extension (no reference key): class-agnostic pre-NMS prune
            # width for the serving/eval detect program; 0 = exact reference
            # semantics. See ops/postprocess.PostProcessConfig.pre_nms_top_n.
            PRE_NMS_TOP_N=1024,
        ),
        DATASET=_ad(
            DATASET="voc",
            DATASET_DIR="data/VOCdevkit",
            TRAIN_SETS=[["2007", "trainval"], ["2012", "trainval"]],
            TEST_SETS=[["2007", "test"]],
            PROB=0.6,
            PIXEL_MEANS=(104, 117, 123),  # BGR order, as the reference
            NUM_WORKERS=8,
            DEVICE_ID=[0],
            MAX_GT=64,  # padded ground-truth boxes per image (static shapes)
            DEVICE_AUG=False,  # run augmentation on-TPU (host does resize only)
        ),
        # --- TPU-native additions (no reference equivalent; SURVEY.md §2.8) ---
        TPU=_ad(
            # -1: all visible devices on the data axis. SPATIAL > 1 splits
            # the image-height dim over a second mesh axis (GSPMD spatial
            # partitioning: XLA inserts halo exchanges for the convs) —
            # the conv-net TP analogue, for inputs too large per chip.
            MESH=_ad(DATA=-1, SPATIAL=1),
            COMPUTE_DTYPE="bfloat16",
            DONATE=True,
            DEBUG_NANS=False,  # jax debug_nans mode (SURVEY.md §5 sanitizer note)
            # Rematerialize the forward in the backward pass
            # (jax.checkpoint): trades ~1/3 more FLOPs for O(1)-depth
            # activation memory — enables batch sizes HBM could not
            # otherwise hold. Numerics unchanged (same ops replayed).
            REMAT=False,
        ),
        EXP_DIR="./experiments/models/ssd_vgg16_voc",
        LOG_DIR="./experiments/models/ssd_vgg16_voc/logs",
        RESUME_CHECKPOINT="",
        CHECKPOINTS_PREFIX="ssd_vgg16_voc",
        PHASE=["train"],
    )
    return c


#: process-global singleton, for reference-API parity (``from ssds_tpu.config import cfg``)
cfg = default_config()


def _merge_a_into_b(a: dict, b: AttrDict, path: str = "") -> None:
    """Recursively merge yaml dict ``a`` into default tree ``b``, type-checked.

    Parity: reference ``_merge_a_into_b`` — unknown keys and type mismatches
    raise (SURVEY.md §5 "unknown-key error parity").
    """
    for k, v in a.items():
        full = f"{path}.{k}" if path else k
        if k not in b:
            raise KeyError(f"{full} is not a valid config key")
        old = b[k]
        if isinstance(old, AttrDict):
            if not isinstance(v, dict):
                raise TypeError(f"config key {full}: expected mapping, got {type(v).__name__}")
            _merge_a_into_b(v, old, full)
            continue
        # Type coherence: allow numeric cross-assign and list/tuple equivalence.
        if old is not None and v is not None:
            old_t, new_t = type(old), type(v)
            if old_t is not new_t:
                if isinstance(old, (tuple, list)) and isinstance(v, (tuple, list)):
                    v = old_t(v)
                elif isinstance(old, bool) and isinstance(v, int):
                    v = bool(v)  # yaml `CLIP: 1` for a bool key
                elif isinstance(old, float) and isinstance(v, int):
                    v = float(v)
                elif isinstance(old, np.ndarray):
                    v = np.array(v, dtype=old.dtype)
                else:
                    raise TypeError(
                        f"config key {full}: type mismatch ({old_t.__name__} vs {new_t.__name__})"
                    )
        b[k] = v


def _to_attrdict(d: Any) -> Any:
    if isinstance(d, dict):
        return AttrDict({k: _to_attrdict(v) for k, v in d.items()})
    return d


def cfg_from_file(filename: str, base: AttrDict | None = None) -> AttrDict:
    """Load a YAML experiment file, merged over the defaults.

    Returns a NEW config tree and also refreshes the module-global ``cfg``
    in place (reference parity: ``cfg_from_file`` mutates the singleton).
    """
    with open(filename) as f:
        yaml_cfg = yaml.safe_load(f) or {}
    if not isinstance(yaml_cfg, dict):
        raise TypeError(f"{filename}: expected a YAML mapping, got {type(yaml_cfg).__name__}")
    out = copy.deepcopy(base) if base is not None else default_config()
    _merge_a_into_b(yaml_cfg, out)
    cfg.clear()
    cfg.update(copy.deepcopy(out))
    return out


def cfg_from_list(cfg_list, base: AttrDict | None = None) -> AttrDict:
    """Set config keys from a flat ['KEY.SUBKEY', value, ...] list (reference
    ``cfg_from_list``)."""
    assert len(cfg_list) % 2 == 0
    out = copy.deepcopy(base) if base is not None else copy.deepcopy(cfg)
    for key, value in zip(cfg_list[0::2], cfg_list[1::2]):
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node[p]
        leaf = parts[-1]
        if leaf not in node:
            raise KeyError(f"{key} is not a valid config key")
        old = node[leaf]
        if isinstance(value, str) and not isinstance(old, str):
            value = yaml.safe_load(value)
        _merge_a_into_b({leaf: value}, node, ".".join(parts[:-1]))
    cfg.clear()
    cfg.update(copy.deepcopy(out))
    return out
