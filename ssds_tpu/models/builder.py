"""Model construction: string maps → (model, feature_maps) + anchor wiring.

Behavioral spec source: reference ``lib/modeling/model_builder.py`` (SURVEY.md
§2.5): ``create_model(cfg.MODEL)`` builds the backbone layer list, passes it
to the head builder, and measures each pyramid level's spatial size by
pushing a dummy forward with ``phase='feature'``
(``_forward_features_size``). TPU-first replacement (SURVEY.md §3.4): the
dummy forward becomes ``jax.eval_shape`` over an abstract ``init_with_output``
— zero FLOPs, no device work, trace-safe.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssds_tpu.models.backbones import networks_map
from ssds_tpu.models.heads import ssds_map
from ssds_tpu.ops.anchors import AnchorConfig, generate_anchors, num_anchors_per_cell


def _forward_features_size(model, image_size) -> List[Tuple[int, int]]:
    """Pyramid (H_k, W_k) sizes via abstract evaluation (no real compute)."""
    x = jnp.zeros((1, int(image_size[0]), int(image_size[1]), 3), jnp.float32)

    def init_features(rng):
        feats, _ = model.init_with_output(rng, x, phase="feature", train=False)
        return feats

    shapes = jax.eval_shape(init_features, jax.random.PRNGKey(0))
    return [(int(s.shape[1]), int(s.shape[2])) for s in shapes]


def create_model(model_cfg):
    """Build ``(model, feature_maps)`` from a ``cfg.MODEL`` subtree.

    Parity: reference ``create_model`` returns ``(nn.Module, feature_maps)``;
    here the flax module is returned uninitialized (params come from
    ``model.init`` in the Solver) along with per-level spatial sizes.
    """
    if model_cfg.NETS not in networks_map:
        raise KeyError(f"unknown backbone MODEL.NETS={model_cfg.NETS!r}")
    if model_cfg.SSDS not in ssds_map:
        raise KeyError(f"unknown head MODEL.SSDS={model_cfg.SSDS!r}")
    s2d = int(model_cfg.get("S2D_STEM", 0) or 0)
    h, w = (int(v) for v in model_cfg.IMAGE_SIZE)
    if s2d < 0:  # auto: tiled stem wherever it is exact and faster
        s2d = 2 if (str(model_cfg.NETS) == "vgg16"
                    and h % 2 == 0 and w % 2 == 0) else 0
    stages = int(model_cfg.get("S2D_STAGES", -1) or -1)
    if stages < 0:
        # auto resolves to STEM-ONLY: tiling stage 2 as well (S2D_STAGES=2)
        # was built, proven exact, and MEASURED A NET REGRESSION on v5e
        # (574 vs 661 img/s SSD300 batch-32) — conv2_x already runs at
        # ~79 TF/s with 128 output channels, so the 16/9 FLOP inflation of
        # the shifted-k2 rewrite plus the re-tiling transpose exceed the
        # codegen gain that made the 64-channel stem a win. BENCH_NOTES
        # round 3. The knob stays for re-measurement on other targets.
        stages = 1
    if s2d >= 2:
        if str(model_cfg.NETS) != "vgg16":
            raise ValueError("MODEL.S2D_STEM is implemented for vgg16 only")
        if stages >= 2 and (h % 4 or w % 4):
            raise ValueError(
                f"MODEL.S2D_STAGES=2 needs IMAGE_SIZE divisible by 4 "
                f"(pool1's output must tile 2x2 again), got {h}x{w}")
        from ssds_tpu.models.backbones.vgg import vgg16 as _vgg16

        base = _vgg16(s2d_block=s2d, s2d_stages=stages)
    else:
        base = networks_map[model_cfg.NETS]()
    mbox = num_anchors_per_cell(model_cfg.ASPECT_RATIOS)
    builder = ssds_map[model_cfg.SSDS]
    if str(model_cfg.SSDS).startswith("yolo"):
        model = builder(base, model_cfg.FEATURE_LAYER, mbox, model_cfg.NUM_CLASSES, model_cfg)
    else:
        model = builder(base, model_cfg.FEATURE_LAYER, mbox, model_cfg.NUM_CLASSES)
    feature_maps = _forward_features_size(model, model_cfg.IMAGE_SIZE)
    return model, feature_maps


def create_priors(model_cfg, feature_maps) -> np.ndarray:
    """The anchor set for a model config: ``[K, 4]`` center-form float32.

    Parity: reference ``PriorBox(...).forward()`` fed by
    ``_forward_features_size`` (SURVEY.md §3.1). Computed once in numpy at
    build time and embedded as a jit-time constant.
    """
    anchor_cfg = AnchorConfig(
        image_size=tuple(model_cfg.IMAGE_SIZE),
        feature_maps=tuple(feature_maps),
        aspect_ratios=tuple(tuple(a) for a in model_cfg.ASPECT_RATIOS),
        sizes=tuple(model_cfg.SIZES),
        steps=tuple(model_cfg.STEPS) if model_cfg.STEPS else (),
        clip=bool(model_cfg.CLIP),
    )
    return generate_anchors(anchor_cfg)


def init_model(model, model_cfg, rng=None, batch_size: int = 1, dtype=jnp.float32):
    """Initialize model variables with a dummy batch; returns the variables
    pytree (``{'params': ..., 'batch_stats': ...}``).

    The init runs under jit: one compiled program instead of hundreds of
    eager per-op dispatches (each of which pays the host↔device round trip
    on a tunneled runtime)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    h, w = int(model_cfg.IMAGE_SIZE[0]), int(model_cfg.IMAGE_SIZE[1])
    x = jnp.zeros((batch_size, h, w, 3), dtype)
    return jax.jit(lambda r: model.init(r, x, phase="train", train=False))(rng)
