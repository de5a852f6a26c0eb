"""Importer audit against torch-GENERATED reference-layout state_dicts.

VERDICT r3 item 8: the hand-fabricated key tests can share a blind spot
with the importer; here real ``nn.Module`` trees (tests/ref_torch_skeletons)
produce the state_dict — Sequential flattening, recursive prefixes,
``num_batches_tracked`` buffers and all — and the importer must map
>= 99% of tensors for every acceptance family with ZERO relaxed-fallback
placements and land values exactly (transpose round-trip spot checks).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import traverse_util

from ssds_tpu.config import cfg_from_file
from ssds_tpu.models.builder import create_model
from ssds_tpu.torch_import import import_torch_checkpoint
from ref_torch_skeletons import build_skeleton

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow

HERE = __file__.rsplit("/", 2)[0]

CASES = [
    ("ssd_vgg16_train_voc.yml", "ssd", "vgg"),
    ("ssd_lite_mobilenetv2_train_coco.yml", "ssd_lite", "mbv2"),
    ("ssd_lite_mobilenetv1_train_voc.yml", "ssd_lite", "mbv1"),
    ("fssd_vgg16_train_voc.yml", "fssd", "vgg"),
    ("rfb_vgg16_train_voc.yml", "rfb", "vgg"),
]


def _abstract_variables(yml):
    cfg = cfg_from_file(f"{HERE}/experiments/cfgs/{yml}")
    cfg.RESUME_CHECKPOINT = ""
    model, _ = create_model(cfg.MODEL)
    h, w = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
                           phase="train", train=True))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


@pytest.mark.parametrize("yml,family,net", CASES,
                         ids=[c[0][:-4] for c in CASES])
def test_skeleton_state_dict_fully_imports(yml, family, net, tmp_path):
    variables = _abstract_variables(yml)
    skel = build_skeleton(family, variables, net)
    # randomize so value checks are meaningful
    sd = skel.state_dict()
    g = torch.Generator().manual_seed(0)
    sd = {k: (torch.rand(v.shape, generator=g) if v.dtype.is_floating_point
              else v) for k, v in sd.items()}
    pth = str(tmp_path / "skel.pth")
    torch.save(sd, pth)

    imported, stats = import_torch_checkpoint(variables, pth, verbose=True,
                                              return_stats=True)
    n_tensors = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    n_leaves = len(jax.tree.leaves(variables))
    assert n_tensors == n_leaves, (
        f"skeleton/model leaf-count mismatch: torch {n_tensors} vs flax "
        f"{n_leaves} — the skeleton does not mirror the model")
    assert stats["missed"] == [], stats["missed"][:10]
    assert stats["relaxed"] == [], stats["relaxed"][:10]
    assert stats["loaded"] == n_tensors

    # value spot-checks: conv transpose round-trip on first/last base conv
    flat = {"/".join(map(str, k)): v
            for k, v in traverse_util.flatten_dict(imported).items()}

    def tkey_of(prefix):
        ks = sorted(k for k in sd if k.startswith(prefix) and k.endswith("weight")
                    and sd[k].ndim == 4)
        return ks[0]

    k0 = tkey_of("base.0")
    ours = [v for p, v in flat.items()
            if p.startswith("params/base_layers_0/") and p.endswith("kernel")]
    np.testing.assert_array_equal(
        ours[0], np.transpose(sd[k0].numpy(), (2, 3, 1, 0)))
