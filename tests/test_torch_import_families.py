"""Per-family torch .pth round-trip: fssd / rfb / ssd_lite / yolo.

VERDICT r2 item 5: the importer was proven on SSD300-VGG16 only; a real
reference ``.pth`` of another acceptance config could silently half-import.
These tests fabricate a complete reference-layout state_dict for each head
family FROM a freshly initialized model (inverse key map + inverse
transposes), import it into a differently-seeded init, and assert

- every tensor in the state_dict lands (tree equality on all exported
  paths), and
- forward logits agree exactly with the source parameters on a fixed input,

so any placement or transpose error in ``map_torch_key_candidates`` fails
loudly.

Layout provenance: the reference mount is empty (SURVEY.md §0), so the
torch-side key vocabulary is the documented reconstruction of the public
ssds.pytorch/RFBNet layouts (``lib/modeling/ssds/{fssd,rfb,ssd_lite}.py``):
FSSD ``transforms.{i}`` / ``pyramids.{i}.conv|bn`` / fusion ``norm`` BN;
RFB ``extras.{i}.branch{n}.{j}.conv|bn`` + ``ConvLinear`` + ``shortcut``
(BasicConv children), BasicRFB_a on ``norm``; SSDLite sequential dw/pw
stacks. YOLO has no stable public reference layout (SURVEY flags its v0
train path as experimental), so its round trip uses our own dotted naming —
the interchange format a torch export of this framework would produce.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import traverse_util

from ssds_tpu.config import cfg_from_file, default_config
from ssds_tpu.models.builder import create_model, init_model
from ssds_tpu.torch_import import import_torch_checkpoint

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow

HERE = __file__.rsplit("/", 2)[0]


# -- inverse key maps (our flax path -> reference-style torch key) ----------

def _rfb_inner_name(idx, flat):
    """Inverse of torch_import._rfb_subpath's index arithmetic."""
    table = ([(2, "branch0"), (3, "branch1"), (3, "branch2"), (4, "branch3")]
             if flat else [(2, "branch0"), (3, "branch1"), (4, "branch2")])
    j = idx
    for count, name in table:
        if j < count:
            return f"{name}.{j}"
        j -= count
    return "ConvLinear" if j == 0 else "shortcut"


def _seq_entry(sub):  # ConvBNReLU child -> (conv,bn,relu) sequential offset
    return 0 if sub == "Conv_0" else 1


def fssd_key(path):
    mod = path[1]
    if mod.startswith("base_layers_"):
        return f"base.{mod.rsplit('_', 1)[1]}"
    if mod.startswith("fusion_layers_"):
        blk, sub = int(mod.rsplit("_", 1)[1]), int(path[2].rsplit("_", 1)[1])
        return f"extras.{blk * 2 + sub}"
    if mod.startswith("transforms_"):
        return f"transforms.{mod.rsplit('_', 1)[1]}"
    if mod == "fusion_bn":
        return "norm"
    if mod.startswith("pyramid_layers_"):
        sub = "conv" if path[2] == "Conv_0" else "bn"
        return f"pyramids.{mod.rsplit('_', 1)[1]}.{sub}"
    if mod == "head":
        name = path[2]
        kind = "loc" if name.startswith("loc") else "conf"
        return f"{kind}.{name[len(kind):]}"
    raise KeyError(mod)


def rfb_key(path):
    mod = path[1]
    if mod.startswith("base_layers_"):
        return f"base.{mod.rsplit('_', 1)[1]}"
    if mod.startswith("extra_layers_"):
        i = int(mod.rsplit("_", 1)[1])
        if path[2].startswith("ConvBNReLU_"):  # BasicRFB block
            k = int(path[2].rsplit("_", 1)[1])
            sub = "conv" if path[3] == "Conv_0" else "bn"
            return f"extras.{i}.{_rfb_inner_name(k, flat=False)}.{sub}"
        sub = int(path[2].rsplit("_", 1)[1])  # plain Sequential tail
        return f"extras.{i * 2 + sub}"
    if mod == "norm":  # BasicRFB_a, flat Conv_k/BatchNorm_k naming
        k = int(path[2].rsplit("_", 1)[1])
        sub = "conv" if path[2].startswith("Conv_") else "bn"
        return f"norm.{_rfb_inner_name(k, flat=True)}.{sub}"
    if mod == "head":
        name = path[2]
        kind = "loc" if name.startswith("loc") else "conf"
        return f"{kind}.{name[len(kind):]}"
    raise KeyError(mod)


def ssd_lite_key(path):
    mod = path[1]
    if mod.startswith("base_layers_"):
        i = mod.rsplit("_", 1)[1]
        if path[2].startswith("ConvBNReLU_"):  # InvertedResidual child
            g = int(path[2].rsplit("_", 1)[1])
            return f"base.{i}.conv.{g * 3 + _seq_entry(path[3])}"
        # direct ConvBNReLU (stem / 1280 tail): plain sequential entry
        return f"base.{i}.{_seq_entry(path[2])}"
    if mod.startswith("extra_layers_"):
        blk, s = int(mod.rsplit("_", 1)[1]), int(path[2].rsplit("_", 1)[1])
        base = f"extras.{blk * 2 + s}"
        if len(path) > 5:  # layers_1/ConvBNReLU_g/{Conv_0,BatchNorm_0}/leaf
            g = int(path[3].rsplit("_", 1)[1])
            return f"{base}.{g * 3 + _seq_entry(path[4])}"
        return base
    if mod == "norm":
        return "norm"
    if mod == "head":
        name = path[2]  # loc_dw0 / conf_pw3
        kind = "loc" if name.startswith("loc") else "conf"
        rest = name[len(kind) + 1:]  # dw0 / pw3
        k = rest[2:]
        return f"{kind}.{k}.0" if rest.startswith("dw") else f"{kind}.{k}.3"
    raise KeyError(mod)


def yolo_key(path):
    mod = path[1]
    if mod.startswith("base_layers_"):
        return f"base.{mod.rsplit('_', 1)[1]}." + ".".join(path[2:-1])
    return ".".join(path[1:-1])


# -- harness ----------------------------------------------------------------

def _export_sd(variables, key_fn):
    """Inverse of import_torch_checkpoint: flax tree -> torch state_dict."""
    sd = {}
    for path, arr in traverse_util.flatten_dict(variables).items():
        arr = np.asarray(arr, np.float32)
        stem = key_fn(path)
        leaf = path[-1]
        if leaf == "kernel":
            sd[stem + ".weight"] = torch.tensor(np.transpose(arr, (3, 2, 0, 1)))  # HWIO->OIHW
        elif leaf == "scale":
            sd[stem + ".weight"] = torch.tensor(arr)
        elif leaf == "bias":
            sd[stem + ".bias"] = torch.tensor(arr)
        elif leaf == "mean":
            sd[stem + ".running_mean"] = torch.tensor(arr)
        elif leaf == "var":
            sd[stem + ".running_var"] = torch.tensor(arr)
        else:
            raise KeyError(leaf)
    return sd


def _roundtrip(cfg, key_fn, tmp_path):
    model, _ = create_model(cfg.MODEL)
    target = init_model(model, cfg.MODEL, jax.random.PRNGKey(0))
    source = init_model(model, cfg.MODEL, jax.random.PRNGKey(7))
    # distinct BN running stats too (init gives zeros/ones everywhere)
    source = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.default_rng(3).standard_normal(a.shape
                                                                      ).astype(a.dtype)
        if a.dtype in (jnp.float32, np.float32) else a,
        source,
    )

    sd = _export_sd(source, key_fn)
    pth = str(tmp_path / "family.pth")
    torch.save(sd, pth)
    out = import_torch_checkpoint(target, pth, verbose=True)

    # every exported tensor landed where it came from
    src_flat = traverse_util.flatten_dict(source)
    out_flat = traverse_util.flatten_dict(out)
    bad = [p for p in src_flat
           if not np.array_equal(np.asarray(out_flat[p]), np.asarray(src_flat[p]))]
    assert not bad, f"{len(bad)}/{len(src_flat)} tensors misplaced, e.g. {bad[:5]}"
    assert len(sd) == len(src_flat)

    # forward-logit agreement on a fixed input
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, cfg.MODEL.IMAGE_SIZE[0], cfg.MODEL.IMAGE_SIZE[1], 3)), jnp.float32)
    want = model.apply(source, x, phase="train", train=False)
    got = model.apply(out, x, phase="train", train=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        want, got)


def _small(cfg):
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.RESUME_CHECKPOINT = ""
    return cfg


def test_fssd_vgg16_roundtrip(tmp_path):
    cfg = _small(cfg_from_file(f"{HERE}/experiments/cfgs/fssd_vgg16_train_voc.yml"))
    _roundtrip(cfg, fssd_key, tmp_path)


def test_rfb_vgg16_roundtrip(tmp_path):
    cfg = _small(cfg_from_file(f"{HERE}/experiments/cfgs/rfb_vgg16_train_voc.yml"))
    _roundtrip(cfg, rfb_key, tmp_path)


def test_ssd_lite_mobilenetv2_roundtrip(tmp_path):
    cfg = _small(cfg_from_file(
        f"{HERE}/experiments/cfgs/ssd_lite_mobilenetv2_train_voc.yml"))
    _roundtrip(cfg, ssd_lite_key, tmp_path)


def test_yolo_v3_darknet53_roundtrip(tmp_path):
    cfg = _small(cfg_from_file(
        f"{HERE}/experiments/cfgs/yolo_v3_darknet_53_train_voc.yml"))
    _roundtrip(cfg, yolo_key, tmp_path)
