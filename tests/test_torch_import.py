"""Torch .pth importer: synthetic reference-style state_dict → flax params."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ssds_tpu.torch_import import import_torch_checkpoint, map_torch_key

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def test_map_torch_key():
    assert map_torch_key("base.0.weight") == (("base_layers_0",), "weight")
    # reference extras are a FLAT conv list; ours are 2-conv blocks
    assert map_torch_key("extras.1.bias") == (("extra_layers_0", "layers_1"), "bias")
    assert map_torch_key("extras.2.weight") == (("extra_layers_1", "layers_0"), "weight")
    assert map_torch_key("loc.2.weight") == (("head", "loc2"), "weight")
    assert map_torch_key("conf.0.bias") == (("head", "conf0"), "bias")


def test_import_conv_and_norm(tmp_path):
    # torch conv weight OIHW
    conv_w = torch.arange(2 * 3 * 3 * 3, dtype=torch.float32).reshape(2, 3, 3, 3)
    sd = {
        "base.0.weight": conv_w,
        "base.0.bias": torch.tensor([1.0, 2.0]),
        "norm.weight": torch.full((2,), 20.0),
    }
    path = str(tmp_path / "ref.pth")
    torch.save(sd, path)

    variables = {
        "params": {
            "base_layers_0": {
                "Conv_0": {"kernel": np.zeros((3, 3, 3, 2), np.float32),
                           "bias": np.zeros((2,), np.float32)},
            },
            "norm": {"scale": np.zeros((2,), np.float32)},
        }
    }
    out = import_torch_checkpoint(variables, path, verbose=False)
    got = out["params"]["base_layers_0"]["Conv_0"]["kernel"]
    want = np.transpose(conv_w.numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    np.testing.assert_allclose(out["params"]["base_layers_0"]["Conv_0"]["bias"], [1, 2])
    np.testing.assert_allclose(out["params"]["norm"]["scale"], 20.0)


def test_import_skips_shape_mismatch(tmp_path):
    sd = {"base.0.weight": torch.zeros(4, 4, 3, 3)}
    path = str(tmp_path / "bad.pth")
    torch.save(sd, path)
    variables = {"params": {"base_layers_0": {"Conv_0": {
        "kernel": np.ones((1, 1, 1, 1), np.float32)}}}}
    out = import_torch_checkpoint(variables, path, verbose=False)
    # unchanged on mismatch
    np.testing.assert_allclose(out["params"]["base_layers_0"]["Conv_0"]["kernel"], 1.0)


def test_full_ssd300_reference_checkpoint_import():
    """Fabricate a complete reference-shaped SSD300-VGG16 state_dict and
    verify EVERY tensor lands in the real model's params (transposed)."""
    import jax.numpy as jnp
    from flax import traverse_util

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, init_model

    cfg = default_config()
    model, _ = create_model(cfg.MODEL)
    variables = import_target = init_model(model, cfg.MODEL)
    flat = traverse_util.flatten_dict(variables)

    # Build the torch-side dict from our shapes (inverse transposes).
    sd = {}
    n_expected = 0
    for path, arr in flat.items():
        arr = np.asarray(arr)
        # path like ('params', 'base_layers_0', 'Conv_0', 'kernel')
        mod = path[1]
        if mod.startswith("base_layers_"):
            idx = mod.split("_")[-1]
            tkey = f"base.{idx}"
        elif mod.startswith("extra_layers_"):
            blk = int(mod.split("_")[-1])
            sub = int(path[2].split("_")[-1])  # layers_0 / layers_1
            tkey = f"extras.{blk * 2 + sub}"
        elif mod == "head":
            name = path[2]  # loc0 / conf3
            kind = "loc" if name.startswith("loc") else "conf"
            tkey = f"{kind}.{name[len(kind):]}"
        elif mod == "norm":
            tkey = "norm"
        else:
            continue
        leaf = path[-1]
        if leaf == "kernel":
            sd[tkey + ".weight"] = torch.tensor(np.transpose(arr, (3, 2, 0, 1)))
        elif leaf == "bias":
            sd[tkey + ".bias"] = torch.tensor(arr)
        elif leaf == "scale":
            sd[tkey + ".weight"] = torch.tensor(arr)
        n_expected += 1

    # distinctive values so placement is verifiable
    for k in sd:
        sd[k] = torch.randn_like(sd[k])

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pth = os.path.join(d, "ssd300.pth")
        torch.save(sd, pth)
        out = import_torch_checkpoint(import_target, pth, verbose=True)

    out_flat = traverse_util.flatten_dict(out)
    placed = 0
    for path, arr in flat.items():
        mod = path[1]
        if not (mod.startswith(("base_layers_", "extra_layers_")) or mod in ("head", "norm")):
            continue
        new = np.asarray(out_flat[path])
        leaf = path[-1]
        if leaf == "kernel":
            # reconstruct the torch key and verify exact transposed equality
            if mod.startswith("base_layers_"):
                tkey = f"base.{mod.split('_')[-1]}.weight"
            elif mod.startswith("extra_layers_"):
                blk = int(mod.split("_")[-1]); sub = int(path[2].split("_")[-1])
                tkey = f"extras.{blk * 2 + sub}.weight"
            else:
                name = path[2]
                kind = "loc" if name.startswith("loc") else "conf"
                tkey = f"{kind}.{name[len(kind):]}.weight"
            want = np.transpose(sd[tkey].numpy(), (2, 3, 1, 0))
            np.testing.assert_allclose(new, want, err_msg=str(path))
        placed += 1
    assert placed == n_expected
    assert n_expected > 60  # vgg 15 convs*2 + extras 8*2 + heads 12*2 + norm


def test_relaxed_match_requires_ordered_subsequence():
    """Regression (ADVICE r1 low): the relaxed fallback must not place a
    tensor into a same-shaped parameter whose path contains the prefix
    components out of order."""
    import os
    import tempfile

    variables = {"params": {
        # decoy whose path has the components REVERSED relative to the
        # torch key's module order, same leaf shape
        "conf_adapter": {"head": {"kernel": np.zeros((3, 3, 4, 8), np.float32)}},
        "head": {"conf0": {"kernel": np.zeros((3, 3, 4, 8), np.float32)}},
    }}
    sd = {"conf.0.weight": torch.ones((8, 4, 3, 3))}
    pth = os.path.join(tempfile.mkdtemp(), "w.pth")
    torch.save(sd, pth)
    out = import_torch_checkpoint(variables, pth, verbose=False)
    # exact path exists -> loads there, decoy untouched
    assert out["params"]["head"]["conf0"]["kernel"].any()
    assert not out["params"]["conf_adapter"]["head"]["kernel"].any()

    # with the exact target absent, the out-of-order decoy must NOT receive
    # the tensor (ordered-subsequence check): ('conf_adapter','head',...) has
    # 'head' AFTER the conf component while the prefix is ('head','conf0')
    variables2 = {"params": {
        "conf_adapter": {"head": {"kernel": np.zeros((3, 3, 4, 8), np.float32)}},
    }}
    out2 = import_torch_checkpoint(variables2, pth, verbose=False)
    assert not out2["params"]["conf_adapter"]["head"]["kernel"].any()
