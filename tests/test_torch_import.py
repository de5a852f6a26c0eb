"""Torch .pth importer: synthetic reference-style state_dict → flax params."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ssds_tpu.torch_import import import_torch_checkpoint, map_torch_key


def test_map_torch_key():
    assert map_torch_key("base.0.weight") == (("base_layers_0",), "weight")
    assert map_torch_key("extras.1.bias") == (("extra_layers_1",), "bias")
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
