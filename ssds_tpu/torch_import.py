"""Import reference torch ``.pth`` checkpoints into ssds_tpu params.

The reference ships Google-Drive ``.pth`` weights per config (its README
model zoo; SURVEY.md §6). This importer maps a torch ``state_dict`` onto our
flax variable tree so those weights (and ImageNet-pretrained backbones, via
RESUME_SCOPE='base') can seed training or enable direct mAP-parity checks.

Key mapping rules:
- torch module paths ``base.0.weight`` -> flax ``('base_layers_0', 'kernel')``
  with conv kernels transposed OIHW -> HWIO and linear weights OI -> IO;
- BatchNorm: weight/bias -> scale/bias (params), running_mean/var ->
  mean/var (batch_stats);
- the head's per-source convs ``loc.{k}`` / ``conf.{k}`` -> ``head/loc{k}``.

Import is best-effort: unmapped keys are reported, shape mismatches skipped —
the same semantics as the reference's filtered ``resume_checkpoint``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax import traverse_util


def _convert_tensor(name: str, arr: np.ndarray) -> Tuple[str, np.ndarray]:
    """Torch leaf name + value -> flax leaf name + transposed value."""
    if name == "weight":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:  # linear OI -> IO
            return "kernel", np.transpose(arr, (1, 0))
        return "scale", arr  # 1-D weight = BN/L2Norm scale
    if name == "bias":
        return "bias", arr
    if name == "running_mean":
        return "mean", arr
    if name == "running_var":
        return "var", arr
    return name, arr


def map_torch_key(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """Map a torch state_dict key to (flax path prefix, leaf name).

    Structure notes (reference ssd.py builders -> our modules):
    - ``base.{i}``: the torch base ModuleList index i aligns 1:1 with our
      ``base_layers_{i}`` (ReLU/pool entries hold no params on either side).
    - ``extras.{j}``: the reference flattens extras into single convs
      (1x1, 3x3, 1x1, 3x3, ...); ours groups them into two-conv blocks
      ``extra_layers_{j//2}/layers_{j%2}``.
    - ``loc.{k}`` / ``conf.{k}``: per-source head convs -> ``head/loc{k}``.
    """
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    out = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m in ("base", "extras", "loc", "conf", "transforms", "pyramids") and i + 1 < len(
            mods
        ) and mods[i + 1].isdigit():
            idx = int(mods[i + 1])
            if m == "base":
                out.append(f"base_layers_{idx}")
            elif m == "extras":
                out += [f"extra_layers_{idx // 2}", f"layers_{idx % 2}"]
            elif m == "loc":
                out += ["head", f"loc{idx}"]
            elif m == "conf":
                out += ["head", f"conf{idx}"]
            elif m == "transforms":
                out.append(f"transforms_{idx}")
            elif m == "pyramids":
                out.append(f"pyramid_layers_{idx}")
            i += 2
            continue
        if m == "Norm" or m == "norm":
            out.append("norm")
            i += 1
            continue
        out.append(m)
        i += 1
    return tuple(out), leaf


def import_torch_checkpoint(variables: dict, pth_path: str, verbose: bool = True) -> dict:
    """Load a torch .pth (state_dict or {'state_dict': ...}) into
    ``variables``; returns a new pytree. Requires the baked-in cpu torch."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    def _ordered_subseq(prefix, path):
        """True when every prefix component appears in ``path`` in ORDER
        (position-preserving): guards the relaxed fallback against loading a
        tensor into an unrelated same-shaped parameter whose path merely
        CONTAINS the components in a different arrangement."""
        j = 0
        for p in prefix:
            while j < len(path) and path[j] != p:
                j += 1
            if j == len(path):
                return False
            j += 1
        return True

    flat = {k: np.asarray(v) for k, v in traverse_util.flatten_dict(variables).items()}
    loaded, missed, relaxed_log = 0, [], []
    for tkey, tval in sd.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        prefix, leaf = map_torch_key(tkey)
        leaf_name, arr = _convert_tensor(leaf, np.asarray(tval.numpy()))
        # search both params and batch_stats collections
        hits = [
            k for k in flat
            if k[1:len(prefix) + 1] == prefix and k[-1] == leaf_name
            and len(k) == len(prefix) + 2
        ]
        relaxed = False
        if not hits:
            # relaxed: prefix components as an ordered subsequence of the path
            hits = [
                k for k in flat
                if k[-1] == leaf_name and _ordered_subseq(prefix, k)
            ]
            relaxed = True
        placed = False
        for k in hits:
            if flat[k].shape == arr.shape:
                flat[k] = arr.astype(flat[k].dtype)
                loaded += 1
                placed = True
                if relaxed:
                    relaxed_log.append((tkey, "/".join(map(str, k))))
                break
        if not placed:
            missed.append(tkey)
    if verbose:
        print(f"torch import: {loaded} tensors loaded, {len(missed)} unmatched")
        if relaxed_log:
            print(f"  {len(relaxed_log)} relaxed-match placements (verify):")
            for t, f in relaxed_log[:8]:
                print(f"    {t} -> {f}")
        if missed[:5]:
            print("  first unmatched:", missed[:5])
    return traverse_util.unflatten_dict(flat)
