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


def _rfb_subpath(tokens, flat: bool):
    """Translate a BasicRFB(_a) inner path (``branch{n}.{j}`` / ``ConvLinear``
    / ``shortcut``, optionally followed by BasicConv's ``conv``/``bn``) to our
    flax names.

    The reference wraps every conv in ``BasicConv`` (conv + bn). Our
    ``BasicRFB`` builds anonymous ``ConvBNReLU_k`` modules in branch order
    (b0: 2 convs, b1: 3, b2: 4, then ConvLinear, then the always-present
    shortcut); ``BasicRFB_a`` (``flat=True``) builds raw ``Conv_k`` /
    ``BatchNorm_k`` pairs (b0: 2, b1: 3, b2: 3, b3: 4, ConvLinear, shortcut).
    Returns the flax component list, or None if tokens don't parse.
    """
    offsets = {0: 0, 1: 2, 2: 5, 3: 8} if flat else {0: 0, 1: 2, 2: 5}
    linear_idx, short_idx = (12, 13) if flat else (9, 10)
    t = tokens[0]
    if t.startswith("branch") and t[6:].isdigit():
        if len(tokens) < 2 or not tokens[1].isdigit() or int(t[6:]) not in offsets:
            return None
        idx = offsets[int(t[6:])] + int(tokens[1])
        rest = tokens[2:]
    elif t == "ConvLinear":
        idx, rest = linear_idx, tokens[1:]
    elif t == "shortcut":
        idx, rest = short_idx, tokens[1:]
    else:
        return None
    sub = rest[0] if rest else "conv"
    if flat:
        return [f"Conv_{idx}" if sub == "conv" else f"BatchNorm_{idx}"]
    return [f"ConvBNReLU_{idx}", "Conv_0" if sub == "conv" else "BatchNorm_0"]


_RFB_INNER = ("ConvLinear", "shortcut")


def map_torch_key_candidates(torch_key: str):
    """Map a torch state_dict key to candidate (flax path prefix, leaf name)
    tuples, tried in order (first structural hit wins).

    Structure notes (reference ssd.py/fssd.py/rfb.py builders -> our modules):
    - ``base.{i}``: the torch base ModuleList index i aligns 1:1 with our
      ``base_layers_{i}`` (ReLU/pool entries hold no params on either side).
    - ``extras.{j}``: the reference flattens plain extras into single convs
      (1x1, 3x3, ...); ours groups them into two-conv blocks
      ``extra_layers_{j//2}/layers_{j%2}``. FSSD's fusion extras use the
      same torch name, so ``fusion_layers_{j//2}`` is a second candidate.
      An ``extras.{i}`` followed by RFB inner tokens (``branch*``,
      ``ConvLinear``, ``shortcut``) is a BasicRFB block: ``extra_layers_{i}``
      directly, inner path via :func:`_rfb_subpath`.
    - ``loc.{k}`` / ``conf.{k}``: per-source head convs -> ``head/loc{k}``;
      a further sequential index (SSDLite's dw+pw stack) routes position 0
      to ``loc_dw{k}`` and later convs to ``loc_pw{k}``.
    - ``norm``: L2Norm (ssd) / fusion BatchNorm (fssd) / BasicRFB_a (rfb) —
      candidates ``norm`` then ``fusion_bn``; RFB inner tokens use the
      flat Conv_k/BatchNorm_k naming of our BasicRFB_a.
    - bare ``conv`` / ``bn`` (reference BasicConv children) ->
      ``Conv_0`` / ``BatchNorm_0``.
    """
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    cands = [[]]
    i = 0

    def branch(*alternatives):
        nonlocal cands
        cands = [c + list(alt) for c in cands for alt in alternatives]

    while i < len(mods):
        m = mods[i]
        nxt = mods[i + 1] if i + 1 < len(mods) else None
        if m == "base" and nxt is not None and nxt.isdigit():
            branch([f"base_layers_{int(nxt)}"])
            i += 2
            continue
        if m == "extras" and nxt is not None and nxt.isdigit():
            idx = int(nxt)
            after = mods[i + 2] if i + 2 < len(mods) else None
            if after is not None and (after.startswith("branch") or after in _RFB_INNER):
                inner = _rfb_subpath(mods[i + 2:], flat=False)
                if inner is not None:
                    branch([f"extra_layers_{idx}"] + inner)
                    i = len(mods)
                    continue
            # Plain-conv extras. Primary: a pure ModuleList of flattened
            # conv pairs (SSD) -> block idx//2, conv idx%2; FSSD's fusion
            # extras share the torch name. RFB mixes BasicRFB blocks and
            # plain convs in ONE contiguous ModuleList, so a plain conv at
            # torch index idx follows n in-list RFB blocks -> our block
            # n + (idx-n)//2: shifted candidates for n=1..3 (structural
            # hit disambiguates — a BasicRFB module has no `layers_*`).
            shifted = [
                [f"extra_layers_{n + (idx - n) // 2}", f"layers_{(idx - n) % 2}"]
                for n in (1, 2, 3) if idx >= n
            ]
            branch([f"extra_layers_{idx // 2}", f"layers_{idx % 2}"],
                   [f"fusion_layers_{idx // 2}", f"layers_{idx % 2}"],
                   *shifted)
            i += 2
            continue
        if m in ("loc", "conf") and nxt is not None and nxt.isdigit():
            idx = int(nxt)
            after = mods[i + 2] if i + 2 < len(mods) else None
            if after is not None and after.isdigit():
                # SSDLite sequential: 0 = depthwise 3x3, later convs = pointwise
                kind = "dw" if int(after) == 0 else "pw"
                branch(["head", f"{m}_{kind}{idx}"])
                i += 3
                continue
            branch(["head", f"{m}{idx}"], ["head", f"{m}_pw{idx}"])
            i += 2
            continue
        if m == "transforms" and nxt is not None and nxt.isdigit():
            branch([f"transforms_{int(nxt)}"])
            i += 2
            continue
        if m == "pyramids" and nxt is not None and nxt.isdigit():
            branch([f"pyramid_layers_{int(nxt)}"])
            i += 2
            continue
        if m in ("Norm", "norm"):
            if nxt is not None and (nxt.startswith("branch") or nxt in _RFB_INNER):
                inner = _rfb_subpath(mods[i + 1:], flat=True)
                if inner is not None:
                    branch(["norm"] + inner)
                    i = len(mods)
                    continue
            branch(["norm"], ["fusion_bn"])
            i += 1
            continue
        if m == "conv" and nxt is not None and nxt.isdigit():
            # MobileNetV2 InvertedResidual: torch ``conv`` Sequential of
            # (conv, bn, relu6)* groups -> our anonymous ConvBNReLU_{g}
            j = int(nxt)
            branch([f"ConvBNReLU_{j // 3}",
                    "Conv_0" if j % 3 == 0 else "BatchNorm_0"])
            i += 2
            continue
        if m == "conv":
            branch(["Conv_0"])
            i += 1
            continue
        if m == "bn":
            branch(["BatchNorm_0"])
            i += 1
            continue
        if m.isdigit() and i == len(mods) - 1:
            # trailing Sequential index (conv_bn / conv_dw blocks): entry j
            # of a (conv, bn, relu)* stack -> group j//3; candidates cover a
            # SepConvBNReLU wrapper (ConvBNReLU_{g} child) and a direct
            # ConvBNReLU module (Conv_0/BatchNorm_0 at top level)
            j = int(m)
            sub = "Conv_0" if j % 3 == 0 else "BatchNorm_0"
            branch([f"ConvBNReLU_{j // 3}", sub], [sub], [m])
            i += 1
            continue
        branch([m])
        i += 1
    return [(tuple(c), leaf) for c in cands]


def map_torch_key(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """First (primary) candidate of :func:`map_torch_key_candidates`."""
    return map_torch_key_candidates(torch_key)[0]


def import_torch_checkpoint(variables: dict, pth_path: str, verbose: bool = True,
                            return_stats: bool = False):
    """Load a torch .pth (state_dict or {'state_dict': ...}) into
    ``variables``; returns a new pytree (or ``(pytree, stats)`` with
    ``return_stats``, where stats = {'loaded', 'missed', 'relaxed'}).
    Requires the baked-in cpu torch."""
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
        candidates = map_torch_key_candidates(tkey)
        leaf_name, arr = _convert_tensor(candidates[0][1], np.asarray(tval.numpy()))

        def _place(hits, relaxed):
            for k in hits:
                if flat[k].shape == arr.shape:
                    flat[k] = arr.astype(flat[k].dtype)
                    if relaxed:
                        relaxed_log.append((tkey, "/".join(map(str, k))))
                    return True
            return False

        # search both params and batch_stats collections; candidates in
        # order, exact prefix first (shallowest path wins), then the relaxed
        # ordered-subsequence fallback per candidate. A structural hit with
        # the WRONG shape does not consume the tensor — later candidates
        # still get their chance (RFB's mixed BasicRFB/plain-conv extras
        # indexing needs this: the unshifted candidate can exist but belong
        # to a different torch index).
        placed = False
        for cand_prefix, _ in candidates:
            hits = sorted(
                (k for k in flat
                 if k[1:len(cand_prefix) + 1] == cand_prefix and k[-1] == leaf_name),
                key=len,
            )
            if _place(hits, relaxed=False):
                placed = True
                break
        if not placed:
            for cand_prefix, _ in candidates:
                hits = [
                    k for k in flat
                    if k[-1] == leaf_name and _ordered_subseq(cand_prefix, k)
                ]
                if _place(hits, relaxed=True):
                    placed = True
                    break
        if placed:
            loaded += 1
        else:
            missed.append(tkey)
    if verbose:
        print(f"torch import: {loaded} tensors loaded, {len(missed)} unmatched")
        if relaxed_log:
            print(f"  {len(relaxed_log)} relaxed-match placements (verify):")
            for t, f in relaxed_log[:8]:
                print(f"    {t} -> {f}")
        if missed[:5]:
            print("  first unmatched:", missed[:5])
    tree = traverse_util.unflatten_dict(flat)
    if return_stats:
        return tree, {"loaded": loaded, "missed": missed, "relaxed": relaxed_log}
    return tree
