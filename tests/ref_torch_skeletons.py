"""Reference-layout torch skeletons, built as REAL ``nn.Module`` trees.

VERDICT r3 item 8: the family import tests fabricated state_dict KEYS by
hand — real torch module nesting produces details hand fabrication can get
wrong (Sequential index flattening, recursive prefixes, BN buffer names
incl. ``num_batches_tracked``). These builders reconstruct the reference
builders' module STRUCTURE (public ssds.pytorch ``lib/modeling``
layouts, SURVEY.md §2.5 — the mount is empty, so structure is the
documented reconstruction) with parameter SHAPES pulled from our flax
variable tree, and let ``torch.state_dict()`` generate the key vocabulary.

Structures:
- VGG base: one flat ModuleList, convs at the classic indices, ReLU/pool
  at the gaps (parameterless) — ``base.{i}.weight``.
- MobileNetV2 base: ``conv_bn`` stem/tail Sequentials and InvertedResidual
  blocks whose ``.conv`` Sequential flattens (conv,bn,relu6)* groups with
  the last group linear — ``base.{i}.conv.{j}.weight``.
- SSD extras: flattened conv pairs in one ModuleList (``extras.{2k+s}``);
  SSDLite extras: plain 1x1 + (dw conv,bn,relu6,pw conv,bn,relu6)
  Sequential; RFB extras: BasicRFB blocks (BasicConv children with
  ``.conv``/``.bn``) and plain convs CONTIGUOUS in one ModuleList.
- Heads: per-source convs (``loc.{k}``); SSDLite dw+pw Sequentials.
- ``norm``: L2Norm (ssd/ssd_lite) / BasicRFB_a (rfb); FSSD's fusion BN is
  a top-level ``norm`` BatchNorm in the reference — exported here under
  that name.
"""

import torch
import torch.nn as nn
from flax import traverse_util


def module_tree(variables) -> dict:
    """Merge params+batch_stats into one nested plain dict of shapes."""
    tree = {}
    for key, val in traverse_util.flatten_dict(variables).items():
        d = tree
        for part in key[1:-1]:
            d = d.setdefault(str(part), {})
        d[str(key[-1])] = tuple(val.shape)
    return tree


def conv_from(d) -> nn.Conv2d:
    kh, kw, cin_g, cout = d["kernel"]
    bias = "bias" in d
    if cin_g == 1 and (kh, kw) != (1, 1):  # depthwise
        return nn.Conv2d(cout, cout, (kh, kw), groups=cout, bias=bias)
    return nn.Conv2d(cin_g, cout, (kh, kw), bias=bias)


def bn_from(d) -> nn.BatchNorm2d:
    c = d["scale"][0] if "scale" in d else d["mean"][0]
    return nn.BatchNorm2d(c)


def conv_bn_seq(d, act=nn.ReLU) -> nn.Sequential:
    return nn.Sequential(conv_from(d["Conv_0"]), bn_from(d["BatchNorm_0"]), act())


class L2Norm(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.weight = nn.Parameter(torch.full((c,), 20.0))


class BasicConv(nn.Module):
    """Reference RFB BasicConv: .conv + .bn children."""

    def __init__(self, conv_d, bn_d):
        super().__init__()
        self.conv = conv_from(conv_d)
        self.bn = bn_from(bn_d)


def _mod_index(mods, prefix):
    return sorted(
        (int(k.rsplit("_", 1)[1]), v)
        for k, v in mods.items() if k.startswith(prefix)
    )


def vgg_base(mods) -> nn.ModuleList:
    idxs = dict(_mod_index(mods, "base_layers_"))
    out = []
    for i in range(max(idxs) + 1):
        out.append(conv_from(idxs[i]["Conv_0"]) if i in idxs
                   else nn.ReLU(inplace=True))
    return nn.ModuleList(out)


def mbv2_base(mods) -> nn.ModuleList:
    out = []
    for _, sub in _mod_index(mods, "base_layers_"):
        if "Conv_0" in sub:  # conv_bn stem / 1x1 tail
            out.append(conv_bn_seq(sub, nn.ReLU6))
        else:  # InvertedResidual: .conv Sequential, last group linear
            groups = _mod_index(sub, "ConvBNReLU_")
            seq = []
            for g, (_, gd) in enumerate(groups):
                seq += [conv_from(gd["Conv_0"]), bn_from(gd["BatchNorm_0"])]
                if g < len(groups) - 1:
                    seq.append(nn.ReLU6())
            ir = nn.Module()
            ir.conv = nn.Sequential(*seq)
            out.append(ir)
    return nn.ModuleList(out)


def mbv1_base(mods) -> nn.ModuleList:
    """conv_bn / conv_dw blocks: FLAT Sequentials (no .conv nesting) —
    ``base.{i}.{j}`` with j over (conv,bn,relu)* entries."""
    out = []
    for _, sub in _mod_index(mods, "base_layers_"):
        if "Conv_0" in sub:
            out.append(conv_bn_seq(sub))
        else:
            seq = []
            for _, gd in _mod_index(sub, "ConvBNReLU_"):
                seq += [conv_from(gd["Conv_0"]), bn_from(gd["BatchNorm_0"]),
                        nn.ReLU()]
            out.append(nn.Sequential(*seq))
    return nn.ModuleList(out)


def basic_rfb_from(sub) -> nn.Module:
    """BasicRFB: ConvBNReLU_{0..10} -> branch0(2) branch1(3) branch2(4)
    ConvLinear shortcut (torch_import._rfb_subpath inverse)."""
    bc = lambda i: BasicConv(sub[f"ConvBNReLU_{i}"]["Conv_0"],
                             sub[f"ConvBNReLU_{i}"]["BatchNorm_0"])
    m = nn.Module()
    m.branch0 = nn.Sequential(bc(0), bc(1))
    m.branch1 = nn.Sequential(bc(2), bc(3), bc(4))
    m.branch2 = nn.Sequential(bc(5), bc(6), bc(7), bc(8))
    m.ConvLinear = bc(9)
    m.shortcut = bc(10)
    return m


def basic_rfb_a_from(sub) -> nn.Module:
    """BasicRFB_a: flat Conv_{k}/BatchNorm_{k} -> branch0(2) branch1(3)
    branch2(3) branch3(4) ConvLinear shortcut."""
    bc = lambda i: BasicConv(sub[f"Conv_{i}"], sub[f"BatchNorm_{i}"])
    m = nn.Module()
    m.branch0 = nn.Sequential(bc(0), bc(1))
    m.branch1 = nn.Sequential(bc(2), bc(3), bc(4))
    m.branch2 = nn.Sequential(bc(5), bc(6), bc(7))
    m.branch3 = nn.Sequential(bc(8), bc(9), bc(10), bc(11))
    m.ConvLinear = bc(12)
    m.shortcut = bc(13)
    return m


def _extras(mods, style: str) -> nn.ModuleList:
    out = []
    for _, sub in _mod_index(mods, "extra_layers_") + _mod_index(
            mods, "fusion_layers_"):
        if style == "rfb" and "ConvBNReLU_0" in sub:
            out.append(basic_rfb_from(sub))
            continue
        if style == "ssd_lite":
            out.append(conv_from(sub["layers_0"]["Conv_0"]))
            l1 = sub["layers_1"]
            out.append(nn.Sequential(
                conv_from(l1["ConvBNReLU_0"]["Conv_0"]),
                bn_from(l1["ConvBNReLU_0"]["BatchNorm_0"]), nn.ReLU6(),
                conv_from(l1["ConvBNReLU_1"]["Conv_0"]),
                bn_from(l1["ConvBNReLU_1"]["BatchNorm_0"]), nn.ReLU6()))
            continue
        out.append(conv_from(sub["layers_0"]["Conv_0"]))
        out.append(conv_from(sub["layers_1"]["Conv_0"]))
    return nn.ModuleList(out)


def _heads(head, kind: str, lite: bool) -> nn.ModuleList:
    out = []
    if lite:
        n = sum(1 for k in head if k.startswith(f"{kind}_dw"))
        for k in range(n):
            out.append(nn.Sequential(
                conv_from(head[f"{kind}_dw{k}"]["Conv_0"]), nn.ReLU6(),
                conv_from(head[f"{kind}_pw{k}"]["Conv_0"])))
    else:
        n = sum(1 for k in head if k.startswith(kind) and k[len(kind):].isdigit())
        for k in range(n):
            out.append(conv_from(head[f"{kind}{k}"]["Conv_0"]))
    return nn.ModuleList(out)


def build_skeleton(family: str, variables, net: str = "vgg") -> nn.Module:
    mods = module_tree(variables)
    m = nn.Module()
    lite = family == "ssd_lite"
    m.base = {"vgg": vgg_base, "mbv1": mbv1_base, "mbv2": mbv2_base}[net](mods)
    if family in ("ssd", "ssd_lite"):
        m.norm = L2Norm(mods["norm"]["scale"][0])
    elif family == "rfb":
        m.norm = basic_rfb_a_from(mods["norm"])
    elif family == "fssd":
        m.norm = bn_from(mods["fusion_bn"])  # the fusion BN
    if family == "fssd":
        m.transforms = nn.ModuleList(
            [conv_from(s["Conv_0"]) for _, s in _mod_index(mods, "transforms_")])
        m.pyramids = nn.ModuleList(
            [conv_bn_seq(s) for _, s in _mod_index(mods, "pyramid_layers_")])
    m.extras = _extras(mods, "rfb" if family == "rfb"
                       else ("ssd_lite" if lite else "ssd"))
    m.loc = _heads(mods["head"], "loc", lite)
    m.conf = _heads(mods["head"], "conf", lite)
    return m
