"""Model-zoo construction/forward tests (tiny geometry for CPU speed)."""

import jax
import jax.numpy as jnp
import pytest

from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def tiny_cfg(ssds, nets, feature_layer, image=96, ars=None, num_classes=4):
    cfg = default_config()
    cfg.MODEL.SSDS = ssds
    cfg.MODEL.NETS = nets
    cfg.MODEL.IMAGE_SIZE = [image, image]
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.MODEL.FEATURE_LAYER = feature_layer
    cfg.MODEL.ASPECT_RATIOS = ars or [[2], [2, 3], [2]]
    cfg.MODEL.SIZES = [0.2, 0.5, 0.8, 0.95][: len(cfg.MODEL.ASPECT_RATIOS) + 1]
    return cfg


def build_and_forward(cfg, phase="train"):
    model, fmaps = create_model(cfg.MODEL)
    variables = init_model(model, cfg.MODEL)
    h, w = cfg.MODEL.IMAGE_SIZE
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    out = model.apply(variables, x, phase=phase, train=False)
    return model, fmaps, out


def test_ssd_vgg_tiny_geometry():
    cfg = tiny_cfg("ssd", "vgg16", [[22, 34, "S"], [512, 1024, 256]])
    model, fmaps, (loc, conf) = build_and_forward(cfg)
    # 96 -> conv4_3 12, conv7 6, extra S 3
    assert fmaps == [(12, 12), (6, 6), (3, 3)]
    k = sum(h * w * a for (h, w), a in zip(fmaps, (4, 6, 4)))
    assert loc.shape == (1, k, 4)
    assert conf.shape == (1, k, 4)
    priors = create_priors(cfg.MODEL, fmaps)
    assert priors.shape == (k, 4)


def test_ssd300_classic_counts():
    cfg = default_config()
    model, fmaps = create_model(cfg.MODEL)
    assert fmaps == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    cfg.MODEL.SIZES = [0.1, 0.2, 0.38, 0.56, 0.74, 0.92, 1.1]
    priors = create_priors(cfg.MODEL, fmaps)
    assert priors.shape == (8732, 4)  # the canonical SSD300 anchor count


@pytest.mark.parametrize(
    "nets,fl",
    [
        ("mobilenet_v2", [[13, 18, "S"], [96, 1280, 256]]),
        ("mobilenet_v1", [[11, 13, "S"], [512, 1024, 256]]),
        ("resnet_18", [[4, 8, "S"], [128, 512, 256]]),
    ],
)
def test_ssd_lite_backbones(nets, fl):
    cfg = tiny_cfg("ssd_lite", nets, fl, image=128)
    model, fmaps, (loc, conf) = build_and_forward(cfg)
    assert loc.ndim == 3 and loc.shape[-1] == 4
    assert conf.shape[-1] == cfg.MODEL.NUM_CLASSES


def test_fssd_builds():
    fl = [[[22, 34, "S"], [512, 1024, 256]], [["", "S", "0"], [128, 128, 128]]]
    cfg = tiny_cfg("fssd", "vgg16", fl)
    model, fmaps, (loc, conf) = build_and_forward(cfg)
    # pyramid: keep 12, halve 6, shrink 4
    assert fmaps == [(12, 12), (6, 6), (4, 4)]


def test_rfb_builds():
    cfg = tiny_cfg("rfb", "vgg16", [[22, "R", "S"], [512, 1024, 512]])
    model, fmaps, (loc, conf) = build_and_forward(cfg)
    assert fmaps == [(12, 12), (6, 6), (3, 3)]


def test_yolo_v3_builds_and_decodes():
    cfg = tiny_cfg("yolo_v3", "darknet_53", [[14, 23, 28], [256, 512, 1024]],
                   image=128, ars=[[2], [2], [2]])
    model, fmaps, raw = build_and_forward(cfg, phase="train")
    assert fmaps == [(16, 16), (8, 8), (4, 4)]
    assert len(raw) == 3
    assert raw[0].shape == (1, 16, 16, 3, 5 + 3)  # 3 classes = NUM_CLASSES-1
    variables = init_model(model, cfg.MODEL)
    boxes, scores = model.apply(
        variables, jnp.zeros((1, 128, 128, 3)), phase="eval", train=False)
    k = 3 * (16 * 16 + 8 * 8 + 4 * 4)
    assert boxes.shape == (1, k, 4)
    assert scores.shape == (1, k, 4)  # bg + 3 classes


def test_eval_phase_softmax():
    cfg = tiny_cfg("ssd", "vgg16", [[22, 34], [512, 1024]], ars=[[2], [2, 3]])
    model, fmaps, _ = build_and_forward(cfg)
    variables = init_model(model, cfg.MODEL)
    x = jnp.zeros((1, 96, 96, 3))
    _, conf = model.apply(variables, x, phase="eval", train=False)
    assert jnp.allclose(jnp.sum(conf, axis=-1), 1.0, atol=1e-5)


def test_s2d_conv_is_exact():
    """expand_s2d_kernel: d2s(conv(s2d(x))) must equal conv(x) bit-for-bit in
    f32 (the MFU stem rewrite, VERDICT r1 item 6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.models.layers import (
        depth_to_space, expand_s2d_kernel, space_to_depth)

    rng = np.random.default_rng(0)
    for block, h, w_, cin, cout in ((2, 12, 16, 3, 8), (4, 16, 16, 3, 8), (2, 10, 10, 5, 7)):
        x = jnp.asarray(rng.normal(0, 1, (2, h, w_, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.3, (3, 3, cin, cout)), jnp.float32)

        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ws = expand_s2d_kernel(w, block)
        got = depth_to_space(
            jax.lax.conv_general_dilated(
                space_to_depth(x, block), ws, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")),
            block)
        assert np.allclose(np.asarray(ref), np.asarray(got), atol=1e-5), block


@pytest.mark.parametrize("stages", [1, 2])
def test_s2d_stem_model_same_logits_and_checkpoint_tree(stages):
    """MODEL.S2D_STEM=2 must keep (a) the flax param tree byte-identical to
    the plain stem (checkpoints interchange) and (b) the model outputs equal
    — the VERDICT 'same logits pre/post transform' import-equivalence.
    stages=2 additionally tiles conv2_x/pool2 (MODEL.S2D_STAGES)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, init_model

    cfg = default_config()
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.FEATURE_LAYER = [[22, 34, "S"], [512, 1024, 512]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2]]
    cfg.MODEL.SIZES = [0.2, 0.5, 0.8, 0.95]

    cfg.MODEL.S2D_STEM = 0  # default is -1 = auto (which picks the tiled stem)
    model_plain, fm1 = create_model(cfg.MODEL)
    cfg.MODEL.S2D_STEM = 2
    cfg.MODEL.S2D_STAGES = stages
    model_s2d, fm2 = create_model(cfg.MODEL)
    assert fm1 == fm2

    variables = init_model(model_plain, cfg.MODEL, jax.random.PRNGKey(0))
    v2 = init_model(model_s2d, cfg.MODEL, jax.random.PRNGKey(1))
    p1 = jax.tree_util.tree_structure(variables["params"])
    p2 = jax.tree_util.tree_structure(v2["params"])
    assert p1 == p2  # same checkpoint tree

    x = jnp.asarray(np.random.default_rng(3).normal(0, 50, (2, 96, 96, 3)),
                    jnp.float32)
    loc1, conf1 = model_plain.apply(variables, x, phase="train", train=False)
    loc2, conf2 = model_s2d.apply(variables, x, phase="train", train=False)
    assert np.allclose(np.asarray(loc1), np.asarray(loc2), atol=2e-4)
    assert np.allclose(np.asarray(conf1), np.asarray(conf2), atol=2e-4)


def test_s2d_auto_resolution():
    """S2D_STEM=-1 (auto): the builder picks the tiled stem for vgg16 at
    even image sizes (train-side +6.6%), plain otherwise; ObjectDetector
    resolves auto to the plain stem (batch-1 is faster untiled). Both
    share one checkpoint tree, so this is purely a compute-schedule knob."""
    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model
    from ssds_tpu.models.layers import Conv, S2DStemPairConv

    cfg = default_config()
    assert int(cfg.MODEL.S2D_STEM) == -1  # default is auto

    model, _ = create_model(cfg.MODEL)  # vgg16 at 300x300 -> tiled
    assert isinstance(model.base[0](), S2DStemPairConv)
    # S2D_STAGES auto resolves to stem-only (stage 2 measured slower)
    assert isinstance(model.base[5](), Conv)

    cfg.MODEL.S2D_STAGES = 2  # explicit opt-in tiles conv2_1 (index 5) too
    model, _ = create_model(cfg.MODEL)
    m5 = model.base[5]()
    assert isinstance(m5, S2DStemPairConv) and m5.features == 128
    cfg.MODEL.S2D_STAGES = -1

    cfg.MODEL.IMAGE_SIZE = [301, 301]  # odd -> plain
    model, _ = create_model(cfg.MODEL)
    assert isinstance(model.base[0](), Conv)

    cfg = default_config()
    cfg.MODEL.NETS = "mobilenet_v1"  # non-vgg16 -> auto resolves off, no error
    cfg.MODEL.FEATURE_LAYER = [[11, 13], [512, 1024]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3]]
    create_model(cfg.MODEL)

    # ObjectDetector: auto resolves to plain (inference-side) WITHOUT
    # mutating the caller's cfg (ADVICE r2: a Solver built later from the
    # same cfg object must still see auto and resolve tiled-ON for training)
    cfg = default_config()
    cfg.MODEL.SSDS = "ssd_lite"
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.FEATURE_LAYER = [[11, 13], [128, 256]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.3, 0.6, 0.9]
    auto_before = int(cfg.MODEL.get("S2D_STEM", 0) or 0)
    from ssds_tpu.detector import ObjectDetector
    det = ObjectDetector(cfg)
    assert int(det.cfg.MODEL.get("S2D_STEM", 0) or 0) == auto_before  # unmutated
    assert det.cfg is cfg


def test_group_max4_first_max_wins_vjp():
    """The tiled-stem pool backward routes a tied maximum's gradient to the
    FIRST maximal group only (torch maxpool semantics), never splitting it.
    Guards the argmax-residual reformulation of the custom VJP."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.models.layers import _group_max4

    # groups 1 and 3 tie for the max in channel 0; group 1 must win
    x = jnp.asarray(np.array([[0.5, 2.0, -1.0, 2.0],
                              [3.0, 3.0, 3.0, 3.0],
                              [1.0, 0.0, 4.0, 2.0]], np.float32))
    out, vjp = jax.vjp(_group_max4, x)
    np.testing.assert_array_equal(np.asarray(out).ravel(), [2.0, 3.0, 4.0])
    (gx,) = vjp(jnp.ones_like(out))
    np.testing.assert_array_equal(
        np.asarray(gx),
        [[0.0, 1.0, 0.0, 0.0],   # tie between groups 1,3 -> first (1) wins
         [1.0, 0.0, 0.0, 0.0],   # 4-way tie -> group 0
         [0.0, 0.0, 1.0, 0.0]])  # unique max in group 2

    # against the plain 2x2 maxpool on a random tensor with engineered ties
    rng = np.random.default_rng(0)
    img = rng.integers(-3, 4, (1, 8, 8, 5)).astype(np.float32)

    from ssds_tpu.models.layers import space_to_depth

    tiled = space_to_depth(jnp.asarray(img), 2)  # [1,4,4,20]
    out_t, vjp_t = jax.vjp(_group_max4, tiled)
    g = jnp.asarray(rng.normal(size=out_t.shape), jnp.float32)
    (gt,) = vjp_t(g)

    # oracle: first-max-wins over the 4 window positions, scanned in the
    # same (dy, dx) = channel-group order space_to_depth produces
    grads = np.zeros((1, 4, 4, 5, 4), np.float32)
    win = np.asarray(tiled).reshape(1, 4, 4, 4, 5).transpose(0, 1, 2, 4, 3)
    for b in range(1):
        for i in range(4):
            for j in range(4):
                for c in range(5):
                    k = int(np.argmax(win[b, i, j, c]))  # first max wins
                    grads[b, i, j, c, k] = g[b, i, j, c]
    want = grads.transpose(0, 1, 2, 4, 3).reshape(1, 4, 4, 20)
    np.testing.assert_array_equal(np.asarray(gt), want)


def test_conv2x2_custom_vjp_matches_autodiff():
    """_conv2x2_valid's hand-written backward (one-dot wgrad, flipped-kernel
    dgrad) must match jax autodiff of the plain VALID conv on both
    cotangents — guards the stem wgrad reformulation (round-3 step profile:
    the autodiff form paid a full-tensor reverse)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.models.layers import _conv2x2_valid

    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.normal(0, 1, (2, 9, 9, 12)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.3, (2, 2, 12, 16)), jnp.float32)

    def ref(xs, w2):
        return jax.lax.conv_general_dilated(
            xs, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y, vjp = jax.vjp(_conv2x2_valid, xs, w2)
    y_ref, vjp_ref = jax.vjp(ref, xs, w2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    dy = jnp.asarray(rng.normal(0, 1, y.shape), jnp.float32)
    dxs, dw2 = vjp(dy)
    dxs_ref, dw2_ref = vjp_ref(dy)
    np.testing.assert_allclose(np.asarray(dxs), np.asarray(dxs_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw2), np.asarray(dw2_ref), atol=1e-4)


@pytest.mark.parametrize("stages", [1, 2])
def test_s2d_stem_grads_match_plain_stem(stages):
    """End-to-end: parameter gradients of the tiled stem (with the custom
    conv wgrad and pool VJP) must match the plain stem's on the shared
    [3,3,Cin,Cout] checkpoint tree (stages=2: conv2_x/pool2 tiled too)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, init_model

    cfg = default_config()
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.FEATURE_LAYER = [[22, 34, "S"], [512, 1024, 512]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2]]
    cfg.MODEL.SIZES = [0.2, 0.5, 0.8, 0.95]

    cfg.MODEL.S2D_STEM = 0
    model_plain, _ = create_model(cfg.MODEL)
    cfg.MODEL.S2D_STEM = 2
    cfg.MODEL.S2D_STAGES = stages
    model_s2d, _ = create_model(cfg.MODEL)
    variables = init_model(model_plain, cfg.MODEL, jax.random.PRNGKey(0))

    x = jnp.asarray(np.random.default_rng(5).normal(0, 50, (2, 96, 96, 3)),
                    jnp.float32)

    def loss(params, model):
        loc, conf = model.apply({"params": params}, x, phase="train",
                                train=False)
        return (loc ** 2).mean() + (conf ** 2).mean()

    g1 = jax.grad(loss)(variables["params"], model_plain)
    g2 = jax.grad(loss)(variables["params"], model_s2d)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat2[path]), atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_output_keyed_activations_match_autodiff():
    """relu/relu6/leaky_relu use output-keyed VJPs (layers.py: lets XLA keep
    ONE tensor per conv→act chain instead of pre+post activation). Away
    from the kinks, values and gradients must match jnp autodiff exactly;
    AT the kinks the parity target is TORCH (zero grad at x=0 for relu and
    at both x=0 / x=6 for relu6 — note jnp.clip's autodiff passes gradient
    at exactly x=6, which torch does not)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.models.layers import leaky_relu, relu, relu6

    x = jnp.asarray(np.random.default_rng(0).normal(0, 3, 64))
    pairs = [
        (relu, lambda v: jnp.maximum(v, 0)),
        (relu6, lambda v: jnp.clip(v, 0, 6)),
        (lambda v: leaky_relu(v, 0.1), lambda v: jnp.where(v > 0, v, 0.1 * v)),
    ]
    for f, ref in pairs:
        np.testing.assert_allclose(np.asarray(f(x)), np.asarray(ref(x)))
        g1 = jax.grad(lambda v: (f(v) ** 2).sum())(x)
        g2 = jax.grad(lambda v: (ref(v) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))

    # kink points, torch convention (d/dx of f(x)·c at the kink == 0)
    kinks = jnp.asarray([0.0, -0.0, 6.0])
    for f, expect in [(relu, [0.0, 0.0, 1.0]), (relu6, [0.0, 0.0, 0.0])]:
        g = jax.vmap(jax.grad(f))(kinks)
        np.testing.assert_allclose(np.asarray(g), expect)
    g = jax.vmap(jax.grad(lambda v: leaky_relu(v, 0.1)))(kinks)
    np.testing.assert_allclose(np.asarray(g), [0.1, 0.1, 1.0])


def test_group_max4_relu_fold():
    """relu-folded pool (`_group_max4_relu`): values equal relu(pool(x));
    gradient routes to the FIRST maximal group when the max is positive and
    to NOBODY when the max is <= 0 (torch relu'(0) == 0 composed with
    first-max-wins maxpool backward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.models.layers import _group_max4, _group_max4_relu

    x = jnp.asarray(np.array(
        [[0.5, 2.0, -1.0, 2.0],     # positive tie: group 1 wins
         [-3.0, -1.0, -2.0, -1.5],  # all negative: out 0, no gradient
         [0.0, -1.0, -4.0, -2.0],   # max exactly 0: out 0, no gradient
         [1.0, 0.0, 4.0, 2.0]], np.float32))
    out, vjp = jax.vjp(_group_max4_relu, x)
    np.testing.assert_array_equal(np.asarray(out).ravel(), [2.0, 0.0, 0.0, 4.0])
    (gx,) = vjp(jnp.ones_like(out))
    np.testing.assert_array_equal(
        np.asarray(gx),
        [[0.0, 1.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 1.0, 0.0]])

    # value identity vs relu∘pool on random data
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(0, 2, (3, 6, 6, 16)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_group_max4_relu(r)),
        np.asarray(jnp.maximum(_group_max4(r), 0)))


def test_vgg16_spec_length_invariant_across_schedules():
    """FEATURE_LAYER indexes into the layer-spec list positionally (torch
    nn.ModuleList parity: taps [22, 34]); every compute schedule must keep
    the 35-entry layout — the tiled stem and stage-2 variants swap entries
    in place (Identity holds the folded-ReLU slot), never shift them."""
    from ssds_tpu.models.backbones.vgg import vgg16
    from ssds_tpu.models.layers import Identity, S2DBlockPool

    plain = vgg16()
    tiled = vgg16(s2d_block=2)
    tiled2 = vgg16(s2d_block=2, s2d_stages=2)
    assert len(plain) == len(tiled) == len(tiled2) == 35
    assert isinstance(tiled[3](), Identity)
    assert isinstance(tiled[4](), S2DBlockPool)
    assert isinstance(tiled2[8](), Identity)
    assert isinstance(tiled2[9](), S2DBlockPool)
