import pytest
import yaml

from ssds_tpu.config import cfg, cfg_from_file, cfg_from_list, default_config


def test_defaults_have_reference_schema():
    c = default_config()
    assert c.MODEL.SSDS == "ssd"
    assert c.MODEL.NETS == "vgg16"
    assert c.TRAIN.OPTIMIZER.OPTIMIZER == "sgd"
    assert c.TRAIN.LR_SCHEDULER.SCHEDULER == "step"
    assert c.POST_PROCESS.SCORE_THRESHOLD == 0.01
    assert c.DATASET.PIXEL_MEANS == (104, 117, 123)
    assert c.PHASE == ["train"]


def test_yaml_merge(tmp_path):
    y = {
        "MODEL": {"SSDS": "fssd", "NETS": "mobilenet_v2", "NUM_CLASSES": 81,
                  "IMAGE_SIZE": [512, 512]},
        "TRAIN": {"BATCH_SIZE": 8, "OPTIMIZER": {"LEARNING_RATE": 0.01}},
        "EXP_DIR": "/tmp/exp",
    }
    p = tmp_path / "exp.yml"
    p.write_text(yaml.safe_dump(y))
    c = cfg_from_file(str(p))
    assert c.MODEL.SSDS == "fssd"
    assert c.MODEL.IMAGE_SIZE == [512, 512]
    assert c.TRAIN.BATCH_SIZE == 8
    assert c.TRAIN.OPTIMIZER.LEARNING_RATE == 0.01
    assert c.TRAIN.OPTIMIZER.MOMENTUM == 0.9  # untouched default survives
    # global singleton refreshed too (reference parity)
    assert cfg.MODEL.SSDS == "fssd"


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text(yaml.safe_dump({"MODEL": {"NOT_A_KEY": 1}}))
    with pytest.raises(KeyError):
        cfg_from_file(str(p))


def test_type_mismatch_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text(yaml.safe_dump({"TRAIN": {"BATCH_SIZE": "many"}}))
    with pytest.raises(TypeError):
        cfg_from_file(str(p))


def test_int_to_float_coercion(tmp_path):
    p = tmp_path / "ok.yml"
    p.write_text(yaml.safe_dump({"TRAIN": {"OPTIMIZER": {"LEARNING_RATE": 1}}}))
    c = cfg_from_file(str(p))
    assert c.TRAIN.OPTIMIZER.LEARNING_RATE == 1.0
    assert isinstance(c.TRAIN.OPTIMIZER.LEARNING_RATE, float)


def test_cfg_from_list():
    c = cfg_from_list(["TRAIN.BATCH_SIZE", 4, "MODEL.SSDS", "rfb"])
    assert c.TRAIN.BATCH_SIZE == 4
    assert c.MODEL.SSDS == "rfb"
    with pytest.raises(KeyError):
        cfg_from_list(["TRAIN.NOPE", 1])


def test_bool_coercion_from_int(tmp_path):
    import yaml
    from ssds_tpu.config import cfg_from_file

    p = tmp_path / "c.yml"
    p.write_text("MODEL:\n  CLIP: 1\n  HALF_PRECISION: 0\n")
    c = cfg_from_file(str(p))
    assert c.MODEL.CLIP is True
    assert c.MODEL.HALF_PRECISION is False
