"""demo.py CLI surface: image, video, and time modes end-to-end on CPU
with a tiny model (reference demo.py modes — SURVEY.md §2.1)."""

import importlib.util
import os
import sys

import cv2
import numpy as np
import pytest
import yaml

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def _load_demo_module():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location("demo_cli", os.path.join(root, "demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_yml(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo")
    cfg = {
        "MODEL": {
            "SSDS": "ssd_lite", "NETS": "mobilenet_v1_025",
            "IMAGE_SIZE": [96, 96], "NUM_CLASSES": 4,
            "FEATURE_LAYER": [[11, 13], [128, 256]],
            "ASPECT_RATIOS": [[2], [2]], "SIZES": [0.3, 0.6, 0.9],
            "HALF_PRECISION": False,
        },
        "POST_PROCESS": {"NUM_CLASSES": 4, "MAX_DETECTIONS": 10},
        "PHASE": ["test"],
    }
    path = str(d / "tiny.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, str(d)


def _run(argv):
    demo = _load_demo_module()
    old = sys.argv
    sys.argv = ["demo.py"] + argv
    try:
        demo.demo()
    finally:
        sys.argv = old


def test_demo_image_mode(tiny_yml):
    cfg_path, d = tiny_yml
    img_path = os.path.join(d, "scene.jpg")
    rng = np.random.default_rng(0)
    cv2.imwrite(img_path, rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    _run(["--cfg", cfg_path, "--demo", img_path, "-t", "image", "--threshold", "0.0"])
    assert os.path.exists(os.path.join(d, "scene_out.jpg"))


def test_demo_video_mode(tiny_yml):
    cfg_path, d = tiny_yml
    vid_path = os.path.join(d, "clip.avi")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"XVID"), 5, (160, 120))
    rng = np.random.default_rng(1)
    for _ in range(3):
        w.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    w.release()
    assert os.path.getsize(vid_path) > 0
    _run(["--cfg", cfg_path, "--demo", vid_path, "-t", "video"])
    out = os.path.join(d, "clip_out.avi")
    assert os.path.exists(out) and os.path.getsize(out) > 0
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3  # one annotated frame out per frame in


def test_demo_time_mode(tiny_yml, capsys):
    cfg_path, _ = tiny_yml
    _run(["--cfg", cfg_path, "-t", "time"])
    out = capsys.readouterr().out
    assert "p50=" in out and "p90=" in out and "fps=" in out
