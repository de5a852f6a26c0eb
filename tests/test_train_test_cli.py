"""train.py / test.py CLI surfaces end-to-end on CPU: arg parsing, config
load, phase dispatch (reference train.py/test.py — SURVEY.md §2.1)."""

import importlib.util
import os
import sys

from test_solver_e2e import CFG_TEMPLATE, make_voc

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def _load_root_script(name):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"{name}_cli", os.path.join(root, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _argv(argv):
    class _Ctx:
        def __enter__(self):
            self.old = sys.argv
            sys.argv = argv

        def __exit__(self, *a):
            sys.argv = self.old

    return _Ctx()


def test_train_then_test_cli(tmp_path, capsys):
    root = str(tmp_path / "VOCdevkit")
    exp = str(tmp_path / "exp")
    make_voc(root)
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.format(root=root, exp=exp, epochs=1,
                                    ckpt_epochs=1, prob=-1))

    train_cli = _load_root_script("train")
    with _argv(["train.py", "--cfg", cfg_path]):
        train_cli.train()
    assert os.path.exists(os.path.join(exp, "smoke_epoch_1.ckpt"))

    test_cli = _load_root_script("test")
    with _argv(["test.py", "--cfg", cfg_path]):
        test_cli.test()
    out = capsys.readouterr().out
    assert "mAP" in out
