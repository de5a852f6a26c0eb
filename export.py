#!/usr/bin/env python
"""Export CLI — package a trained model for serving.

``python export.py --cfg <yml> --out <dir> [--batch N] [--platforms tpu,cpu]``

A TPU-native addition with no reference equivalent (the reference's deploy
story was loading the ``.pth`` in another torch process — ``lib/ssds.py``,
SURVEY.md §2.2): builds the ObjectDetector from the config (loading
``RESUME_CHECKPOINT`` exactly like ``demo.py``), then writes the fused
predict program as a versioned StableHLO artifact + msgpack weights via
:mod:`ssds_tpu.export`. Verify the artifact with ``--check``: reloads it
and compares against the in-process detector on random inputs.
"""

import argparse
import sys


def parse_args():
    parser = argparse.ArgumentParser(description="ssds_tpu serving export")
    parser.add_argument("--cfg", dest="config_file", required=True, type=str)
    parser.add_argument("--out", dest="out_dir", required=True, type=str)
    parser.add_argument("--batch", default=None, type=int,
                        help="fixed batch size (default: symbolic — any "
                             "batch at call time)")
    parser.add_argument("--platforms", default="", type=str,
                        help="comma-separated lowering platforms, e.g. "
                             "'tpu,cpu' (default: current backend)")
    parser.add_argument("--check", action="store_true",
                        help="reload the artifact and compare outputs "
                             "against the in-process detector")
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def main():
    args = parse_args()
    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.detector import ObjectDetector
    from ssds_tpu.export import export_detector, load_exported

    cfg = cfg_from_file(args.config_file)
    det = ObjectDetector(cfg)
    platforms = [p for p in args.platforms.split(",") if p] or None
    out = export_detector(det, args.out_dir, batch=args.batch,
                          platforms=platforms)
    print(f"exported {cfg.MODEL.SSDS}/{cfg.MODEL.NETS} -> {out}")

    if args.check:
        import numpy as np

        predict, meta = load_exported(out)
        b = args.batch or 2
        h, w = det.img_hw
        imgs = np.random.default_rng(0).integers(0, 255, (b, h, w, 3),
                                                 dtype=np.uint8)
        served = np.asarray(predict(imgs))
        direct = np.asarray(det._predict(det.variables, imgs))
        np.testing.assert_array_equal(served, direct)
        print(f"check ok: served == in-process on {served.shape} "
              f"({meta['platforms']})")


if __name__ == "__main__":
    main()
