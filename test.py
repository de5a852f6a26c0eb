#!/usr/bin/env python
"""Eval CLI — parity with the reference's ``python test.py --cfg <yml>``
(mAP over TEST_SETS; reference test.py, SURVEY.md §2.1)."""

import argparse
import sys


def parse_args():
    parser = argparse.ArgumentParser(description="Evaluate an ssds_tpu detection network")
    parser.add_argument("--cfg", dest="config_file", required=True,
                        help="optional config file", type=str)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def test():
    args = parse_args()
    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.solver import test_model

    cfg = cfg_from_file(args.config_file)
    test_model(cfg)


if __name__ == "__main__":
    test()
