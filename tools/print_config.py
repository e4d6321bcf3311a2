#!/usr/bin/env python
"""Print the fully-resolved config (reference `tools/print_config.py`).

Usage: python tools/print_config.py <config> [--options k=v ...]
"""

import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--options", nargs="+", default=[])
    args = p.parse_args()

    from nerfdet_tpu.config import Config

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options(args.options)
    for k, v in cfg.to_dict().items():
        print(f"{k} = {pprint.pformat(v, width=100)}")


if __name__ == "__main__":
    main()
