#!/usr/bin/env python
"""Prepare a checkpoint for release (reference `tools/publish_model.py`):
strip optimizer state, keep params + batch_stats, stamp a content hash.

Usage: python tools/publish_model.py <in_ckpt_dir> <out_ckpt_dir>
"""

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt")
    p.add_argument("out_dir")
    args = p.parse_args()

    import jax
    import numpy as np

    from nerfdet_tpu.utils import load_checkpoint, save_checkpoint

    ckpt = load_checkpoint(args.in_ckpt)
    published = {k: ckpt[k] for k in ("params", "batch_stats")
                 if k in ckpt}
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(published):
        h.update(np.asarray(leaf).tobytes())
    digest = h.hexdigest()[:8]
    path = save_checkpoint(args.out_dir, 0, published,
                           meta=dict(sha256=digest,
                                     step=int(ckpt.get("step", 0))))
    final = path + f"-{digest}"
    os.rename(path, final)
    print(json.dumps(dict(path=final, sha256=digest)))


if __name__ == "__main__":
    main()
