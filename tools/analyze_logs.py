#!/usr/bin/env python
"""Training-log analysis (reference `tools/analyze_logs.py:9-30,32+`).

Reads the metrics.jsonl written by the train loop:

    python tools/analyze_logs.py cal_train_time work_dirs/r50/metrics.jsonl
    python tools/analyze_logs.py plot_curve work_dirs/r50/metrics.jsonl \
        --keys loss loss_cls --out curves.png
"""

from __future__ import annotations

import argparse
import json


def load_records(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def cal_train_time(records):
    times = [r["iter_time"] for r in records
             if "iter_time" in r and r.get("mode") != "val"]
    if not times:
        print("no timing records")
        return
    import numpy as np

    times = np.asarray(times)
    print(f"average iter time: {times.mean():.4f} s/iter")
    print(f"fastest iter time: {times.min():.4f} s/iter")
    print(f"slowest iter time: {times.max():.4f} s/iter")
    print(f"time std over iters: {times.std():.4f}")


def plot_curve(records, keys, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    train = [r for r in records if r.get("mode") != "val"]
    for k in keys:
        xs = [r["step"] for r in train if k in r]
        ys = [r[k] for r in train if k in r]
        plt.plot(xs, ys, label=k)
    plt.xlabel("iter")
    plt.legend()
    plt.savefig(out)
    print(f"saved {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["cal_train_time", "plot_curve"])
    p.add_argument("json_log")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default="curve.png")
    args = p.parse_args()
    records = load_records(args.json_log)
    if args.task == "cal_train_time":
        cal_train_time(records)
    else:
        plot_curve(records, args.keys, args.out)


if __name__ == "__main__":
    main()
