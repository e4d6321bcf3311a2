#!/usr/bin/env python
"""Offline data preparation (reference `tools/create_data.py:279-284`).

Usage:
    python tools/create_data.py scannet --root-path ./data/scannet \
        [--out-dir ./data/scannet] [--workers 4]

    # generate a synthetic mini-dataset (CI / smoke tests)
    python tools/create_data.py synthetic --root-path /tmp/mini_scannet
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Data converter")
    p.add_argument("dataset",
                   choices=["scannet", "sunrgbd", "sunrgbd_monocular",
                            "sunrgbd_total", "kitti", "nuscenes",
                            "nuscenes_monocular", "nuimages", "lyft",
                            "waymo", "synthetic", "synthetic-kitti",
                            "synthetic-nuscenes",
                            "synthetic-nuscenes-raw",
                            "synthetic-sunrgbd-raw",
                            "synthetic-sunrgbd-total", "gt-database"])
    p.add_argument("--use-v1", action="store_true",
                   help="sunrgbd: use the v1 label set")
    p.add_argument("--num-points", type=int, default=None,
                   help="sunrgbd: points per frame (default 50000)")
    p.add_argument("--version", default=None,
                   help="nuscenes/lyft: raw database version "
                        "(default v1.0-mini / v1.01-train)")
    p.add_argument("--max-sweeps", type=int, default=10)
    p.add_argument("--train-split", default=None,
                   help="nuscenes/lyft: txt file of train scene names")
    p.add_argument("--val-split", default=None,
                   help="nuscenes/lyft: txt file of val scene names")
    p.add_argument("--info-path", default=None,
                   help="gt-database: kitti_infos_train.pkl path")
    p.add_argument("--classes", default="Pedestrian,Cyclist,Car",
                   help="gt-database: comma-separated class names")
    p.add_argument("--root-path", required=True)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--n-scenes", type=int, default=4,
                   help="synthetic: scenes per split")
    p.add_argument("--n-images", type=int, default=20,
                   help="synthetic: views per scene")
    args = p.parse_args()

    if args.dataset == "scannet":
        from nerfdet_tpu.data.scannet_etl import create_scannet_info_file

        create_scannet_info_file(
            args.root_path, out_dir=args.out_dir,
            num_workers=args.workers)
    elif args.dataset in ("sunrgbd", "sunrgbd_monocular"):
        from nerfdet_tpu.data.sunrgbd_etl import (SAMPLE_NUM,
                                                  create_sunrgbd_infos)

        written = create_sunrgbd_infos(
            args.root_path, out_dir=args.out_dir,
            use_v1=args.use_v1,
            monocular=args.dataset == "sunrgbd_monocular",
            num_points=args.num_points or SAMPLE_NUM,
            num_workers=args.workers)
        print(f"[sunrgbd] wrote {written}")
    elif args.dataset == "synthetic-sunrgbd-raw":
        from nerfdet_tpu.data.sunrgbd_etl import \
            write_synthetic_sunrgbd_raw

        out = write_synthetic_sunrgbd_raw(
            args.root_path, n_frames=args.n_scenes)
        print(f"[synthetic-sunrgbd-raw] wrote {out}")
    elif args.dataset == "sunrgbd_total":
        # Total3DUnderstanding COCO json -> info pkls (reference
        # `tools/data_converter/sunrgbd_total.py:87-93`: both splits)
        from nerfdet_tpu.data.sunrgbd_etl import convert_sunrgbd_total

        for split in ("train", "val"):
            path = os.path.join(args.root_path,
                                f"sunrgbd_total_infos_{split}.json")
            out = convert_sunrgbd_total(path)
            print(f"[sunrgbd_total] wrote {out}")
    elif args.dataset == "synthetic-sunrgbd-total":
        from nerfdet_tpu.data.sunrgbd_etl import \
            write_synthetic_sunrgbd_total

        out = write_synthetic_sunrgbd_total(
            args.root_path, n_images=args.n_scenes)
        print(f"[synthetic-sunrgbd-total] wrote {out}")
    elif args.dataset == "kitti":
        from nerfdet_tpu.data.kitti_etl import create_kitti_infos

        written = create_kitti_infos(
            args.root_path, out_dir=args.out_dir,
            splits=("train", "val"))
        print(f"[kitti] wrote {written}")
    elif args.dataset == "nuscenes":
        from nerfdet_tpu.data.nuscenes_etl import create_nuscenes_infos

        written = create_nuscenes_infos(
            args.root_path, version=args.version or "v1.0-mini",
            max_sweeps=args.max_sweeps, train_scenes=args.train_split,
            val_scenes=args.val_split, out_dir=args.out_dir)
        print(f"[nuscenes] wrote {written}")
    elif args.dataset == "nuscenes_monocular":
        from nerfdet_tpu.data.nuscenes_etl import \
            create_nuscenes_monocular_infos

        written = create_nuscenes_monocular_infos(
            args.root_path, version=args.version or "v1.0-mini",
            train_scenes=args.train_split, out_dir=args.out_dir)
        print(f"[nuscenes_monocular] wrote {written}")
    elif args.dataset == "nuimages":
        # COCO-format 2D instance-seg export (reference
        # `tools/data_converter/nuimage_converter.py`, SDK-free)
        from nerfdet_tpu.data.nuimages_etl import convert_nuimages

        versions = (args.version or "v1.0-mini").split(",")
        for version in versions:
            out = convert_nuimages(args.root_path, version=version,
                                   out_dir=args.out_dir)
            print(f"[nuimages] {version}: wrote {out}")
    elif args.dataset == "lyft":
        from nerfdet_tpu.data.nuscenes_etl import create_lyft_infos

        written = create_lyft_infos(
            args.root_path, version=args.version or "v1.01-train",
            max_sweeps=args.max_sweeps, train_scenes=args.train_split,
            val_scenes=args.val_split, out_dir=args.out_dir)
        print(f"[lyft] wrote {written}")
    elif args.dataset == "waymo":
        # raw tfrecords (root/raw/{training,validation,testing}/
        # *.tfrecord or root/*.tfrecord) -> kitti_format tree + infos
        # (reference `create_data.py:waymo_data_prep`, SDK-free)
        from nerfdet_tpu.data.waymo_etl import (convert_waymo_tfrecords,
                                                create_waymo_infos)

        out = args.out_dir or os.path.join(args.root_path,
                                           "kitti_format")
        split_map = (("training", "0", "train", False),
                     ("validation", "1", "val", False),
                     ("testing", "2", "test", True))
        any_split = False
        for sub, prefix, split, test_mode in split_map:
            load = os.path.join(args.root_path, sub)
            if not os.path.isdir(load):
                continue
            any_split = True
            save = os.path.join(
                out, "testing" if test_mode else "training")
            n = convert_waymo_tfrecords(load, save, prefix=prefix,
                                        test_mode=test_mode)
            pkl = create_waymo_infos(out, split=split, prefix=prefix)
            print(f"[waymo] {sub}: {n} tfrecords -> {save}; "
                  f"infos -> {pkl}")
        if not any_split:
            n = convert_waymo_tfrecords(
                args.root_path, os.path.join(out, "training"))
            pkl = create_waymo_infos(out, split="train")
            print(f"[waymo] {n} tfrecords -> {out}; infos -> {pkl}")
    elif args.dataset == "synthetic-nuscenes-raw":
        from nerfdet_tpu.data.nuscenes_etl import \
            write_synthetic_nuscenes_raw

        out = write_synthetic_nuscenes_raw(
            args.root_path, version=args.version or "v1.0-mini")
        print(f"[synthetic-nuscenes-raw] wrote {out}")
    elif args.dataset == "synthetic-nuscenes":
        from nerfdet_tpu.data.nuscenes_dataset import \
            write_synthetic_nuscenes

        for split in ("train", "val"):
            out = write_synthetic_nuscenes(
                args.root_path, n_samples=args.n_scenes, split=split)
            print(f"[synthetic-nuscenes] wrote {out}")
    elif args.dataset == "gt-database":
        from nerfdet_tpu.data.dbsampler import \
            create_groundtruth_database

        info = args.info_path or os.path.join(
            args.root_path, "kitti_infos_train.pkl")
        db = create_groundtruth_database(
            args.root_path, info, classes=args.classes.split(","),
            out_dir=args.out_dir)
        print("[gt-database] " + ", ".join(
            f"{k}: {len(v)}" for k, v in db.items()))
    elif args.dataset == "synthetic-kitti":
        from nerfdet_tpu.data.kitti_etl import create_kitti_infos
        from nerfdet_tpu.data.synthetic import write_synthetic_kitti

        write_synthetic_kitti(args.root_path, n_samples=args.n_scenes,
                              split="train")
        # reuse the train ids as val for smoke runs
        ids = open(os.path.join(args.root_path, "ImageSets",
                                "train.txt")).read()
        with open(os.path.join(args.root_path, "ImageSets",
                               "val.txt"), "w") as f:
            f.write(ids)
        written = create_kitti_infos(
            args.root_path, out_dir=args.out_dir,
            splits=("train", "val"))
        print(f"[synthetic-kitti] wrote {written}")
    else:
        from nerfdet_tpu.data.synthetic import write_synthetic_scannet

        write_synthetic_scannet(
            args.root_path, n_scenes=args.n_scenes,
            n_images=args.n_images, hw=(240, 320), with_depth=True)
        print(f"[synthetic] wrote {args.n_scenes}x2 scenes -> "
              f"{args.root_path}")


if __name__ == "__main__":
    main()
