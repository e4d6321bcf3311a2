"""SDK-free nuImages -> COCO instance-segmentation export.

The reference converter (`tools/data_converter/nuimage_converter.py:1-224`)
drives the `nuimages` devkit + `pycocotools` + mmcv to turn the nuImages
relational database into COCO-format JSON (2D boxes + RLE instance masks
for the 10 nuScenes detection classes) plus per-image semantic-mask PNGs.
The database itself is plain JSON tables and the masks are standard COCO
compressed RLE, so this module re-implements the conversion with json +
numpy only:

* :func:`decode_coco_rle` / :func:`encode_coco_rle` — a native codec for
  pycocotools' compressed RLE byte format (`rleFrString`/`rleToString`
  semantics: 5-bit base-48 varint chars, sign-extension on bit 0x10,
  counts delta-encoded against ``counts[i-2]``, runs alternate 0/1 in
  column-major order). Round-trip tested.
* :func:`name_to_index` — the devkit's ``name_to_index_mapping``:
  alphabetically sorted category names mapped to 1..K (0 = background).
* :func:`convert_nuimages` — the full export: key-frame image list,
  surface (stuff) + object (thing) semantic masks, COCO ``images`` /
  ``annotations`` / ``categories`` JSON with the reference's exact
  schema (`nuimage_converter.py:131-138`: xywh bbox, area from the box,
  ``segmentation`` carrying the decoded-to-ascii compressed RLE,
  iscrowd=0) and deterministic object order (sorted by token,
  `nuimage_converter.py:103-106`).

Scoping note (docs/migration.md "nuimages"): the reference's 18
``configs/nuimages/*`` train external mmdet 2D models (Mask R-CNN /
Cascade / HTC) on this export; those 2D instance-segmentation models are
outside this framework's 3D scope. The data path — this converter — is
complete, so any 2D stack can consume its output.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

NUS_CATEGORIES = ("car", "truck", "trailer", "bus", "construction_vehicle",
                  "bicycle", "motorcycle", "pedestrian", "traffic_cone",
                  "barrier")

NAME_MAPPING = {
    "movable_object.barrier": "barrier",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.car": "car",
    "vehicle.construction": "construction_vehicle",
    "vehicle.motorcycle": "motorcycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.trafficcone": "traffic_cone",
    "vehicle.trailer": "trailer",
    "vehicle.truck": "truck",
}


# ----------------------------------------------------------------------
# COCO compressed RLE codec (pycocotools rleFrString / rleToString)
# ----------------------------------------------------------------------

def _rle_from_string(s: bytes) -> List[int]:
    """Decode the char-packed counts: 5-bit groups biased by 48, bit
    0x20 = continuation, bit 0x10 of the last group = sign extension;
    counts[i >= 2] are deltas against counts[i-2]."""
    cnts: List[int] = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def _rle_to_string(cnts: Sequence[int]) -> bytes:
    out = bytearray()
    for i, cnt in enumerate(cnts):
        x = int(cnt)
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def decode_coco_rle(counts: bytes, size: Sequence[int]) -> np.ndarray:
    """Compressed RLE -> (h, w) uint8 mask (column-major runs,
    starting with zeros)."""
    h, w = int(size[0]), int(size[1])
    cnts = _rle_from_string(counts)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in cnts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape((w, h)).T


def encode_coco_rle(mask: np.ndarray) -> Dict:
    """(h, w) 0/1 mask -> {'size': [h, w], 'counts': bytes}."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    # run-length of the alternating values, first run counts zeros
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    return {"size": [h, w], "counts": _rle_to_string(runs)}


def name_to_index(category: List[Dict]) -> Dict[str, int]:
    """Devkit `nuimages.utils.utils.name_to_index_mapping`: 0 is
    background, categories take 1..K in alphabetical name order."""
    names = sorted(c["name"] for c in category)
    return {name: i + 1 for i, name in enumerate(names)}


# ----------------------------------------------------------------------
# the conversion
# ----------------------------------------------------------------------

def _load_table(root: str, version: str, name: str) -> List[Dict]:
    with open(os.path.join(root, version, name + ".json")) as f:
        return json.load(f)


def _write_png(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        import cv2

        cv2.imwrite(path, arr)
    except ImportError:  # pragma: no cover - cv2 is in the base image
        from PIL import Image

        Image.fromarray(arr).save(path)


def convert_nuimages(data_root: str,
                     version: str = "v1.0-mini",
                     out_dir: Optional[str] = None,
                     extra_tag: str = "nuimages") -> str:
    """Export one nuImages version to COCO JSON + semantic-mask PNGs.

    Mirrors `nuimage_converter.py:149-211`: key-frame sample_data rows
    become COCO images; per image, surface (stuff) masks then object
    (thing) masks are painted into the semantic map (objects sorted by
    token so instance order is deterministic); objects whose category
    maps into the 10-class nuScenes set emit COCO annotations.

    Returns the output JSON path.
    """
    out_dir = out_dir or os.path.join(data_root, "annotations")
    seg_root = os.path.join(out_dir, "semantic_masks")
    os.makedirs(out_dir, exist_ok=True)

    sample_data = _load_table(data_root, version, "sample_data")
    object_ann = _load_table(data_root, version, "object_ann")
    surface_ann = _load_table(data_root, version, "surface_ann")
    category = _load_table(data_root, version, "category")

    cat_by_token = {c["token"]: c["name"] for c in category}
    name2idx = name_to_index(category)
    categories = [dict(id=i, name=n) for i, n in enumerate(NUS_CATEGORIES)]
    cat2id = {c["name"]: c["id"] for c in categories}

    # group annotations by sample_data token (single pass, vs the
    # reference's per-image list scans)
    objs_by_sd: Dict[str, List[Dict]] = {}
    for o in object_ann:
        objs_by_sd.setdefault(o["sample_data_token"], []).append(o)
    surf_by_sd: Dict[str, List[Dict]] = {}
    for s in surface_ann:
        surf_by_sd.setdefault(s["sample_data_token"], []).append(s)

    images, annotations = [], []
    for sd in sample_data:
        if not sd.get("is_key_frame"):
            continue
        img_id = len(images)
        images.append(dict(id=img_id, token=sd["token"],
                           file_name=sd["filename"],
                           width=sd["width"], height=sd["height"]))
        h, w = sd["height"], sd["width"]
        semseg = np.zeros((h, w), np.uint8)

        for ann in surf_by_sd.get(sd["token"], ()):
            if ann["mask"] is None:
                continue
            m = decode_coco_rle(_counts_bytes(ann["mask"]["counts"]),
                                ann["mask"]["size"])
            semseg[m == 1] = name2idx[cat_by_token[ann["category_token"]]]

        for ann in sorted(objs_by_sd.get(sd["token"], ()),
                          key=lambda k: k["token"]):
            if ann["mask"] is None:
                continue
            cname = cat_by_token[ann["category_token"]]
            m = decode_coco_rle(_counts_bytes(ann["mask"]["counts"]),
                                ann["mask"]["size"])
            semseg[m == 1] = name2idx[cname]
            if cname not in NAME_MAPPING:
                continue
            x0, y0, x1, y1 = ann["bbox"]
            annotations.append(dict(
                id=len(annotations),
                image_id=img_id,
                category_id=cat2id[NAME_MAPPING[cname]],
                bbox=[x0, y0, x1 - x0, y1 - y0],
                area=(x1 - x0) * (y1 - y0),
                segmentation=dict(
                    counts=_counts_bytes(ann["mask"]["counts"]).decode(),
                    size=ann["mask"]["size"]),
                iscrowd=0))

        seg_path = os.path.join(
            seg_root, sd["filename"].replace("jpg", "png"))
        _write_png(seg_path, semseg)

    out_file = os.path.join(out_dir, f"{extra_tag}_{version}.json")
    with open(out_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    return out_file


def _counts_bytes(counts) -> bytes:
    """nuImages stores mask counts base64-encoded; accept raw too."""
    if isinstance(counts, bytes):
        return counts
    import base64

    try:
        return base64.b64decode(counts, validate=True)
    except Exception:
        return counts.encode()
