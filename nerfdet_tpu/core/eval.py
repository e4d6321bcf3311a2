"""ScanNet-protocol indoor detection evaluation (mAP / mAR @ IoU thresholds).

Host-side numpy re-implementation of the reference protocol
(`mmdet3d/core/evaluation/indoor_eval.py:7-310`): per-class greedy TP/FP
matching against the highest-IoU ground truth, VOC-style area AP, and a
text summary table. Unlike the reference, the IoU matrix is computed with
pure numpy (`core/boxes.py`) instead of a CUDA kernel, so evaluation runs
anywhere.
"""

from __future__ import annotations

import numpy as np

from .boxes import DepthBoxes3D


def average_precision(recalls, precisions, mode: str = "area"):
    """VOC-style AP (reference `indoor_eval.py:7-52`)."""
    if recalls.ndim == 1:
        recalls = recalls[np.newaxis, :]
        precisions = precisions[np.newaxis, :]
    assert recalls.shape == precisions.shape and recalls.ndim == 2
    num_scales = recalls.shape[0]
    ap = np.zeros(num_scales, dtype=np.float32)
    if mode == "area":
        zeros = np.zeros((num_scales, 1), dtype=recalls.dtype)
        ones = np.ones((num_scales, 1), dtype=recalls.dtype)
        mrec = np.hstack((zeros, recalls, ones))
        mpre = np.hstack((zeros, precisions, zeros))
        for i in range(mpre.shape[1] - 1, 0, -1):
            mpre[:, i - 1] = np.maximum(mpre[:, i - 1], mpre[:, i])
        for i in range(num_scales):
            ind = np.where(mrec[i, 1:] != mrec[i, :-1])[0]
            ap[i] = np.sum((mrec[i, ind + 1] - mrec[i, ind]) * mpre[i, ind + 1])
    elif mode == "11points":
        for i in range(num_scales):
            for thr in np.arange(0, 1 + 1e-3, 0.1):
                precs = precisions[i, recalls[i, :] >= thr]
                prec = precs.max() if precs.size > 0 else 0
                ap[i] += prec
            ap /= 11
    else:
        raise ValueError('mode must be "area" or "11points"')
    return ap


def eval_det_cls(pred, gt, iou_thr):
    """Single-class precision/recall (reference `indoor_eval.py:55-160`).

    Args:
        pred: {img_id: [(DepthBoxes3D row, score), ...]}
        gt: {img_id: [DepthBoxes3D row, ...]}
        iou_thr: list of IoU thresholds.
    """
    class_recs = {}
    npos = 0
    for img_id in gt.keys():
        cur_gt_num = len(gt[img_id])
        if cur_gt_num != 0:
            gt_cur = np.zeros([cur_gt_num, 7], dtype=np.float32)
            for i in range(cur_gt_num):
                gt_cur[i] = gt[img_id][i].tensor
            bbox = gt[img_id][0].new_box(gt_cur)
        else:
            bbox = gt[img_id]
        det = [[False] * len(bbox) for _ in iou_thr]
        npos += len(bbox)
        class_recs[img_id] = {"bbox": bbox, "det": det}

    image_ids, confidence, ious = [], [], []
    for img_id in pred.keys():
        cur_num = len(pred[img_id])
        if cur_num == 0:
            continue
        pred_cur = np.zeros((cur_num, 7), dtype=np.float32)
        box_idx = 0
        box = None
        for box, score in pred[img_id]:
            image_ids.append(img_id)
            confidence.append(score)
            pred_cur[box_idx] = box.tensor
            box_idx += 1
        pred_cur = box.new_box(pred_cur)
        gt_cur = class_recs[img_id]["bbox"]
        if len(gt_cur) > 0:
            iou_cur = pred_cur.overlaps(gt_cur)
            for i in range(cur_num):
                ious.append(iou_cur[i])
        else:
            for _ in range(cur_num):
                ious.append(np.zeros(1))

    confidence = np.array(confidence)
    sorted_ind = np.argsort(-confidence)
    image_ids = [image_ids[x] for x in sorted_ind]
    ious = [ious[x] for x in sorted_ind]

    nd = len(image_ids)
    tp_thr = [np.zeros(nd) for _ in iou_thr]
    fp_thr = [np.zeros(nd) for _ in iou_thr]
    for d in range(nd):
        R = class_recs[image_ids[d]]
        iou_max, jmax = -np.inf, -1
        BBGT = R["bbox"]
        cur_iou = ious[d]
        if len(BBGT) > 0:
            for j in range(len(BBGT)):
                iou = cur_iou[j]
                if iou > iou_max:
                    iou_max = iou
                    jmax = j
        for iou_idx, thresh in enumerate(iou_thr):
            if iou_max > thresh:
                if not R["det"][iou_idx][jmax]:
                    tp_thr[iou_idx][d] = 1.0
                    R["det"][iou_idx][jmax] = 1
                else:
                    fp_thr[iou_idx][d] = 1.0
            else:
                fp_thr[iou_idx][d] = 1.0

    ret = []
    for iou_idx, _ in enumerate(iou_thr):
        fp = np.cumsum(fp_thr[iou_idx])
        tp = np.cumsum(tp_thr[iou_idx])
        recall = tp / float(max(npos, 1))
        precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        ap = average_precision(recall, precision)
        ret.append((recall, precision, ap))
    return ret


def eval_map_recall(pred, gt, ovthresh):
    """Multi-class wrapper (reference `indoor_eval.py:163-200`)."""
    ret_values = {}
    for classname in gt.keys():
        if classname in pred:
            ret_values[classname] = eval_det_cls(
                pred[classname], gt[classname], ovthresh
            )
    recall = [{} for _ in ovthresh]
    precision = [{} for _ in ovthresh]
    ap = [{} for _ in ovthresh]
    for label in gt.keys():
        for iou_idx, _ in enumerate(ovthresh):
            if label in pred:
                recall[iou_idx][label], precision[iou_idx][label], ap[iou_idx][
                    label
                ] = ret_values[label][iou_idx]
            else:
                recall[iou_idx][label] = np.zeros(1)
                precision[iou_idx][label] = np.zeros(1)
                ap[iou_idx][label] = np.zeros(1)
    return recall, precision, ap


def indoor_eval(gt_annos, dt_annos, metric, label2cat, logger=None,
                box_dim: int = 6):
    """ScanNet mAP/mAR evaluation (reference `indoor_eval.py:203-310`).

    Args:
        gt_annos: list of dicts with keys ``gt_num``,
            ``gt_boxes_upright_depth`` ((n, 6/7), gravity-centered) and
            ``class`` ((n,) labels).
        dt_annos: list of dicts with ``labels_3d`` (n,), ``scores_3d`` (n,)
            and ``boxes_3d`` — either a DepthBoxes3D or a raw
            bottom-centered (n, 7) array.
        metric: list of IoU thresholds, e.g. ``[0.25, 0.5]``.
        label2cat: {label: class name}.
    """
    assert len(dt_annos) == len(gt_annos)
    pred, gt = {}, {}
    for img_id in range(len(dt_annos)):
        det_anno = dt_annos[img_id]
        boxes_3d = det_anno["boxes_3d"]
        if not isinstance(boxes_3d, DepthBoxes3D):
            boxes_3d = DepthBoxes3D(
                np.asarray(boxes_3d, np.float32).reshape(-1, 7),
                box_dim=7, with_yaw=False, origin=(0.5, 0.5, 0))
        labels_3d = np.asarray(det_anno["labels_3d"])
        scores_3d = np.asarray(det_anno["scores_3d"])
        for i in range(len(labels_3d)):
            label = int(labels_3d[i])
            pred.setdefault(label, {}).setdefault(img_id, [])
            gt.setdefault(label, {}).setdefault(img_id, [])
            pred[label][img_id].append((boxes_3d[i], float(scores_3d[i])))

        gt_anno = gt_annos[img_id]
        if gt_anno["gt_num"] != 0:
            gt_boxes = DepthBoxes3D(
                gt_anno["gt_boxes_upright_depth"],
                box_dim=gt_anno["gt_boxes_upright_depth"].shape[-1],
                with_yaw=gt_anno["gt_boxes_upright_depth"].shape[-1] == 7,
                origin=(0.5, 0.5, 0.5),
            )
            labels_3d = np.asarray(gt_anno["class"])
        else:
            gt_boxes = DepthBoxes3D(np.zeros((0, 7), np.float32))
            labels_3d = np.array([], dtype=np.int64)
        for i in range(len(labels_3d)):
            label = int(labels_3d[i])
            gt.setdefault(label, {}).setdefault(img_id, [])
            gt[label][img_id].append(gt_boxes[i])

    rec, prec, ap = eval_map_recall(pred, gt, metric)

    ret_dict = {}
    lines = [f"{'class':<16}" + "".join(
        f"AP_{t:.2f}   AR_{t:.2f}   " for t in metric)]
    for i, iou_thresh in enumerate(metric):
        rec_list = []
        for label in ap[i].keys():
            ret_dict[f"{label2cat[label]}_AP_{iou_thresh:.2f}"] = float(
                ap[i][label][0]
            )
        ret_dict[f"mAP_{iou_thresh:.2f}"] = float(np.mean(list(ap[i].values())))
        for label in rec[i].keys():
            ret_dict[f"{label2cat[label]}_rec_{iou_thresh:.2f}"] = float(
                rec[i][label][-1]
            )
            rec_list.append(rec[i][label][-1])
        ret_dict[f"mAR_{iou_thresh:.2f}"] = float(np.mean(rec_list))

    for label in sorted(gt.keys()):
        row = f"{str(label2cat[label]):<16}"
        for i, t in enumerate(metric):
            row += f"{float(ap[i][label][0]):<9.4f}{float(rec[i][label][-1]):<9.4f}"
        lines.append(row)
    row = f"{'Overall':<16}"
    for t in metric:
        row += f"{ret_dict[f'mAP_{t:.2f}']:<9.4f}{ret_dict[f'mAR_{t:.2f}']:<9.4f}"
    lines.append(row)
    report = "\n".join(lines)
    if logger is not None:
        logger.info("\n" + report)
    else:
        print(report)
    return ret_dict
