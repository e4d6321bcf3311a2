"""Train/eval runtime for the point-cloud model families.

Generic mesh-data-parallel train step for one-scene LiDAR detectors
(VoxelNet / DynamicVoxelNet / PointPillars / CenterPoint): the same
vmap-over-scenes + mean-reduction pattern as the flagship NeRF-Det step
(`train/step.py`) — XLA emits the gradient psum over the mesh — with a
pluggable per-scene loss so every family trains through the same
`tools/train.py` loop the reference drives via its runner
(`tools/train.py:155-162` in the reference).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .step import TrainState


def make_points_train_step(model, tx: optax.GradientTransformation,
                           scene_loss: Callable,
                           donate: bool = True) -> Callable:
    """Build a jitted train step from a per-scene loss.

    ``scene_loss(params, batch_stats, scene, rng) -> (terms, new_stats)``
    where ``terms`` is a dict of scalar losses that must include every
    component to optimize (summed into ``loss``).
    """

    def loss_fn(params, batch_stats, batch, rng):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keys = jax.random.split(rng, b)
        terms, new_stats = jax.vmap(
            lambda scene, key: scene_loss(params, batch_stats, scene,
                                          key))(batch, keys)
        new_stats = jax.tree_util.tree_map(
            lambda x: x.mean(axis=0), new_stats)
        metrics = {k: jnp.mean(v) for k, v in terms.items()}
        loss = sum(v for k, v in metrics.items()
                   if k.startswith("loss"))
        metrics["loss"] = loss
        return loss, (metrics, new_stats)

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def voxelnet_scene_loss(model, anchors, train_cfg: Dict,
                        num_classes: int, dir_offset: float = 0.0,
                        head_cfg: Dict = None):
    """Per-scene loss closure for the anchored LiDAR family
    (Anchor3DHead / FreeAnchor3DHead / ShapeAwareHead via
    ``head_cfg["type"]``)."""
    from ..models.voxelnet import voxelnet_loss

    assigner = train_cfg.get("assigner", dict(
        pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45))
    if isinstance(anchors, (list, tuple)):  # per-class grids (SSN)
        anchors = [jnp.asarray(a) for a in anchors]
    else:
        anchors = jnp.asarray(anchors)

    def f(params, batch_stats, scene, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outs, mutated = model.apply(variables, scene["points"],
                                    train=True, mutable=["batch_stats"])
        gt_mask = scene["gt_labels_3d"] >= 0
        losses = voxelnet_loss(
            outs, anchors, scene["gt_bboxes_3d"],
            jnp.maximum(scene["gt_labels_3d"], 0), gt_mask,
            num_classes=num_classes, assigners=assigner,
            dir_offset=dir_offset, head_cfg=head_cfg)
        terms = {k: v for k, v in losses.items()
                 if k.startswith("loss")}
        terms["n_pos"] = losses.get("n_pos", jnp.zeros(()))
        return terms, mutated["batch_stats"]

    return f


def mvx_scene_loss(model, anchors, train_cfg: Dict,
                   num_classes: int, dir_offset: float = 0.0,
                   head_cfg: Dict = None):
    """Per-scene loss closure for the MVX family (pts branch; the
    reference nests its train_cfg under ``pts``)."""
    from ..models.mvx import mvx_loss

    pts_cfg = (train_cfg or {}).get("pts", train_cfg or {})
    assigner = pts_cfg.get("assigner", dict(
        pos_iou_thr=0.6, neg_iou_thr=0.3, min_pos_iou=0.3))
    anchors = [jnp.asarray(a) for a in anchors]

    def f(params, batch_stats, scene, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outs, mutated = model.apply(variables, scene["points"],
                                    train=True, mutable=["batch_stats"])
        gt_mask = scene["gt_labels_3d"] >= 0
        losses = mvx_loss(
            outs, anchors, scene["gt_bboxes_3d"],
            jnp.maximum(scene["gt_labels_3d"], 0), gt_mask,
            num_classes=num_classes, assigner=assigner,
            dir_offset=dir_offset, head_cfg=head_cfg)
        terms = {k: v for k, v in losses.items()
                 if k.startswith("loss")}
        terms["n_pos"] = losses.get("n_pos", jnp.zeros(()))
        return terms, mutated["batch_stats"]

    return f


def centerpoint_scene_loss(model, aux: Dict):
    """Per-scene loss closure for CenterPoint."""
    from ..models.centerpoint import (centerpoint_loss_from_aux,
                                      centerpoint_targets_from_aux)

    def f(params, batch_stats, scene, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = model.apply(variables, scene["points"],
                                     train=True, mutable=["batch_stats"])
        tgts = centerpoint_targets_from_aux(
            scene["gt_bboxes_3d"], scene["gt_labels_3d"], aux)
        losses = centerpoint_loss_from_aux(preds, tgts, aux)
        return losses, mutated["batch_stats"]

    return f


def votenet_scene_loss(model):
    """Per-scene loss closure for VoteNet (indoor points)."""
    from ..ops.pointnet import collect_sa_indices

    def f(params, batch_stats, scene, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = model.apply(variables, scene["points"],
                                     train=True, mutable=["batch_stats"],
                                     sa_indices=collect_sa_indices(scene))
        losses = model.loss(preds, scene["points"], scene["gt_boxes"],
                            scene["gt_labels"], scene["gt_mask"])
        terms = {("loss_" + k if not k.startswith("loss") else k): v
                 for k, v in losses.items()}
        return terms, mutated["batch_stats"]

    return f


def h3dnet_scene_loss(model, train_cfg: Dict = None):
    """Per-scene loss closure for H3DNet (rpn + primitives + refine)."""
    from ..ops.pointnet import collect_sa_indices

    def f(params, batch_stats, scene, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = model.apply(variables, scene["points"],
                                     train=True, mutable=["batch_stats"],
                                     sa_indices=collect_sa_indices(scene))
        losses = model.loss(preds, scene["points"], scene["gt_boxes"],
                            scene["gt_labels"], scene["gt_mask"],
                            train_cfg)
        terms = {("loss_" + k if not k.startswith("loss") else k): v
                 for k, v in losses.items()}
        return terms, mutated["batch_stats"]

    return f


def ssd3d_scene_loss(model, train_cfg: Dict = None):
    """Per-scene loss closure for 3DSSD."""

    def f(params, batch_stats, scene, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = model.apply(variables, scene["points"],
                                     train=True, mutable=["batch_stats"])
        losses = model.loss(
            preds, scene["points"], scene["gt_bboxes_3d"],
            jnp.maximum(scene["gt_labels_3d"], 0),
            scene["gt_labels_3d"] >= 0, train_cfg)
        terms = {("loss_" + k if not k.startswith("loss") else k): v
                 for k, v in losses.items()}
        return terms, mutated["batch_stats"]

    return f


def parta2_scene_loss(model, anchors, train_cfg: Dict = None):
    """Per-scene loss closure for Part-A2 (two-stage)."""
    from ..models.parta2 import parta2_loss

    anchors = jnp.asarray(anchors)
    rpn_assigners = (train_cfg or {}).get("rpn", {}).get("assigner")
    num_samples = (train_cfg or {}).get("rcnn", {}).get(
        "sampler", {}).get("num", 128)
    num_proposals = (train_cfg or {}).get("rpn_proposal", {}).get(
        "max_num", 512)

    def f(params, batch_stats, scene, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(variables, scene["points"],
                                   train=True, mutable=["batch_stats"])
        v2 = {"params": params,
              "batch_stats": mutated["batch_stats"]}
        losses, stats2 = parta2_loss(
            model, v2, out, scene["points"], anchors,
            scene["gt_bboxes_3d"],
            jnp.maximum(scene["gt_labels_3d"], 0),
            scene["gt_labels_3d"] >= 0, rng,
            rpn_assigners=rpn_assigners, num_samples=num_samples,
            num_proposals=num_proposals, train=True)
        return losses, stats2

    return f


def run_indoor_points_eval(model, variables, dataset, model_cfg: Dict,
                           logger=None) -> Dict:
    """Whole-dataset inference + indoor (ScanNet) eval protocol for the
    VoteNet / H3DNet families: jitted forward+decode per scene, host
    aligned-NMS tail, then ``dataset.evaluate`` (indoor_eval)."""
    from ..models.votenet import votenet_nms

    mtype = model_cfg["type"]
    if mtype == "H3DNet":
        from ..models.h3dnet import h3dnet_get_bboxes

        def fwd(v, pts):
            preds = model.apply(v, pts, train=False, sample_mod="seed")
            return h3dnet_get_bboxes(preds, model.bbox_coder)
    else:
        from ..nn.vote_head import vote_head_get_bboxes

        def fwd(v, pts):
            preds = model.apply(v, pts, train=False)
            return vote_head_get_bboxes(preds, model.bbox_coder)

    fwd = jax.jit(fwd)
    results = []
    for i in range(len(dataset)):
        item = dataset[i]
        boxes, obj, sem = jax.device_get(
            fwd(variables, jnp.asarray(item["points"])))
        results.append(votenet_nms(
            np.asarray(boxes), np.asarray(obj), np.asarray(sem),
            item["points"][:, :3]))
    metrics = dataset.evaluate(results)
    if logger is not None:
        report = metrics.pop("report", None)
        if report:
            logger.info("\n" + report)
        logger.info("Eval: " + " ".join(
            f"{k}: {v:.4f}" for k, v in sorted(metrics.items())
            if isinstance(v, (int, float))))
    return metrics


def run_points_eval(model, variables, dataset, model_cfg: Dict,
                    aux=None, anchors=None, logger=None,
                    score_thr: float = 0.1, nms_pre: int = 100,
                    max_out: int = 50, flip_tta: bool = False,
                    tta_scales=None) -> Dict:
    """Whole-dataset inference + dataset-protocol evaluation.

    Device side is one jitted forward+decode per scene; NMS and anno
    formatting run host-side, then ``dataset.evaluate`` applies the
    dataset's own protocol (KITTI eval for KittiDataset).
    ``flip_tta`` (CenterPoint only): double-flip test-time augmentation
    — average the four BEV flip variants' logits before decoding
    (reference `detectors/centerpoint.py:85-187`, the flip-tta configs).
    ``tta_scales`` (CenterPoint only): point-scale TTA factors; decoded
    boxes are mapped back and merged with per-class rotated NMS
    (reference `merge_augs.py:merge_aug_bboxes_3d`, the tta configs).
    """
    from ..core.nms import box3d_multiclass_nms

    mtype = model_cfg["type"]
    results = []
    if mtype == "CenterPoint":
        from ..models.centerpoint import (centerpoint_aug_forward,
                                          centerpoint_detect,
                                          merge_aug_detections)

        if flip_tta:
            fwd = jax.jit(lambda v, pts: centerpoint_aug_forward(
                model, v, pts))
        else:
            fwd = jax.jit(lambda v, pts: model.apply(
                v, pts, train=False))
        scales = tuple(tta_scales or (1.0,))
        for i in range(len(dataset)):
            item = dataset[i]
            per_scale = []
            for s in scales:
                pts = np.asarray(item["points"])
                if s != 1.0:
                    pts = pts.copy()
                    pts[:, :3] *= s
                preds = fwd(variables, jnp.asarray(pts))
                preds = [{k: np.asarray(v) for k, v in p.items()}
                         for p in preds]
                boxes, scores, labels = centerpoint_detect(preds, aux)
                if s != 1.0:
                    boxes = boxes.copy()
                    # map back: centers/dims (and velocities) scale 1/s
                    boxes[:, :6] /= s
                    if boxes.shape[1] > 7:
                        boxes[:, 7:9] /= s
                per_scale.append((boxes, scores, labels))
            if len(per_scale) > 1:
                boxes, scores, labels = merge_aug_detections(
                    per_scale, nms_thr=aux.get("nms_thr", 0.2),
                    max_num=aux.get("merge_max_num", 500))
            else:
                boxes, scores, labels = per_scale[0]
            results.append(dict(boxes_3d=boxes, scores_3d=scores,
                                labels_3d=labels))
    elif mtype == "PartA2":
        from ..models.parta2 import parta2_test_tail

        fwd = jax.jit(lambda v, pts: model.apply(v, pts, train=False))
        for i in range(len(dataset)):
            item = dataset[i]
            out = fwd(variables, jnp.asarray(item["points"]))
            results.append(parta2_test_tail(out, model, variables,
                                            anchors))
    elif mtype == "SSD3DNet":
        from ..core.boxes import corners_from_boxes
        from ..core.nms import aligned_3d_nms
        from ..nn.ssd_3d_head import ssd3d_get_bboxes

        def fwd(v, pts):
            preds = model.apply(v, pts, train=False)
            return ssd3d_get_bboxes(preds, model.bbox_coder)

        fwd = jax.jit(fwd)
        for i in range(len(dataset)):
            item = dataset[i]
            boxes, obj, sem = jax.device_get(
                fwd(variables, jnp.asarray(item["points"])))
            boxes = np.asarray(boxes)
            bottom = boxes.copy()
            bottom[:, 2] -= bottom[:, 5] / 2
            corners = corners_from_boxes(bottom)
            minmax = np.concatenate(
                [corners.min(axis=1), corners.max(axis=1)], axis=-1)
            cls = np.asarray(sem).argmax(axis=-1)
            keep = aligned_3d_nms(minmax, np.asarray(obj), cls, 0.1)
            keep = keep[:100]
            results.append(dict(boxes_3d=bottom[keep],
                                scores_3d=np.asarray(obj)[keep],
                                labels_3d=cls[keep]))
    elif mtype in ("MVXFasterRCNN", "DynamicMVXFasterRCNN"):
        from ..models.mvx import mvx_get_bboxes

        num_classes = model_cfg["pts_bbox_head"]["num_classes"]
        anchors = [jnp.asarray(a) for a in anchors]

        def fwd(v, pts):
            outs = model.apply(v, pts, train=False)
            return mvx_get_bboxes(outs, anchors, num_classes,
                                  nms_pre=nms_pre)

        fwd = jax.jit(fwd)
        for i in range(len(dataset)):
            item = dataset[i]
            boxes, scores, dirs = jax.device_get(
                fwd(variables, jnp.asarray(item["points"])))
            boxes = np.asarray(boxes)
            scores = np.asarray(scores)
            padded = np.concatenate(
                [scores, np.zeros_like(scores[:, :1])], axis=1)
            bev = boxes[:, [0, 1, 3, 4, 6]]
            keep_b, keep_s, keep_l = box3d_multiclass_nms(
                boxes, bev, padded, score_thr=score_thr,
                max_num=max_out)
            results.append(dict(boxes_3d=keep_b, scores_3d=keep_s,
                                labels_3d=keep_l, sample_idx=i))
    else:
        from ..models.voxelnet import voxelnet_get_bboxes

        head_cfg = model_cfg["bbox_head"]
        num_classes = head_cfg["num_classes"]
        if isinstance(anchors, (list, tuple)):  # per-class grids (SSN)
            anchors = [jnp.asarray(a) for a in anchors]
        else:
            anchors = jnp.asarray(anchors)

        def fwd(v, pts):
            outs = model.apply(v, pts, train=False)
            return voxelnet_get_bboxes(outs, anchors, num_classes,
                                       nms_pre=nms_pre,
                                       head_cfg=head_cfg)

        fwd = jax.jit(fwd)
        for i in range(len(dataset)):
            item = dataset[i]
            boxes, scores, dirs = jax.device_get(
                fwd(variables, jnp.asarray(item["points"])))
            boxes = np.asarray(boxes)
            scores = np.asarray(scores)
            # background column + BEV boxes for the rotated NMS
            # (reference `anchor3d_head.get_bboxes:509-517`)
            padded = np.concatenate(
                [scores, np.zeros_like(scores[:, :1])], axis=1)
            bev = boxes[:, [0, 1, 3, 4, 6]]
            keep_b, keep_s, keep_l = box3d_multiclass_nms(
                boxes, bev, padded, score_thr=score_thr,
                max_num=max_out)
            results.append(dict(boxes_3d=keep_b, scores_3d=keep_s,
                                labels_3d=keep_l))
    metrics = dataset.evaluate(results)
    if logger is not None:
        report = metrics.pop("report", None)
        if report:
            logger.info("\n" + report)
        logger.info("Eval: " + " ".join(
            f"{k}: {v}" for k, v in sorted(metrics.items())
            if isinstance(v, (int, float))))
    return metrics
