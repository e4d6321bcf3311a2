"""CenterPoint center-based detection head (NHWC, static shapes).

TPU-native equivalent of the reference
`mmdet3d/models/dense_heads/centerpoint_head.py:18-822` +
`core/bbox/coders/centerpoint_bbox_coders.py` + `core/utils/gaussian.py`:
a shared conv trunk feeding per-task "separate heads" (heatmap / reg /
height / dim / rot [/ vel]), gaussian heatmap targets, penalty-reduced
focal + masked-L1 losses, and a top-K decoder.

Redesigns vs the reference:

* target assignment is fully vectorized (`centerpoint_targets`): the
  per-object python loop with in-place cropped-gaussian writes becomes
  one broadcast gaussian stack max-reduced per class — jit/vmap-safe
  with padded GT (static ``max_objs``);
* everything is one-scene NHWC; batching is ``vmap`` in the train step
  (the reference loops per-sample inside the head);
* decode is a single static top-K over the flattened class/space axes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, dtype=dtype, name=name)


class SeparateHead(nn.Module):
    """Per-branch conv stacks over a shared feature map
    (reference `centerpoint_head.py:18-120`).

    ``heads`` maps branch name → (out_channels, num_convs); the final
    heatmap conv bias starts at ``init_bias`` so initial foreground
    probability is ~sigmoid(-2.19) ≈ 0.1.
    """

    heads: Dict[str, Tuple[int, int]]
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = {}
        pad = self.final_kernel // 2
        for name, (out_ch, num_convs) in self.heads.items():
            h = x
            for i in range(num_convs - 1):
                h = nn.Conv(self.head_conv,
                            (self.final_kernel,) * 2,
                            padding=((pad, pad), (pad, pad)),
                            use_bias=False, dtype=self.dtype,
                            name=f"{name}_conv{i}")(h)
                h = _bn(train, self.dtype, f"{name}_bn{i}")(h)
                h = nn.relu(h)
            bias_init = (nn.initializers.constant(self.init_bias)
                         if name == "heatmap"
                         else nn.initializers.zeros_init())
            out[name] = nn.Conv(out_ch, (self.final_kernel,) * 2,
                                padding=((pad, pad), (pad, pad)),
                                use_bias=True, bias_init=bias_init,
                                dtype=self.dtype, name=f"{name}_out")(h)
        return out


class DCNSeparateHead(nn.Module):
    """Separate head with deformable-conv feature adaptation
    (reference ``DCNSeperateHead``, `centerpoint_head.py:122-234`):
    two DCN layers split the shared feature into classification and
    regression streams; the heatmap gets its own conv-bn-relu-conv
    tower, the remaining branches reuse :class:`SeparateHead`.
    """

    heads: Dict[str, Tuple[int, int]]
    dcn_groups: int = 4
    dcn_deform_groups: int = 1
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .dcn import DeformConv2d

        num_cls = self.heads["heatmap"][0]
        reg_heads = {k: v for k, v in self.heads.items()
                     if k != "heatmap"}
        c = x.shape[-1]
        center_feat = DeformConv2d(
            out_channels=c, groups=self.dcn_groups,
            deform_groups=self.dcn_deform_groups, dtype=self.dtype,
            name="feature_adapt_cls")(x)
        reg_feat = DeformConv2d(
            out_channels=c, groups=self.dcn_groups,
            deform_groups=self.dcn_deform_groups, dtype=self.dtype,
            name="feature_adapt_reg")(x)

        h = nn.Conv(self.head_conv, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    name="cls_conv")(center_feat)
        h = _bn(train, self.dtype, "cls_bn")(h)
        h = nn.relu(h)
        heatmap = nn.Conv(
            num_cls, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            bias_init=nn.initializers.constant(self.init_bias),
            dtype=self.dtype, name="cls_out")(h)

        out = SeparateHead(
            heads=reg_heads, head_conv=self.head_conv,
            final_kernel=self.final_kernel, dtype=self.dtype,
            name="task_head")(reg_feat, train=train)
        out["heatmap"] = heatmap
        return out


class CenterHead(nn.Module):
    """Multi-task center head (reference `centerpoint_head.py:235-354`).

    ``tasks``: per-task class counts; ``common_heads``: regression
    branch spec, e.g. ``{"reg": (2, 2), "height": (1, 2),
    "dim": (3, 2), "rot": (2, 2), "vel": (2, 2)}``.
    ``separate_head_type``: 'SeparateHead' (default) or
    'DCNSeperateHead' (the reference's spelling) for deformable-conv
    feature adaptation per task.
    """

    tasks: Tuple[int, ...] = (1,)
    common_heads: Any = (("reg", (2, 2)), ("height", (1, 2)),
                         ("dim", (3, 2)), ("rot", (2, 2)))
    share_conv_channel: int = 64
    num_heatmap_convs: int = 2
    separate_head_type: str = "SeparateHead"
    dcn_groups: int = 4
    dcn_deform_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        x = nn.Conv(self.share_conv_channel, (3, 3),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="shared_conv")(x)
        x = _bn(train, self.dtype, "shared_bn")(x)
        x = nn.relu(x)
        outs = []
        for t, num_cls in enumerate(self.tasks):
            heads = dict(self.common_heads)
            heads["heatmap"] = (num_cls, self.num_heatmap_convs)
            if self.separate_head_type.startswith("DCN"):
                o = DCNSeparateHead(
                    heads=heads, dcn_groups=self.dcn_groups,
                    dcn_deform_groups=self.dcn_deform_groups,
                    dtype=self.dtype, name=f"task_{t}")(x, train=train)
            else:
                o = SeparateHead(heads=heads, dtype=self.dtype,
                                 name=f"task_{t}")(x, train=train)
            if squeeze:
                o = {k: v[0] for k, v in o.items()}
            outs.append(o)
        return outs


# ---------------------------------------------------------------------------
# Targets
# ---------------------------------------------------------------------------

def gaussian_radius(length, width, min_overlap: float = 0.5):
    """Vectorized CornerNet radius (reference `gaussian.py:56-85`).

    Keeps the reference's quadratic-root denominators (all /2 — the
    well-known CornerNet derivation bug) so assigned radii, and hence
    training targets, match the reference bit-for-bit.
    """
    b1 = length + width
    sq1 = jnp.sqrt(jnp.maximum(
        b1 ** 2 - 4.0 * width * length * (1 - min_overlap)
        / (1 + min_overlap), 0.0))
    r1 = (b1 + sq1) / 2.0
    b2 = 2.0 * (length + width)
    sq2 = jnp.sqrt(jnp.maximum(
        b2 ** 2 - 16.0 * (1 - min_overlap) * width * length, 0.0))
    r2 = (b2 + sq2) / 2.0
    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (length + width)
    sq3 = jnp.sqrt(jnp.maximum(
        b3 ** 2 - 4.0 * a3 * (min_overlap - 1) * width * length, 0.0))
    r3 = (b3 + sq3) / 2.0
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def centerpoint_targets(gt_boxes, gt_labels, *, task_classes: Sequence[int],
                        feature_map_size: Tuple[int, int],
                        point_cloud_range, voxel_size,
                        out_size_factor: int = 4,
                        gaussian_overlap: float = 0.1,
                        min_radius: int = 2,
                        max_objs: int = 100,
                        norm_bbox: bool = True,
                        with_vel: bool = False):
    """One scene's targets for every task (vectorized).

    gt_boxes: (G, 7[+2]) lidar boxes with z = bottom face (+ optional
    velocities); gt_labels: (G,) with -1 padding. Task t owns global
    label ids [sum(task_classes[:t]), sum(task_classes[:t+1])).

    Returns a list (one dict per task) with ``heatmap`` (H, W, C_t),
    ``anno_box`` (max_objs, 8 or 10), ``ind``/``mask`` (max_objs,).
    The reference's per-object cropped-gaussian writes
    (`centerpoint_head.py:478-558`) become a masked max over a
    broadcast (G, H, W) gaussian stack.
    """
    gt_boxes = jnp.asarray(gt_boxes)
    gt_labels = jnp.asarray(gt_labels)
    w_map, h_map = feature_map_size  # (W, H) like the reference
    pc = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)

    # gravity-centered z (reference concatenates gravity_center)
    gz = gt_boxes[:, 2] + gt_boxes[:, 5] / 2.0
    dxw = gt_boxes[:, 3] / vs[0] / out_size_factor  # width in cells
    dyl = gt_boxes[:, 4] / vs[1] / out_size_factor  # length in cells
    radius = gaussian_radius(dyl, dxw, gaussian_overlap)
    radius = jnp.maximum(min_radius,
                         radius.astype(jnp.int32)).astype(jnp.float32)
    cx = (gt_boxes[:, 0] - pc[0]) / vs[0] / out_size_factor
    cy = (gt_boxes[:, 1] - pc[1]) / vs[1] / out_size_factor
    cxi = cx.astype(jnp.int32)
    cyi = cy.astype(jnp.int32)

    size_ok = (dxw > 0) & (dyl > 0)
    in_map = ((cxi >= 0) & (cxi < w_map) & (cyi >= 0) & (cyi < h_map))

    ys = jnp.arange(h_map, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w_map, dtype=jnp.float32)[None, None, :]
    dx = xs - cxi[:, None, None].astype(jnp.float32)
    dy = ys - cyi[:, None, None].astype(jnp.float32)
    sigma = (2.0 * radius + 1.0) / 6.0
    g = jnp.exp(-(dx ** 2 + dy ** 2)
                / (2.0 * sigma[:, None, None] ** 2))
    window = ((jnp.abs(dx) <= radius[:, None, None])
              & (jnp.abs(dy) <= radius[:, None, None]))
    g = jnp.where(window, g, 0.0)  # the reference crops to the radius

    out = []
    base = 0
    for n_cls in task_classes:
        local = gt_labels - base
        owned = (local >= 0) & (local < n_cls) & size_ok & in_map
        onehot = jax.nn.one_hot(jnp.where(owned, local, -1), n_cls,
                                dtype=g.dtype)  # (G, C); -1 -> zeros
        heatmap = jnp.max(
            g[:, :, :, None] * onehot[:, None, None, :], axis=0)

        # top-max_objs owned boxes keep their original order (the
        # reference packs task boxes densely; with padded GT we keep
        # slot k for box k and mask the rest)
        ind = jnp.clip(cyi, 0, h_map - 1) * w_map + jnp.clip(
            cxi, 0, w_map - 1)
        mask = owned
        anno_parts = [
            (cx - cxi.astype(jnp.float32))[:, None],
            (cy - cyi.astype(jnp.float32))[:, None],
            gz[:, None],
            (jnp.log(jnp.maximum(gt_boxes[:, 3:6], 1e-6))
             if norm_bbox else gt_boxes[:, 3:6]),
            jnp.sin(gt_boxes[:, 6])[:, None],
            jnp.cos(gt_boxes[:, 6])[:, None],
        ]
        if with_vel:
            anno_parts.append(gt_boxes[:, 7:9])
        anno = jnp.concatenate(anno_parts, axis=1)

        def _fit(a, fill=0):
            n = a.shape[0]
            if n >= max_objs:
                return a[:max_objs]
            pad_shape = (max_objs - n,) + a.shape[1:]
            return jnp.concatenate(
                [a, jnp.full(pad_shape, fill, a.dtype)], axis=0)

        out.append(dict(
            heatmap=heatmap,
            anno_box=_fit(anno.astype(jnp.float32)),
            ind=_fit(ind.astype(jnp.int32)),
            mask=_fit(mask),
        ))
        base += n_cls
    return out


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def clip_sigmoid(x, eps: float = 1e-4):
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def gaussian_focal_loss(pred_prob, gaussian_target, alpha: float = 2.0,
                        gamma: float = 4.0):
    """Penalty-reduced focal loss on a clipped-sigmoid heatmap
    (mmdet `gaussian_focal_loss`). Returns the elementwise loss."""
    eps = 1e-12
    pos = (gaussian_target == 1.0).astype(pred_prob.dtype)
    neg_weights = jnp.power(1.0 - gaussian_target, gamma)
    pos_loss = -jnp.log(pred_prob + eps) * jnp.power(
        1.0 - pred_prob, alpha) * pos
    neg_loss = -jnp.log(1.0 - pred_prob + eps) * jnp.power(
        pred_prob, alpha) * neg_weights * (1.0 - pos)
    return pos_loss + neg_loss


def centerpoint_loss(preds: Sequence[Dict], targets: Sequence[Dict],
                     code_weights: Sequence[float],
                     loss_bbox_weight: float = 0.25,
                     with_vel: bool = False):
    """Total heatmap + regression loss over all tasks (one scene).

    Mirrors `centerpoint_head.py:562-610`; the bbox term uses the
    intended sum/num_pos normalization (the reference's v0.8 config
    accidentally returns the unreduced tensor which the runner then
    means — we keep the canonical CenterPoint normalization and fold
    the difference into ``loss_bbox_weight``).
    """
    cw = jnp.asarray(code_weights, jnp.float32)
    total_hm = 0.0
    total_bbox = 0.0
    for pred, tgt in zip(preds, targets):
        prob = clip_sigmoid(pred["heatmap"])
        num_pos = jnp.maximum((tgt["heatmap"] == 1.0).sum(), 1.0)
        total_hm = total_hm + gaussian_focal_loss(
            prob, tgt["heatmap"]).sum() / num_pos

        parts = [pred["reg"], pred["height"], pred["dim"], pred["rot"]]
        if with_vel:
            parts.append(pred["vel"])
        anno_pred = jnp.concatenate(parts, axis=-1)  # (H, W, D)
        d = anno_pred.shape[-1]
        flat = anno_pred.reshape(-1, d)
        picked = jnp.take(flat, tgt["ind"], axis=0)   # (max_objs, D)
        mask = tgt["mask"].astype(jnp.float32)[:, None]
        num = jnp.maximum(mask.sum(), 1e-4)
        err = jnp.abs(picked - tgt["anno_box"]) * mask * cw[None, :d]
        total_bbox = total_bbox + err.sum() / num
    return dict(loss_heatmap=total_hm,
                loss_bbox=loss_bbox_weight * total_bbox)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def centerpoint_decode(pred: Dict, *, point_cloud_range, voxel_size,
                       out_size_factor: int = 4, k: int = 100,
                       score_threshold: float = 0.1,
                       post_center_range=None,
                       with_vel: bool = False):
    """Top-K decode of one task's maps (one scene).

    Reference `centerpoint_bbox_coders.py:decode`: flatten the (H, W,
    C) heatmap, take the K best peaks, gather the regression branches
    at those cells, reconstruct world-frame boxes (z recentered to the
    bottom face like `get_bboxes`'s final shift).

    Returns dict of ``bboxes`` (k, 7/9), ``scores`` (k,), ``labels``
    (k,), ``keep`` (k,) validity mask — static shapes, jit-safe.
    """
    hm = jax.nn.sigmoid(pred["heatmap"])
    h_map, w_map, n_cls = hm.shape
    flat = hm.transpose(2, 0, 1).reshape(-1)   # (C*H*W,)
    scores, idx = jax.lax.top_k(flat, k)
    labels = idx // (h_map * w_map)
    cell = idx % (h_map * w_map)
    ys = (cell // w_map).astype(jnp.float32)
    xs = (cell % w_map).astype(jnp.float32)

    def _at(name):
        m = pred[name]
        return jnp.take(m.reshape(-1, m.shape[-1]), cell, axis=0)

    reg = _at("reg")
    xs = xs + reg[:, 0]
    ys = ys + reg[:, 1]
    pc = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    x = xs * out_size_factor * vs[0] + pc[0]
    y = ys * out_size_factor * vs[1] + pc[1]
    z = _at("height")[:, 0]
    dims = jnp.exp(_at("dim"))
    rot = jnp.arctan2(_at("rot")[:, 0], _at("rot")[:, 1])
    cols = [x[:, None], y[:, None],
            (z - dims[:, 2] / 2.0)[:, None],   # back to bottom face
            dims, rot[:, None]]
    if with_vel:
        cols.append(_at("vel"))
    boxes = jnp.concatenate(cols, axis=1)

    keep = scores > score_threshold
    if post_center_range is not None:
        pr = jnp.asarray(post_center_range, jnp.float32)
        center = jnp.stack([x, y, z], axis=1)
        keep &= ((center >= pr[:3]) & (center <= pr[3:])).all(axis=1)
    return dict(bboxes=boxes, scores=jnp.where(keep, scores, 0.0),
                labels=labels, keep=keep)


def centerpoint_post_process(task_outs: Sequence[Dict],
                             task_classes: Sequence[int],
                             nms_type: str = "circle",
                             min_radius: Sequence[float] = (4.0,),
                             post_max_size: int = 83,
                             nms_thr: float = 0.2,
                             pre_max_size: int = 1000):
    """Host-side NMS + cross-task merge (reference
    `centerpoint_head.py:654-705`). ``task_outs`` are decode() results
    pulled to numpy. ``nms_type``: 'circle' or 'rotate' (the
    reference's nms_gpu rotated-BEV path, class-agnostic within each
    task). Returns (boxes, scores, labels)."""
    from ..core.nms import circle_nms, nms_bev_rotated

    all_b, all_s, all_l = [], [], []
    base = 0
    for t, out in enumerate(task_outs):
        b = np.asarray(out["bboxes"])
        s = np.asarray(out["scores"])
        lab = np.asarray(out["labels"])
        keep = np.asarray(out["keep"]).astype(bool)
        b, s, lab = b[keep], s[keep], lab[keep]
        order = np.argsort(-s)
        b, s, lab = b[order], s[order], lab[order]
        if nms_type == "circle" and len(s):
            # the reference passes min_radius straight through and the
            # kernel compares it against SQUARED distance
            # (`box3d_nms.py:161-170`) — keep that behavior
            kept = circle_nms(
                np.concatenate([b[:, :2], s[:, None]], axis=1),
                float(min_radius[min(t, len(min_radius) - 1)]))
            kept = kept[:post_max_size]
            b, s, lab = b[kept], s[kept], lab[kept]
        elif nms_type == "rotate" and len(s):
            b, s, lab = b[:pre_max_size], s[:pre_max_size], lab[:pre_max_size]
            kept = nms_bev_rotated(b[:, [0, 1, 3, 4, 6]], s, nms_thr)
            kept = np.asarray(kept)[:post_max_size]
            b, s, lab = b[kept], s[kept], lab[kept]
        all_b.append(b)
        all_s.append(s)
        all_l.append(lab + base)
        base += task_classes[t]
    return (np.concatenate(all_b) if all_b else np.zeros((0, 7)),
            np.concatenate(all_s), np.concatenate(all_l))
