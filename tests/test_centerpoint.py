"""CenterPoint: head, targets, decode round trip, full detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.models.centerpoint import (build_centerpoint,
                                            centerpoint_detect,
                                            centerpoint_loss_from_aux,
                                            centerpoint_targets_from_aux)
from nerfdet_tpu.nn.centerpoint_head import (centerpoint_decode,
                                             centerpoint_loss,
                                             centerpoint_targets,
                                             gaussian_radius)

PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
VOXEL = (0.25, 0.25, 4.0)


def _cfg(tasks=(dict(num_class=1, class_names=["Car"]),
               dict(num_class=2, class_names=["Ped", "Cyc"]))):
    return dict(
        type="CenterPoint",
        voxel_layer=dict(max_num_points=8, voxel_size=VOXEL,
                         point_cloud_range=PC_RANGE, max_voxels=1024),
        voxel_encoder=dict(type="PillarFeatureNet", in_channels=4,
                           feat_channels=[32]),
        middle_encoder=dict(type="PointPillarsScatter", in_channels=32),
        backbone=dict(type="SECOND", in_channels=32,
                      out_channels=[32, 64], layer_nums=[1, 1],
                      layer_strides=[2, 2]),
        neck=dict(type="SECONDFPN", in_channels=[32, 64],
                  out_channels=[32, 32], upsample_strides=[1, 2]),
        bbox_head=dict(
            type="CenterHead", in_channels=64, tasks=list(tasks),
            common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2)),
            bbox_coder=dict(type="CenterPointBBoxCoder",
                            post_center_range=[-5, -10, -5, 20, 10, 5],
                            max_num=32, score_threshold=0.05,
                            out_size_factor=2,
                            voxel_size=VOXEL[:2], code_size=7)),
        train_cfg=dict(grid_size=[64, 64, 1], out_size_factor=2,
                       gaussian_overlap=0.1, max_objs=16, min_radius=2,
                       code_weights=[1.0] * 8),
        test_cfg=dict(min_radius=[1.0, 0.5], score_threshold=0.05,
                      post_max_size=16, nms_type="circle"),
    )


def _gt():
    boxes = np.array([
        [4.0, -2.0, -1.6, 1.6, 3.9, 1.5, 0.3],
        [10.0, 3.0, -1.5, 0.6, 0.8, 1.7, -0.5],
        [7.0, 0.5, -1.4, 0.5, 1.7, 1.6, 1.1],
    ], np.float32)
    labels = np.array([0, 1, 2], np.int64)
    pad_b = np.zeros((5, 7), np.float32)
    pad_l = np.full(5, -1, np.int64)
    return (np.concatenate([boxes, pad_b]),
            np.concatenate([labels, pad_l]))


def test_gaussian_radius_matches_reference_formula():
    import torch

    def ref(det_size, min_overlap):
        height, width = det_size
        b1 = height + width
        c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
        sq1 = torch.sqrt(b1 ** 2 - 4 * c1)
        r1 = (b1 + sq1) / 2
        b2 = 2 * (height + width)
        c2 = (1 - min_overlap) * width * height
        sq2 = torch.sqrt(b2 ** 2 - 16 * c2)
        r2 = (b2 + sq2) / 2
        a3 = 4 * min_overlap
        b3 = -2 * min_overlap * (height + width)
        c3 = (min_overlap - 1) * width * height
        sq3 = torch.sqrt(b3 ** 2 - 4 * a3 * c3)
        r3 = (b3 + sq3) / 2
        return min(r1, r2, r3)

    for h, w, ov in [(3.0, 2.0, 0.1), (10.0, 4.0, 0.5), (1.5, 1.5, 0.7)]:
        mine = float(gaussian_radius(jnp.float32(h), jnp.float32(w), ov))
        theirs = float(ref((torch.tensor(h), torch.tensor(w)), ov))
        np.testing.assert_allclose(mine, theirs, rtol=1e-5)


def test_targets_shapes_and_heatmap_peaks():
    boxes, labels = _gt()
    tgts = centerpoint_targets(
        boxes, labels, task_classes=(1, 2), feature_map_size=(32, 32),
        point_cloud_range=PC_RANGE, voxel_size=VOXEL, out_size_factor=2,
        max_objs=16)
    assert len(tgts) == 2
    t0, t1 = tgts
    assert t0["heatmap"].shape == (32, 32, 1)
    assert t1["heatmap"].shape == (32, 32, 2)
    assert t0["anno_box"].shape == (16, 8)
    # exactly the car is a peak of task 0
    assert float(t0["heatmap"].max()) == 1.0
    assert int(t0["mask"].sum()) == 1
    assert int(t1["mask"].sum()) == 2
    # peak location = int center cell
    y, x, _ = np.unravel_index(int(jnp.argmax(t0["heatmap"])),
                               t0["heatmap"].shape)
    assert x == int((4.0 - PC_RANGE[0]) / VOXEL[0] / 2)
    assert y == int((-2.0 - PC_RANGE[1]) / VOXEL[1] / 2)


def test_encode_decode_round_trip():
    """Predictions synthesized from the targets must decode back to
    the ground truth boxes."""
    boxes, labels = _gt()
    tgts = centerpoint_targets(
        boxes, labels, task_classes=(1, 2), feature_map_size=(32, 32),
        point_cloud_range=PC_RANGE, voxel_size=VOXEL, out_size_factor=2,
        max_objs=16)
    recovered = []
    for t, tgt in enumerate(tgts):
        hm = np.asarray(tgt["heatmap"])
        logits = np.where(hm >= 1.0, 12.0, -12.0).astype(np.float32)
        h, w, c = hm.shape
        full = np.zeros((h, w, 8), np.float32)
        inds = np.asarray(tgt["ind"])
        mask = np.asarray(tgt["mask"]).astype(bool)
        anno = np.asarray(tgt["anno_box"])
        for i in np.where(mask)[0]:
            yy, xx = inds[i] // w, inds[i] % w
            full[yy, xx] = anno[i]
        pred = dict(
            heatmap=jnp.asarray(logits),
            reg=jnp.asarray(full[..., 0:2]),
            height=jnp.asarray(full[..., 2:3]),
            dim=jnp.asarray(full[..., 3:6]),
            rot=jnp.asarray(full[..., 6:8][..., ::-1] * 0
                            + np.stack([full[..., 6], full[..., 7]],
                                       axis=-1)),
        )
        out = centerpoint_decode(
            pred, point_cloud_range=PC_RANGE, voxel_size=VOXEL,
            out_size_factor=2, k=8, score_threshold=0.5)
        b = np.asarray(out["bboxes"])[np.asarray(out["keep"])]
        lab = np.asarray(out["labels"])[np.asarray(out["keep"])]
        recovered.append((b, lab, t))
    car = recovered[0][0]
    assert car.shape[0] == 1
    np.testing.assert_allclose(car[0, :6], boxes[0, :6], atol=1e-3)
    # yaw recovered modulo 2pi
    np.testing.assert_allclose(np.sin(car[0, 6]), np.sin(boxes[0, 6]),
                               atol=1e-3)
    others = recovered[1][0]
    assert others.shape[0] == 2


def test_loss_decreases_toward_targets():
    boxes, labels = _gt()
    tgts = centerpoint_targets(
        boxes, labels, task_classes=(1, 2), feature_map_size=(32, 32),
        point_cloud_range=PC_RANGE, voxel_size=VOXEL, out_size_factor=2,
        max_objs=16)

    def mk_preds(noise):
        preds = []
        rng = np.random.RandomState(0)
        for tgt in tgts:
            hm = np.asarray(tgt["heatmap"])
            c = hm.shape[-1]
            preds.append(dict(
                heatmap=jnp.asarray(
                    np.where(hm >= 1, 8.0, -8.0)
                    + noise * rng.randn(*hm.shape)).astype(jnp.float32),
                reg=jnp.zeros((32, 32, 2)) + noise,
                height=jnp.zeros((32, 32, 1)) + noise,
                dim=jnp.zeros((32, 32, 3)) + noise,
                rot=jnp.zeros((32, 32, 2)) + noise,
            ))
        return preds

    l_far = centerpoint_loss(mk_preds(3.0), tgts, code_weights=[1.0] * 8)
    l_near = centerpoint_loss(mk_preds(0.1), tgts, code_weights=[1.0] * 8)
    tot_far = float(l_far["loss_heatmap"] + l_far["loss_bbox"])
    tot_near = float(l_near["loss_heatmap"] + l_near["loss_bbox"])
    assert np.isfinite(tot_far) and np.isfinite(tot_near)
    assert tot_near < tot_far


def test_full_detector_forward_loss_grad_and_detect():
    cfg = _cfg()
    model, aux = build_centerpoint(cfg)
    rng = np.random.RandomState(0)
    pts = rng.uniform([0, -8, -3, 0], [16, 8, 1, 1],
                      (512, 4)).astype(np.float32)
    boxes, labels = _gt()

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), pts, train=False))()

    def loss_fn(params):
        preds, new_state = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            pts, train=True, mutable=["batch_stats"])
        tgts = centerpoint_targets_from_aux(boxes, labels, aux)
        losses = centerpoint_loss_from_aux(preds, tgts, aux)
        return losses["loss_heatmap"] + losses["loss_bbox"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.abs(g).sum()), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0

    preds = jax.jit(lambda v: model.apply(v, pts, train=False))(variables)
    b, s, lab = centerpoint_detect(
        [{k: np.asarray(v) for k, v in p.items()} for p in preds], aux)
    assert b.shape[1] == 7 and len(s) == len(lab) == len(b)


def test_builder_registry():
    from nerfdet_tpu.models.builder import build_model

    model = build_model(_cfg())
    assert model.__class__.__name__ == "CenterPoint"


def _maps_from_targets(tgt, n_reg: int = 8):
    """Dense pred maps encoding a target dict (as in the round-trip
    test): heatmap logits + anno values scattered at their cells."""
    hm = np.asarray(tgt["heatmap"])
    logits = np.where(hm >= 1.0, 12.0, -12.0).astype(np.float32)
    h, w, _ = hm.shape
    full = np.zeros((h, w, n_reg), np.float32)
    inds = np.asarray(tgt["ind"])
    mask = np.asarray(tgt["mask"]).astype(bool)
    anno = np.asarray(tgt["anno_box"])
    for i in np.where(mask)[0]:
        full[inds[i] // w, inds[i] % w] = anno[i]
    return dict(
        heatmap=jnp.asarray(logits),
        reg=jnp.asarray(full[..., 0:2]),
        height=jnp.asarray(full[..., 2:3]),
        dim=jnp.asarray(full[..., 3:6]),
        rot=jnp.asarray(full[..., 6:8]),
    )


@pytest.mark.parametrize("h_flip,v_flip", [(True, False), (False, True)])
def test_flip_preds_back_inverts_world_flip(h_flip, v_flip):
    """TTA flip-back (reference `detectors/centerpoint.py:109-143`):
    encoding world-flipped boxes and mapping the maps back must
    reproduce the original encoding — heatmaps exactly, regression
    values at the peak cells."""
    from nerfdet_tpu.models.centerpoint import _flip_preds_back

    sym_range = (-8.0, -8.0, -3.0, 8.0, 8.0, 1.0)
    boxes = jnp.asarray([[1.3, 2.7, -1.0, 1.6, 3.9, 1.5, 0.7],
                         [-3.1, -0.9, -0.5, 0.8, 1.2, 1.7, -1.9]],
                        jnp.float32)
    labels = jnp.asarray([0, 0])
    kw = dict(task_classes=(1,), feature_map_size=(32, 32),
              point_cloud_range=sym_range, voxel_size=VOXEL,
              out_size_factor=2, max_objs=8)
    t0 = centerpoint_targets(boxes, labels, **kw)[0]

    fb = np.asarray(boxes).copy()
    if h_flip:  # y -> -y, yaw -> pi - yaw (transforms3d.RandomFlip3D)
        fb[:, 1] *= -1
        fb[:, 6] = -fb[:, 6] + np.pi
    if v_flip:  # x -> -x, yaw -> -yaw
        fb[:, 0] *= -1
        fb[:, 6] = -fb[:, 6]
    t1 = centerpoint_targets(jnp.asarray(fb), labels, **kw)[0]

    m0 = _maps_from_targets(t0)
    m1 = _flip_preds_back(_maps_from_targets(t1), h_flip, v_flip)

    np.testing.assert_allclose(np.asarray(m1["heatmap"]),
                               np.asarray(m0["heatmap"]), atol=1e-5)
    # regression values at the original peak cells
    w = m0["heatmap"].shape[1]
    inds = np.asarray(t0["ind"])[np.asarray(t0["mask"]).astype(bool)]
    for key in ("reg", "height", "dim", "rot"):
        a = np.asarray(m0[key])
        b = np.asarray(m1[key])
        for cell in inds:
            np.testing.assert_allclose(
                b[cell // w, cell % w], a[cell // w, cell % w],
                atol=1e-4, err_msg=key)


def test_merge_aug_detections_dedups_across_scales():
    from nerfdet_tpu.models.centerpoint import merge_aug_detections

    b = np.array([[0, 0, 0, 2, 2, 1, 0.0]], np.float32)
    r1 = (b, np.array([0.9], np.float32), np.array([1]))
    r2 = (b + 0.01, np.array([0.8], np.float32), np.array([1]))
    r3 = (b + 10.0, np.array([0.7], np.float32), np.array([0]))
    boxes, scores, labels = merge_aug_detections([r1, r2, r3],
                                                 nms_thr=0.2)
    assert len(boxes) == 2  # near-duplicate suppressed, classes kept
    assert set(labels.tolist()) == {0, 1}
    assert scores.max() == np.float32(0.9)


def test_dcn_head_forward_loss_grad():
    """DCNSeperateHead variant (reference `centerpoint_head.py:122-234`
    + the *_dcn_* configs): same train/detect surface, deformable
    feature adaptation inside each task head."""
    cfg = _cfg()
    cfg["bbox_head"]["seperate_head"] = dict(
        type="DCNSeperateHead",
        dcn_config=dict(type="DCN", in_channels=64, out_channels=64,
                        kernel_size=3, padding=1, groups=4),
        init_bias=-2.19, final_kernel=3)
    model, aux = build_centerpoint(cfg)
    assert model.bbox_head.separate_head_type == "DCNSeperateHead"
    rng = np.random.RandomState(1)
    pts = rng.uniform([0, -8, -3, 0], [16, 8, 1, 1],
                      (512, 4)).astype(np.float32)
    boxes, labels = _gt()

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), pts, train=False))()
    # the DCN offset convs exist and start at zero
    p = variables["params"]["bbox_head"]["task_0"]
    assert "feature_adapt_cls" in p and "feature_adapt_reg" in p
    assert float(jnp.abs(
        p["feature_adapt_cls"]["conv_offset"]["kernel"]).sum()) == 0.0

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            pts, train=True, mutable=["batch_stats"])
        tgts = centerpoint_targets_from_aux(boxes, labels, aux)
        losses = centerpoint_loss_from_aux(preds, tgts, aux)
        return losses["loss_heatmap"] + losses["loss_bbox"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    assert np.isfinite(float(loss))
    goff = float(jnp.abs(grads["bbox_head"]["task_0"][
        "feature_adapt_cls"]["conv_offset"]["kernel"]).sum())
    assert np.isfinite(goff) and goff > 0  # offsets receive gradient

    preds = jax.jit(lambda v: model.apply(v, pts, train=False))(variables)
    b, s, lab = centerpoint_detect(
        [{k: np.asarray(v) for k, v in p.items()} for p in preds], aux)
    assert b.shape[1] == 7 and len(s) == len(lab) == len(b)
