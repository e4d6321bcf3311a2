"""Indoor ImVoxelNet: Atlas neck torch parity, detector forward/loss,
SUNRGBD multiview dataset -> model end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------
# Atlas neck vs a torch replica of the reference EncoderDecoder
# (`mmdet3d/models/necks/imvoxelnet.py:70-92,297-372`)
# ----------------------------------------------------------------------

def _torch_atlas(channels, layers_down, layers_up, out_channels):
    import torch
    from torch import nn as tnn

    class Block(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = tnn.Conv3d(c, c, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm3d(c)
            self.conv2 = tnn.Conv3d(c, c, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm3d(c)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            return torch.relu(self.bn2(self.conv2(y)) + x)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.down_blocks = tnn.ModuleList()
            self.down_convs = tnn.ModuleList()
            self.down_norms = tnn.ModuleList()
            self.down_blocks.append(tnn.ModuleList(
                [Block(channels[0]) for _ in range(layers_down[0])]))
            for i in range(1, len(channels)):
                self.down_convs.append(tnn.Conv3d(
                    channels[i - 1], channels[i], 3, 2, 1, bias=False))
                self.down_norms.append(tnn.BatchNorm3d(channels[i]))
                self.down_blocks.append(tnn.ModuleList(
                    [Block(channels[i]) for _ in range(layers_down[i])]))
            rev = channels[::-1]
            self.up_convs = tnn.ModuleList()
            self.projs = tnn.ModuleList()
            self.proj_norms = tnn.ModuleList()
            self.up_blocks = tnn.ModuleList()
            for i in range(len(channels) - 1):
                self.up_convs.append(tnn.Conv3d(
                    rev[i], rev[i + 1], 1, bias=False))
                self.projs.append(tnn.Conv3d(
                    rev[i + 1], rev[i + 1], 1, bias=False))
                self.proj_norms.append(tnn.BatchNorm3d(rev[i + 1]))
                self.up_blocks.append(tnn.ModuleList(
                    [Block(rev[i + 1]) for _ in range(layers_up[i])]))
            self.out_convs = tnn.ModuleList()
            self.out_norms = tnn.ModuleList()
            for c in channels[:len(channels) - 1]:
                self.out_convs.append(tnn.Conv3d(c, out_channels, 3,
                                                 padding=1, bias=True))
                self.out_norms.append(tnn.BatchNorm3d(out_channels))

        def forward(self, x):
            import torch.nn.functional as F

            xs = []
            for b in self.down_blocks[0]:
                x = b(x)
            xs.append(x)
            for i in range(len(self.down_convs)):
                x = torch.relu(self.down_norms[i](self.down_convs[i](x)))
                for b in self.down_blocks[i + 1]:
                    x = b(x)
                xs.append(x)
            xs = xs[::-1]
            outs = []
            for i in range(len(self.up_convs)):
                x = F.interpolate(x, scale_factor=2, mode="trilinear",
                                  align_corners=False)
                x = self.up_convs[i](x)
                y = torch.relu(self.proj_norms[i](self.projs[i](
                    xs[i + 1])))
                x = (x + y) / 2
                for b in self.up_blocks[i]:
                    x = b(x)
                outs.append(x)
            outs = outs[::-1]
            return [torch.relu(self.out_norms[i](self.out_convs[i](o)))
                    for i, o in enumerate(outs)]

    return Net()


def _copy_conv(tconv, kernel):
    import torch

    tconv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2)).copy())


def _copy_bn(tbn, p, s):
    import torch

    tbn.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())


def test_atlas_neck_matches_torch_replica():
    import torch

    from nerfdet_tpu.nn.imvoxel_necks import ImVoxelNeck

    channels, down, up, out_c = (4, 8, 16), (1, 1, 1), (1, 1), 6
    m = ImVoxelNeck(channels=channels, out_channels=out_c,
                    down_layers=down, up_layers=up, conditional=False)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 4, 4).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize BN stats/affine so parity is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.2, 1.0, a.shape).astype(a.dtype))
        if a.dtype == jnp.float32 else a, variables)
    outs = m.apply(variables, jnp.asarray(x))

    t = _torch_atlas(list(channels), list(down), list(up), out_c)
    p = variables["params"]["model"]
    s = variables["batch_stats"]["model"]

    def blk(tb, pp, ss):
        _copy_conv(tb.conv1, pp["conv1"]["kernel"])
        _copy_bn(tb.bn1, pp["bn1"], ss["bn1"])
        _copy_conv(tb.conv2, pp["conv2"]["kernel"])
        _copy_bn(tb.bn2, pp["bn2"], ss["bn2"])

    blk(t.down_blocks[0][0], p["down_0_0"], s["down_0_0"])
    for i in (1, 2):
        _copy_conv(t.down_convs[i - 1], p[f"down_conv_{i}"]["kernel"])
        _copy_bn(t.down_norms[i - 1], p[f"down_norm_{i}"],
                 s[f"down_norm_{i}"])
        blk(t.down_blocks[i][0], p[f"down_{i}_0"], s[f"down_{i}_0"])
    for i in (0, 1):
        _copy_conv(t.up_convs[i], p[f"up_conv_{i}"]["kernel"])
        _copy_conv(t.projs[i], p[f"proj_{i}"]["conv"]["kernel"])
        _copy_bn(t.proj_norms[i], p[f"proj_{i}"]["norm"],
                 s[f"proj_{i}"]["norm"])
        blk(t.up_blocks[i][0], p[f"up_{i}_0"], s[f"up_{i}_0"])
    po = variables["params"]
    so = variables["batch_stats"]
    for i in (0, 1):
        _copy_conv(t.out_convs[i], po[f"out_conv_{i}"]["kernel"])
        t.out_convs[i].bias.data = torch.from_numpy(
            np.asarray(po[f"out_conv_{i}"]["bias"]).copy())
        _copy_bn(t.out_norms[i], po[f"out_norm_{i}"],
                 so[f"out_norm_{i}"])

    t.eval()
    with torch.no_grad():
        touts = t(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    for got, want in zip(outs, touts):
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)


# ----------------------------------------------------------------------
# detector forward / V1 losses / candidates
# ----------------------------------------------------------------------

def _tiny_model(head_type="ScanNetImVoxelHead", with_layout=False):
    from nerfdet_tpu.models.imvoxelnet_indoor import (IndoorImVoxelNet,
                                                      _Neck3DCfg)
    from nerfdet_tpu.models.nerfdet import SceneMeta

    return IndoorImVoxelNet(
        fpn_out_channels=4,
        neck3d=_Neck3DCfg(channels=(4, 8, 16), down_layers=(1, 1, 1),
                          up_layers=(1, 1), out_channels=6),
        head_type=head_type,
        n_classes=5,
        head_n_channels=6,
        head_n_reg_outs=7 if head_type.startswith("SunRgbd") else 6,
        regress_ranges=((-1.0, 0.75), (0.75, 1e8)),
        with_layout=with_layout,
        n_voxels=(8, 8, 4),
        voxel_size=(0.4, 0.4, 0.4),
        meta=SceneMeta(ori_shape=(64, 64), img_shape=(64, 64),
                       pad_shape=(64, 64)))


def _tiny_batch(rng, v=2):
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 48.0
    intr[0, 2], intr[1, 2] = 32.0, 32.0
    exts = []
    for i in range(v):
        e = np.eye(4, dtype=np.float32)
        e[2, 3] = 3.0 + 0.3 * i
        exts.append(e)
    return dict(
        imgs=jnp.asarray(rng.randn(v, 64, 64, 3).astype(np.float32)),
        intrinsic=jnp.asarray(intr),
        extrinsics=jnp.asarray(np.stack(exts)),
        origin=jnp.zeros((3,), jnp.float32),
    )


@pytest.mark.parametrize("head_type,yaw", [
    ("ScanNetImVoxelHead", False), ("SunRgbdImVoxelHead", True)])
def test_indoor_detector_forward_loss_grads(head_type, yaw):
    from nerfdet_tpu.nn.heads_v1 import (get_candidate_bboxes_v1,
                                         head_loss_v1)

    model = _tiny_model(head_type)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch))()
    outs, valid, layout = jax.jit(
        lambda v: model.apply(v, batch))(variables)
    assert layout is None
    assert len(outs) == 2  # two up scales
    assert outs[0][1].shape[-1] == (7 if yaw else 6)
    assert valid.shape == (8, 8, 4)

    gt = np.zeros((4, 7), np.float32)
    gt[:, :3] = rng.uniform(-1, 1, (4, 3))
    gt[:, 3:6] = rng.uniform(0.5, 1.5, (4, 3))
    gt[:, 6] = rng.uniform(-1, 1, 4) if yaw else 0.0
    labels = jnp.asarray(rng.randint(0, 5, 4))
    mask = jnp.asarray([True, True, True, False])
    pts = model.mlvl_points(batch["origin"])

    def loss_fn(params):
        o, v, _ = model.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]}, batch)
        terms = head_loss_v1(
            o, v, pts, model.regress_ranges, jnp.asarray(gt), labels,
            mask, n_classes=5, centerness_topk=18, yaw=yaw)
        return (terms["loss_centerness"] + terms["loss_bbox"]
                + terms["loss_cls"])

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    boxes, scores = get_candidate_bboxes_v1(
        outs, valid, pts, nms_pre=50, n_classes=5, yaw=yaw)
    assert boxes.shape[-1] == (7 if yaw else 6)
    assert boxes.shape[0] == scores.shape[0]
    assert np.all(np.isfinite(np.asarray(boxes)))


@pytest.mark.parametrize("head_type,yaw", [
    ("ScanNetImVoxelHeadV2", False), ("SunRgbdImVoxelHeadV2", True)])
def test_indoor_detector_v2_forward_loss_grads(head_type, yaw):
    """V2 heads through the shared heads.py loss/candidate path
    (reference `imvoxel_head_v2.py:304-441` for the yawed variant)."""
    from nerfdet_tpu.nn.heads import get_candidate_bboxes, head_loss

    model = _tiny_model(head_type)
    rng = np.random.RandomState(3)
    batch = _tiny_batch(rng)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch))()
    outs, valid, layout = jax.jit(
        lambda v: model.apply(v, batch))(variables)
    assert layout is None
    assert outs[0][1].shape[-1] == (7 if yaw else 6)

    gt = np.zeros((4, 7), np.float32)
    gt[:, :3] = rng.uniform(-1, 1, (4, 3))
    gt[:, 3:6] = rng.uniform(0.5, 1.5, (4, 3))
    gt[:, 6] = rng.uniform(-1, 1, 4) if yaw else 0.0
    labels = jnp.asarray(rng.randint(0, 5, 4))
    mask = jnp.asarray([True, True, True, False])
    pts = model.mlvl_points(batch["origin"])

    def loss_fn(params):
        o, v, _ = model.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]}, batch)
        terms = head_loss(
            o, v, pts, jnp.asarray(gt), labels, mask,
            n_scales=model.n_scales, limit=5, centerness_topk=9,
            n_classes=5, yaw=yaw)
        return (terms["loss_centerness"] + terms["loss_bbox"]
                + terms["loss_cls"])

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    boxes, scores = get_candidate_bboxes(
        outs, valid, pts, nms_pre=50, n_classes=5, yaw=yaw)
    assert boxes.shape[-1] == (7 if yaw else 6)
    assert boxes.shape[0] == scores.shape[0]
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_v2_yaw_targets_reduce_to_axis_aligned_at_zero_yaw():
    """get_targets(yaw=True) on yaw=0 boxes assigns exactly like the
    axis-aligned path (same labels/centerness; targets correspond)."""
    from nerfdet_tpu.core.boxes import gravity_center
    from nerfdet_tpu.nn.heads import corner_to_center_format, get_targets

    rng = np.random.RandomState(4)
    p0 = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    p1 = rng.uniform(-2, 2, (16, 3)).astype(np.float32)
    points = jnp.asarray(np.concatenate([p0, p1]))
    scale_ids = jnp.asarray([0] * 64 + [1] * 16, dtype=jnp.int32)
    gt = np.zeros((3, 7), np.float32)
    gt[:, :3] = rng.uniform(-1, 1, (3, 3))
    gt[:, 3:6] = rng.uniform(0.8, 2.0, (3, 3))
    gt_j = jnp.asarray(gt)
    labels = jnp.asarray([0, 1, 2])
    mask = jnp.asarray([True, True, True])

    c_a, box_a, lab_a = get_targets(
        points, scale_ids, gt_j, labels, mask, 2, 3, 4, yaw=False)
    c_y, box_y, lab_y = get_targets(
        points, scale_ids, gt_j, labels, mask, 2, 3, 4, yaw=True)
    np.testing.assert_array_equal(np.asarray(lab_a), np.asarray(lab_y))
    np.testing.assert_allclose(
        np.asarray(c_a), np.asarray(c_y), atol=1e-5)
    # yaw targets are the assigned gt (gravity-center); the axis-aligned
    # corner targets must describe the same box wherever assigned
    pos = np.asarray(lab_a) >= 0
    ctr_a = np.asarray(corner_to_center_format(box_a))[pos]
    by = np.asarray(box_y)[pos]
    np.testing.assert_allclose(ctr_a[:, :3], by[:, :3], atol=1e-4)
    np.testing.assert_allclose(ctr_a[:, 3:6], by[:, 3:6], atol=1e-4)
    # gravity-center z of the assigned gt
    gc = np.asarray(gravity_center(gt_j))
    assert np.all(np.isin(np.round(by[:, 2], 4), np.round(gc[:, 2], 4)))


def test_v2_yaw_targets_follow_box_rotation():
    """A point inside a rotated box's footprint (but outside its
    axis-aligned equivalent) is assigned only in yaw mode."""
    from nerfdet_tpu.nn.heads import get_targets

    # long thin box rotated 45deg; probe point along the rotated long
    # axis — the convention maps a yaw-t box's dx axis to
    # (cos t, -sin t) (see core.boxes.rotation_3d_in_axis)
    t = np.pi / 4
    gt = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 0.6, 1.0, t]])
    labels = jnp.asarray([2])
    mask = jnp.asarray([True])
    d = 1.2
    probe = np.array(
        [[d * np.cos(t), -d * np.sin(t), 0.5],   # on the long axis: in
         [d * np.cos(t), d * np.sin(t), 0.5]],   # mirrored: out
        np.float32)
    points = jnp.asarray(probe)
    scale_ids = jnp.zeros((2,), jnp.int32)

    _, _, lab_yaw = get_targets(
        points, scale_ids, gt, labels, mask, 1, 1, 1, yaw=True)
    assert int(lab_yaw[0]) == 2 and int(lab_yaw[1]) == -1

    _, _, lab_aa = get_targets(
        points, scale_ids, gt, labels, mask, 1, 1, 1, yaw=False)
    # without rotation the probe is outside the (4.0, 0.6) AA box
    assert int(lab_aa[0]) == -1


def test_total_layout_head_outputs():
    model = _tiny_model("SunRgbdImVoxelHead", with_layout=True)
    batch = _tiny_batch(np.random.RandomState(1))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch))()
    _, _, layout = jax.jit(
        lambda v: model.apply(v, batch))(variables)
    angles, layout_box = layout
    assert angles.shape == (2,) and layout_box.shape == (7,)


def test_rotated_iou_aligned_perfect_pred_zero_loss():
    """A perfect yaw prediction gives IoU 1 (loss 0)."""
    from nerfdet_tpu.ops.rotated_iou import rotated_iou_3d_aligned

    rng = np.random.RandomState(2)
    b = np.concatenate([
        rng.uniform(-1, 1, (8, 3)), rng.uniform(0.5, 2, (8, 3)),
        rng.uniform(-np.pi, np.pi, (8, 1))], axis=-1).astype(np.float32)
    iou = rotated_iou_3d_aligned(jnp.asarray(b), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(iou), 1.0, rtol=1e-4)


# ----------------------------------------------------------------------
# SUNRGBD multiview dataset -> detector
# ----------------------------------------------------------------------

def test_sunrgbd_multiview_dataset_feeds_model(tmp_path):
    from nerfdet_tpu.data.pipeline import MultiViewPipeline
    from nerfdet_tpu.data.sunrgbd_etl import (create_sunrgbd_infos,
                                              write_synthetic_sunrgbd_raw)
    from nerfdet_tpu.data.sunrgbd_multiview import SunRgbdMultiViewDataset

    root = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    write_synthetic_sunrgbd_raw(root, n_frames=2, seed=0)
    create_sunrgbd_infos(root, out_dir=out, num_points=500,
                         num_workers=1, seed=1)

    ds = SunRgbdMultiViewDataset(
        data_root=root,
        ann_file=f"{out}/sunrgbd_infos_train.pkl",
        pipeline=MultiViewPipeline(
            n_images=1, img_scale=(64, 64), pad_size=(64, 64),
            nerf_target_views=0))
    sample = ds[0]
    assert sample["imgs"].shape[0] == 1
    assert sample["extrinsics"].shape == (1, 4, 4)
    assert sample["intrinsic"].shape == (4, 4)
    np.testing.assert_allclose(sample["origin"], [0, 3, -1])
    assert sample["gt_boxes"].shape[-1] == 7

    model = _tiny_model("SunRgbdImVoxelHead")
    batch = {k: jnp.asarray(sample[k])
             for k in ("imgs", "intrinsic", "extrinsics", "origin")}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch))()
    outs, valid, _ = jax.jit(
        lambda v: model.apply(v, batch))(variables)
    assert np.all(np.isfinite(np.asarray(outs[0][1])))


def test_indoor_config_builds_and_dispatches():
    import os

    from nerfdet_tpu.config import Config
    from nerfdet_tpu.models.builder import build_model
    from nerfdet_tpu.models.imvoxelnet_indoor import IndoorImVoxelNet

    base = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "imvoxelnet")
    cfg = Config.fromfile(os.path.join(base, "imvoxelnet_scannet.py"))
    m = build_model(cfg.model)
    assert isinstance(m, IndoorImVoxelNet)
    assert m.neck3d.type == "ImVoxelNeck" and not m.yaw
    assert m.n_scales == 3

    cfg2 = Config.fromfile(
        os.path.join(base, "imvoxelnet_total_sunrgbd.py"))
    m2 = build_model(cfg2.model)
    assert m2.with_layout and m2.yaw and m2.n_classes == 33

    cfg3 = Config.fromfile(
        os.path.join(base, "imvoxelnet_scannet_top27.py"))
    m3 = build_model(cfg3.model)
    assert m3.head_centerness_topk == 28
