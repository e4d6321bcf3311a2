"""H3DNet: primitive target semantics, cue matching targets, full
forward/loss, and the optimized decode tail."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_votenet import synthetic_cloud


def _box_cloud(rng, box, n_per_face=80):
    """Points sampled just inside all 6 faces of an axis-aligned box
    (strictly inside so the points_in_boxes instance assignment keeps
    every point)."""
    cx, cy, z0, dx, dy, dz = box[:6]
    pts = []
    for axis, sign in [(2, -1), (2, 1), (0, -1), (0, 1), (1, -1), (1, 1)]:
        u = rng.uniform(-0.45, 0.45, (n_per_face, 3))
        u[:, axis] = sign * rng.uniform(0.48, 0.499, n_per_face)
        pts.append(u * [dx, dy, dz] + [cx, cy, z0 + dz / 2])
    return np.concatenate(pts).astype(np.float32)


@pytest.fixture(scope="module")
def face_scene():
    rng = np.random.RandomState(0)
    box = np.array([1.0, -0.5, 0.2, 1.2, 0.8, 1.0, 0.0], np.float32)
    pts = _box_cloud(rng, box)
    gt_boxes = np.zeros((4, 7), np.float32)
    gt_boxes[0] = box
    gt_labels = np.zeros(4, np.int64)
    gt_labels[0] = 2
    gt_mask = np.zeros(4, bool)
    gt_mask[0] = True
    return pts, jnp.asarray(gt_boxes), jnp.asarray(gt_labels), \
        jnp.asarray(gt_mask), box


def test_primitive_targets_z(face_scene):
    from nerfdet_tpu.nn.primitive_head import primitive_targets

    pts, gt_boxes, gt_labels, gt_mask, box = face_scene
    mask, offset, sem = primitive_targets(
        jnp.asarray(pts), gt_boxes, gt_labels, gt_mask, "z", 18,
        num_point=20)
    mask, offset, sem = map(np.asarray, (mask, offset, sem))
    # bottom-face points (first 80) are assigned to the bottom surface
    bottom = slice(0, 80)
    assert mask[bottom].mean() > 0.8
    centers = pts[bottom] + offset[bottom]
    on = mask[bottom] > 0
    # surface center: box (cx, cy) and approx the face plane z
    assert np.allclose(centers[on, 0], box[0], atol=1e-5)
    assert np.allclose(centers[on, 1], box[1], atol=1e-5)
    assert abs(centers[on, 2].mean() - box[2]) < 0.1
    # semantic size = (dx, dy), class = 2
    assert np.allclose(sem[bottom][on, 3], box[3], atol=1e-5)
    assert np.allclose(sem[bottom][on, 4], box[4], atol=1e-5)
    assert np.all(sem[bottom][on, 5] == 2)
    # most side-face points don't match a horizontal surface (only the
    # band within dist_thresh of a face plane does, as in the reference)
    assert mask[160:480].mean() < 0.5


def test_primitive_targets_xy(face_scene):
    from nerfdet_tpu.nn.primitive_head import primitive_targets

    pts, gt_boxes, gt_labels, gt_mask, box = face_scene
    mask, offset, sem = primitive_targets(
        jnp.asarray(pts), gt_boxes, gt_labels, gt_mask, "xy", 18,
        num_point=20)
    mask, offset, sem = map(np.asarray, (mask, offset, sem))
    # left-face points (160:240, x = xmin) match a vertical surface;
    # points near the y extremes are later overwritten by the front/
    # back planes (reference assignment order), so check the interior
    left = slice(160, 240)
    assert mask[left].mean() > 0.8
    interior = np.abs(pts[left][:, 1] - box[1]) < 0.2 * box[4]
    on = (mask[left] > 0) & interior
    centers = pts[left] + offset[left]
    assert abs(centers[on, 0].mean() - (box[0] - box[3] / 2)) < 0.1
    # center z snaps to the box's gravity z
    assert np.allclose(centers[on, 2], box[2] + box[5] / 2, atol=1e-5)
    # semantic size = dz
    assert np.allclose(sem[left][on, 3], box[5], atol=1e-5)
    # horizontal-face points only match vertical surfaces within the
    # dist_thresh band of a vertical plane, never all of them
    assert mask[:160].mean() < 0.8


def test_primitive_targets_line(face_scene):
    from nerfdet_tpu.nn.primitive_head import primitive_targets

    pts, gt_boxes, gt_labels, gt_mask, box = face_scene
    mask, offset, sem = primitive_targets(
        jnp.asarray(pts), gt_boxes, gt_labels, gt_mask, "line", 18,
        num_point_line=3)
    mask, offset, sem = map(np.asarray, (mask, offset, sem))
    # bottom-face points near x = xmin are matched to that edge and
    # their center y snaps to the box cy
    bottom = pts[:80]
    near_edge = ((np.abs(bottom[:, 0] - (box[0] - box[3] / 2)) < 0.15)
                 & (np.abs(bottom[:, 1] - box[1]) < 0.2 * box[4]))
    hit = mask[:80][near_edge] > 0
    assert hit.mean() > 0.6
    centers = (bottom + offset[:80])[near_edge][hit]
    assert np.allclose(centers[:, 1], box[1], atol=1e-5)
    assert np.all(sem[:80][near_edge][hit][:, 3] == 2)


def test_surface_line_centers_geometry():
    from nerfdet_tpu.core.boxes import surface_line_centers

    box = np.array([[1.0, 2.0, 0.0, 2.0, 4.0, 6.0, 0.0]], np.float32)
    surf, line = surface_line_centers(box)
    assert surf.shape == (1, 6, 3) and line.shape == (1, 12, 3)
    # order: top, bottom, +y, -y, +x, -x (reference offsets table)
    np.testing.assert_allclose(surf[0, 0], [1, 2, 6], atol=1e-6)
    np.testing.assert_allclose(surf[0, 1], [1, 2, 0], atol=1e-6)
    np.testing.assert_allclose(surf[0, 4], [2, 2, 3], atol=1e-6)
    # first line: +x top edge
    np.testing.assert_allclose(line[0, 0], [2, 2, 6], atol=1e-6)
    # yawed box: centers rotate about +z through the gravity center
    box_r = box.copy()
    box_r[0, 6] = np.pi / 2
    surf_r, _ = surface_line_centers(box_r)
    # +x face center rotates to -y for positive yaw (the reference's
    # clockwise row-vector convention, depth_box3d.py:287-292)
    np.testing.assert_allclose(surf_r[0, 4], [1, 1, 3], atol=1e-5)


@pytest.fixture(scope="module")
def tiny_h3dnet():
    from nerfdet_tpu.models.h3dnet import H3DNet

    return H3DNet(
        num_classes=4, num_dir_bins=4,
        mean_sizes=tuple((1.0, 1.0, 0.9) for _ in range(4)),
        num_proposal=16, primitive_num_proposal=32, num_streams=2,
        backbone_cfg=dict(
            num_points=(64, 32, 16, 8), radii=(0.3, 0.6, 1.0, 1.5),
            num_samples=(8, 8, 8, 8),
            sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                         (32, 32, 64)),
            fp_channels=((64, 64), (64, 64))))


def test_h3dnet_forward_loss_decode(tiny_h3dnet):
    from nerfdet_tpu.data.pipeline import pad_gt
    from nerfdet_tpu.models.h3dnet import h3dnet_get_bboxes
    from nerfdet_tpu.models.votenet import votenet_nms

    model = tiny_h3dnet
    cloud, boxes, labels = synthetic_cloud(n_points=256)
    pts = jnp.asarray(cloud)
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    preds = model.apply(variables, pts, train=False)

    # every stage's keys are present with static shapes
    assert preds["matching_score"].shape == (18 * 16, 2)
    assert preds["center_optimized"].shape == (16, 3)
    assert preds["pred_z_center"].shape == (32, 3)

    gtb, gtl, gtm = pad_gt(boxes, labels, 4)
    losses = model.apply(variables, preds, pts, jnp.asarray(gtb),
                         jnp.asarray(gtl), jnp.asarray(gtm),
                         method=model.loss)
    assert len(losses) >= 30
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    b, o, s = h3dnet_get_bboxes(preds, model.bbox_coder)
    det = votenet_nms(np.asarray(b), np.asarray(o), np.asarray(s),
                      cloud[:, :3])
    assert det["boxes_3d"].shape[-1] == 7

    # seed sample mode (test path) also runs
    preds_seed = model.apply(variables, pts, train=False,
                             sample_mod="seed")
    assert preds_seed["center_optimized"].shape == (16, 3)


def test_h3dnet_builder():
    from nerfdet_tpu.models.builder import build_model

    cfg = dict(
        type="H3DNet",
        backbone=dict(
            num_streams=2,
            backbone_cfg=dict(
                num_points=(64, 32, 16, 8), radii=(0.3, 0.6, 1.0, 1.5),
                num_samples=(8, 8, 8, 8),
                sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                             (32, 32, 64)),
                fp_channels=((64, 64), (64, 64)))),
        rpn_head=dict(
            num_classes=4, num_proposal=16,
            bbox_coder=dict(num_dir_bins=4, with_rot=False,
                            mean_sizes=[[1.0, 1.0, 0.9]] * 4)))
    model = build_model(cfg)
    assert model.num_classes == 4
    assert model.bbox_coder.num_dir_bins == 4
