"""V1 head: forward shapes, yaw decode round trip, target assignment."""

import jax
import jax.numpy as jnp
import numpy as np


def test_head_v1_forward_shapes():
    from nerfdet_tpu.nn.heads_v1 import ImVoxelHeadV1

    m = ImVoxelHeadV1(n_classes=10, n_channels=8, n_convs=1, n_reg_outs=7,
                      regress_ranges=((-1e8, 1.0), (1.0, 1e8)))
    xs = [jnp.zeros((1, 4, 4, 2, 8)), jnp.zeros((1, 2, 2, 1, 8))]
    v = m.init(jax.random.PRNGKey(0), xs)
    outs = m.apply(v, xs)
    assert len(outs) == 2
    c, b, s = outs[0]
    assert c.shape == (1, 4, 4, 2, 1)
    assert b.shape == (1, 4, 4, 2, 7)
    assert s.shape == (1, 4, 4, 2, 10)
    assert (np.asarray(b[..., :6]) > 0).all()  # exp-decoded distances


def test_yaw_decode_identity():
    """A point at the box center with symmetric distances decodes the
    original box, for any yaw."""
    from nerfdet_tpu.nn.heads_v1 import bbox_pred_to_bbox_yaw

    center = jnp.asarray([[1.0, 2.0, 0.5]])
    pred = jnp.asarray([[0.6, 0.6, 0.4, 0.4, 0.3, 0.3, 0.7]])
    box = bbox_pred_to_bbox_yaw(center, pred)
    assert np.allclose(np.asarray(box),
                       [[1.0, 2.0, 0.5, 1.2, 0.8, 0.6, 0.7]], atol=1e-6)


def test_get_targets_v1_assigns_inside_points():
    from nerfdet_tpu.nn.heads_v1 import get_targets_v1

    # one axis-aligned box; points inside/outside
    gt = np.zeros((2, 7), np.float32)
    gt[0] = [0, 0, 0, 2, 2, 2, 0]
    gt[1, :3] = 1e4  # padding
    gt_mask = np.array([True, False])
    labels = np.array([3, 0])
    points = jnp.asarray([[0.0, 0.0, 1.0],   # center
                          [5.0, 5.0, 1.0]])  # outside
    ranges = [(-1e8, 1e8)]
    c, b, l = get_targets_v1(points, jnp.zeros(2, jnp.int32),
                             ranges, jnp.asarray(gt),
                             jnp.asarray(labels), jnp.asarray(gt_mask),
                             n_classes=10, centerness_topk=4, yaw=True)
    assert int(l[0]) == 3 and int(l[1]) == 10  # bg
    assert float(c[0]) > 0.99  # perfect centerness at the center
    # reference yaw targets are gravity-centered (`imvoxel_head.py:363`)
    assert np.allclose(np.asarray(b[0]), [0, 0, 1, 2, 2, 2, 0], atol=1e-5)


def test_get_targets_v1_rotated_box():
    """A point inside a rotated box (but outside its AABB-frame local
    coords if rotation were ignored) must be assigned."""
    from nerfdet_tpu.nn.heads_v1 import get_targets_v1

    yaw = np.pi / 4
    gt = np.array([[0, 0, 0, 4.0, 0.5, 2, yaw]], np.float32)
    gt_mask = np.array([True])
    labels = np.array([1])
    # along the rotated long axis — the rotation convention maps a
    # yaw-t box's dx axis to (cos t, -sin t) (see rotation_3d_in_axis)
    p = np.array([[1.2 * np.cos(yaw), -1.2 * np.sin(yaw), 1.0]],
                 np.float32)
    c, b, l = get_targets_v1(jnp.asarray(p), jnp.zeros(1, jnp.int32),
                             [(-1e8, 1e8)], jnp.asarray(gt),
                             jnp.asarray(labels), jnp.asarray(gt_mask),
                             n_classes=10, centerness_topk=0, yaw=True)
    assert int(l[0]) == 1
    # same point with yaw ignored is outside the 0.5-wide box
    gt0 = gt.copy()
    gt0[0, 6] = 0
    c0, b0, l0 = get_targets_v1(jnp.asarray(p), jnp.zeros(1, jnp.int32),
                                [(-1e8, 1e8)], jnp.asarray(gt0),
                                jnp.asarray(labels), jnp.asarray(gt_mask),
                                n_classes=10, centerness_topk=0, yaw=True)
    assert int(l0[0]) == 10
