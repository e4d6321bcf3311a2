"""Golden tests for the KITTI eval protocol.

Fixture and expected values mirror the reference's own protocol test
(`/root/reference/tests/test_kitti_eval.py:8-230`) so the two
implementations are pinned to identical numbers. The reference test is
CUDA-gated; this one runs on CPU (the overlap kernels here are
vectorized numpy, not numba/CUDA).
"""

import numpy as np

from nerfdet_tpu.core.kitti_eval import (bev_box_overlap,
                                         camera_box3d_overlap, do_eval,
                                         eval_class, image_box_overlap,
                                         kitti_eval, kitti_eval_coco_style,
                                         rotated_rect_overlap)


def _gt_anno():
    return dict(
        name=np.array(['Pedestrian', 'Cyclist', 'Car', 'Car', 'Car',
                       'DontCare', 'DontCare']),
        truncated=np.array([0., 0., 0., -1., -1., -1., -1.]),
        occluded=np.array([0, 0, 3, -1, -1, -1, -1]),
        alpha=np.array([-1.57, 1.85, -1.65, -10., -10., -10., -10.]),
        bbox=np.array([[674.9179, 165.48549, 693.23694, 193.42134],
                       [676.21954, 165.70988, 691.63745, 193.83748],
                       [389.4093, 182.48041, 421.49072, 202.13422],
                       [232.0577, 186.16724, 301.94623, 217.4024],
                       [758.6537, 172.98509, 816.32434, 212.76743],
                       [532.37, 176.35, 542.68, 185.27],
                       [559.62, 175.83, 575.4, 183.15]]),
        dimensions=np.array([[12.34, 2.85, 2.63], [3.69, 1.67, 1.87],
                             [2.02, 1.86, 0.6], [-1., -1., -1.],
                             [-1., -1., -1.], [-1., -1., -1.],
                             [-1., -1., -1.]]),
        location=np.array([[4.700e-01, 1.490e+00, 6.944e+01],
                           [-1.653e+01, 2.390e+00, 5.849e+01],
                           [4.590e+00, 1.320e+00, 4.584e+01],
                           [-1.000e+03, -1.000e+03, -1.000e+03],
                           [-1.000e+03, -1.000e+03, -1.000e+03],
                           [-1.000e+03, -1.000e+03, -1.000e+03],
                           [-1.000e+03, -1.000e+03, -1.000e+03]]),
        rotation_y=np.array([-1.56, 1.57, -1.55, -10., -10., -10., -10.]))


def _dt_anno():
    return dict(
        name=np.array(['Pedestrian', 'Cyclist', 'Car', 'Car', 'Car']),
        truncated=np.array([0., 0., 0., 0., 0.]),
        occluded=np.array([0, 0, 0, 0, 0]),
        alpha=np.array([1.0744612, 1.2775835, 1.82563, 2.1145396,
                        -1.7676563]),
        bbox=np.array([[674.9179, 165.48549, 693.23694, 193.42134],
                       [676.21954, 165.70988, 691.63745, 193.83748],
                       [389.4093, 182.48041, 421.49072, 202.13422],
                       [232.0577, 186.16724, 301.94623, 217.4024],
                       [758.6537, 172.98509, 816.32434, 212.76743]]),
        dimensions=np.array([[1.4441837, 1.7450154, 0.53160036],
                             [1.6501029, 1.7540325, 0.5162356],
                             [3.9313498, 1.4899347, 1.5655756],
                             [4.0111866, 1.5350999, 1.585221],
                             [3.7337692, 1.5117968, 1.5515774]]),
        location=np.array([[4.6671643, 1.285098, 45.836895],
                           [4.658241, 1.3088846, 45.85148],
                           [-16.598526, 2.298814, 58.618088],
                           [-18.629122, 2.2990575, 39.305355],
                           [7.0964046, 1.5178275, 29.32426]]),
        rotation_y=np.array([1.174933, 1.3778262, 1.550529, 1.6742425,
                             -1.5330327]),
        score=np.array([0.18151495, 0.57920843, 0.27795696, 0.23100418,
                        0.21541929]))


def test_do_eval_golden():
    min_overlaps = np.array([[[0.5, 0.5, 0.7], [0.5, 0.5, 0.7],
                              [0.5, 0.5, 0.7]],
                             [[0.5, 0.5, 0.7], [0.25, 0.25, 0.5],
                              [0.25, 0.25, 0.5]]])
    mAP_bbox, mAP_bev, mAP_3d, mAP_aos = do_eval(
        [_gt_anno()], [_dt_anno()], [1, 2, 0], min_overlaps,
        ["bbox", "bev", "3d", "aos"])
    expected_mAP_bbox = np.array([[[0., 0.], [9.09090909, 9.09090909],
                                   [9.09090909, 9.09090909]]] * 3)
    expected_mAP_aos = np.array([[[0., 0.], [0.55020816, 0.55020816],
                                  [0.55020816, 0.55020816]],
                                 [[0., 0.], [8.36633862, 8.36633862],
                                  [8.36633862, 8.36633862]],
                                 [[0., 0.], [8.63476893, 8.63476893],
                                  [8.63476893, 8.63476893]]])
    np.testing.assert_allclose(mAP_bbox, expected_mAP_bbox, atol=1e-6)
    np.testing.assert_allclose(mAP_bev, np.zeros((3, 3, 2)), atol=1e-6)
    np.testing.assert_allclose(mAP_3d, np.zeros((3, 3, 2)), atol=1e-6)
    np.testing.assert_allclose(mAP_aos, expected_mAP_aos, atol=1e-6)


def test_kitti_eval_golden():
    result, ret_dict = kitti_eval([_gt_anno()], [_dt_anno()], [1, 2, 0])
    assert np.isclose(ret_dict['KITTI/Overall_2D_moderate'],
                      9.090909090909092)
    assert np.isclose(ret_dict['KITTI/Overall_2D_hard'], 9.090909090909092)
    assert 'Pedestrian AP@0.50, 0.50, 0.50:' in result


def test_eval_class_recall_golden():
    """2D-only eval_class (reference `test_eval_class` shape contract)."""
    min_overlaps = np.full((2, 3, 3), 0.5)
    ret = eval_class([_gt_anno()], [_dt_anno()], [1, 2, 0], [0, 1, 2],
                     0, min_overlaps, compute_aos=True)
    assert ret['recall'].shape == (3, 3, 2, 41)
    assert ret['precision'].shape == (3, 3, 2, 41)
    # moderate difficulty, pedestrian: exactly one TP among two
    # overlapping dets -> precision envelope starts at 1.0
    assert ret['precision'].max() <= 1.0 + 1e-9


def test_image_box_overlap_basic():
    a = np.array([[0., 0., 2., 2.]])
    b = np.array([[1., 1., 3., 3.], [0., 0., 2., 2.], [5., 5., 6., 6.]])
    iou = image_box_overlap(a, b)
    np.testing.assert_allclose(iou[0], [1. / 7., 1.0, 0.0], atol=1e-12)
    # criterion 0: intersection / area(first)
    np.testing.assert_allclose(
        image_box_overlap(a, b, 0)[0], [0.25, 1.0, 0.0], atol=1e-12)


def test_rotated_rect_overlap_axis_aligned():
    # axis-aligned rects must agree with the analytic result
    a = np.array([[0., 0., 2., 2., 0.]])
    b = np.array([[1., 0., 2., 2., 0.], [0., 0., 2., 2., 0.],
                  [10., 0., 2., 2., 0.]])
    iou = rotated_rect_overlap(a, b)
    np.testing.assert_allclose(iou[0], [2. / 6., 1.0, 0.0], atol=1e-9)


def test_rotated_rect_overlap_rotated():
    # 45-degree rotated unit square inside a big square: inter = 1
    a = np.array([[0., 0., np.sqrt(2.), np.sqrt(2.), np.pi / 4]])
    b = np.array([[0., 0., 4., 4., 0.]])
    inter = rotated_rect_overlap(a, b, criterion=2)
    np.testing.assert_allclose(inter[0, 0], 2.0, atol=1e-9)
    # identical rotated rects -> IoU 1
    c = np.array([[1., 2., 3., 1.5, 0.3]])
    np.testing.assert_allclose(
        rotated_rect_overlap(c, c)[0, 0], 1.0, atol=1e-9)


def test_camera_box3d_overlap_identity():
    box = np.array([[1., 1.5, 10., 4., 1.6, 1.8, 0.2]])
    np.testing.assert_allclose(
        camera_box3d_overlap(box, box)[0, 0], 1.0, atol=1e-9)
    # disjoint in height: y spans [y-h, y]
    other = box.copy()
    other[0, 1] -= 5.0
    np.testing.assert_allclose(
        camera_box3d_overlap(box, other)[0, 0], 0.0, atol=1e-12)


def test_bev_overlap_matches_3d_when_full_height():
    a = np.array([[0., 1., 5., 4., 2., 2., 0.]])
    b = np.array([[1., 1., 5., 4., 2., 2., 0.]])
    iou3d = camera_box3d_overlap(a, b)[0, 0]
    ioubev = bev_box_overlap(a[:, [0, 2, 3, 5, 6]],
                             b[:, [0, 2, 3, 5, 6]])[0, 0]
    np.testing.assert_allclose(iou3d, ioubev, atol=1e-9)


def test_coco_style_eval_runs():
    res = kitti_eval_coco_style([_gt_anno()], [_dt_anno()], [0, 1, 2])
    assert 'coco AP' in res
