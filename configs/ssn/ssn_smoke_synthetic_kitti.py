# Tiny PointPillars + ShapeAwareHead (SSN) smoke config (CI / CPU).
# Head surface matches the reference
# `configs/ssn/hv_ssn_secfpn_sbn-all_2x16_2x_nus-3d.py` (per-class
# aligned anchors + shape-grouped conv towers) on the synthetic-KITTI
# fixture: 3 classes in 2 shape tasks.
_base_ = ['../pointpillars/pointpillars_smoke_synthetic_kitti.py']

point_cloud_range = [0, -16, -3, 32, 16, 1]
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    bbox_head=dict(
        _delete_=True,
        type='ShapeAwareHead',
        num_classes=3,
        in_channels=128,
        feat_channels=128,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGeneratorPerCls',
            ranges=[[0, -16.0, -0.6, 32.0, 16.0, -0.6],
                    [0, -16.0, -0.6, 32.0, 16.0, -0.6],
                    [0, -16.0, -1.78, 32.0, 16.0, -1.78]],
            sizes=[[0.6, 0.8, 1.73],
                   [0.6, 1.76, 1.73],
                   [1.6, 3.9, 1.56]],
            rotations=[0, 1.57],
            reshape_out=False),
        tasks=[
            dict(num_class=2,
                 class_names=['Pedestrian', 'Cyclist'],
                 shared_conv_channels=(32, 32),
                 shared_conv_strides=(1, 1)),
            dict(num_class=1,
                 class_names=['Car'],
                 shared_conv_channels=(32, 32),
                 shared_conv_strides=(2, 1)),
        ]))

train_cfg = dict(
    assigner=[
        dict(type='MaxIoUAssigner', pos_iou_thr=0.35,
             neg_iou_thr=0.2, min_pos_iou=0.2, ignore_iof_thr=-1),
        dict(type='MaxIoUAssigner', pos_iou_thr=0.35,
             neg_iou_thr=0.2, min_pos_iou=0.2, ignore_iof_thr=-1),
        dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
             neg_iou_thr=0.35, min_pos_iou=0.35, ignore_iof_thr=-1),
    ],
    allowed_border=0, pos_weight=-1, debug=False)

data = dict(
    train=dict(classes=class_names),
    val=dict(classes=class_names),
    test=dict(classes=class_names))
