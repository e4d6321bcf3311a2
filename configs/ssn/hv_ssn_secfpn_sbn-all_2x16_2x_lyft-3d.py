# SSN (shape-aware grouping) PointPillars on Lyft at the 100 m range
# (reference `configs/ssn/hv_ssn_secfpn_sbn-all_2x16_2x_lyft-3d.py`:
# same class order, per-class aligned anchors, shape tasks).
_base_ = [
    '../_base_/models/hv_pointpillars_fpn_lyft.py',
    '../_base_/datasets/range100_lyft-3d.py',
    '../_base_/schedules/schedule_2x.py',
    '../_base_/default_runtime.py',
]

point_cloud_range = [-100, -100, -5, 100, 100, 3]
# class order must match the anchors' order
class_names = [
    'bicycle', 'motorcycle', 'pedestrian', 'animal', 'car',
    'emergency_vehicle', 'bus', 'other_vehicle', 'truck'
]

model = dict(
    pts_voxel_layer=dict(
        point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(
        feat_channels=[32, 64],
        point_cloud_range=point_cloud_range),
    pts_middle_encoder=dict(output_shape=[800, 800]),
    pts_neck=dict(
        _delete_=True,
        type='SECONDFPN',
        in_channels=[64, 128, 256],
        upsample_strides=[1, 2, 4],
        out_channels=[128, 128, 128]),
    pts_bbox_head=dict(
        _delete_=True,
        type='ShapeAwareHead',
        num_classes=9,
        in_channels=384,
        feat_channels=384,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGeneratorPerCls',
            ranges=[[-100, -100, -1.0709302, 100, 100, -1.0709302],
                    [-100, -100, -1.3220503, 100, 100, -1.3220503],
                    [-100, -100, -0.9122268, 100, 100, -0.9122268],
                    [-100, -100, -1.8012227, 100, 100, -1.8012227],
                    [-100, -100, -1.0715024, 100, 100, -1.0715024],
                    [-100, -100, -0.8871424, 100, 100, -0.8871424],
                    [-100, -100, -0.3519405, 100, 100, -0.3519405],
                    [-100, -100, -0.6276341, 100, 100, -0.6276341],
                    [-100, -100, -0.3033737, 100, 100, -0.3033737]],
            sizes=[
                [0.63, 1.76, 1.44],  # bicycle
                [0.96, 2.35, 1.59],  # motorcycle
                [0.76, 0.80, 1.76],  # pedestrian
                [0.35, 0.73, 0.50],  # animal
                [1.92, 4.75, 1.71],  # car
                [2.42, 6.52, 2.34],  # emergency vehicle
                [2.92, 12.70, 3.42],  # bus
                [2.75, 8.17, 3.20],  # other vehicle
                [2.84, 10.24, 3.44],  # truck
            ],
            custom_values=[],
            rotations=[0, 1.57],
            reshape_out=False),
        tasks=[
            dict(num_class=2, class_names=['bicycle', 'motorcycle'],
                 shared_conv_channels=(64, 64),
                 shared_conv_strides=(1, 1)),
            dict(num_class=2, class_names=['pedestrian', 'animal'],
                 shared_conv_channels=(64, 64),
                 shared_conv_strides=(1, 1)),
            dict(num_class=2,
                 class_names=['car', 'emergency_vehicle'],
                 shared_conv_channels=(64, 64, 64),
                 shared_conv_strides=(2, 1, 1)),
            dict(num_class=3,
                 class_names=['bus', 'other_vehicle', 'truck'],
                 shared_conv_channels=(64, 64, 64),
                 shared_conv_strides=(2, 1, 1)),
        ],
        assign_per_class=True,
        diff_rad_by_sin=True,
        dir_offset=0.7854,  # pi/4
        dir_limit_offset=0,
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=7)))

train_cfg = dict(
    _delete_=True,
    pts=dict(
        assigner=[
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # bicycle
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # motorcycle
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # pedestrian
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # animal
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # car
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # emergency vehicle
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # bus
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # other vehicle
            dict(type='MaxIoUAssigner', pos_iou_thr=0.55,
                 neg_iou_thr=0.4, min_pos_iou=0.4,
                 ignore_iof_thr=-1),  # truck
        ],
        allowed_border=0,
        code_weight=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        pos_weight=-1,
        debug=False))

data = dict(
    train=dict(classes=class_names),
    val=dict(classes=class_names),
    test=dict(classes=class_names))
