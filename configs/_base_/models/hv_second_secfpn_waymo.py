# SECOND (hard-voxelization, sparse-encoder middle) on Waymo.
# Key surface mirrors the reference
# `configs/_base_/models/hv_second_secfpn_waymo.py`.
voxel_size = [0.08, 0.08, 0.1]
point_cloud_range = [-76.8, -51.2, -2, 76.8, 51.2, 4]

model = dict(
    type='VoxelNet',
    voxel_layer=dict(
        max_num_points=10,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size,
        max_voxels=(80000, 90000)),
    voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    middle_encoder=dict(
        type='SparseEncoder',
        in_channels=5,
        sparse_shape=[61, 1280, 1920]),
    backbone=dict(
        type='SECOND',
        in_channels=384,
        layer_nums=[5, 5],
        layer_strides=[1, 2],
        out_channels=[128, 256]),
    neck=dict(
        type='SECONDFPN',
        in_channels=[128, 256],
        upsample_strides=[1, 2],
        out_channels=[256, 256]),
    bbox_head=dict(
        type='Anchor3DHead',
        num_classes=3,
        in_channels=512,
        feat_channels=512,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-76.8, -51.2, -0.0345, 76.8, 51.2, -0.0345],
                    [-76.8, -51.2, 0, 76.8, 51.2, 0],
                    [-76.8, -51.2, -0.1188, 76.8, 51.2, -0.1188]],
            sizes=[
                [2.08, 4.73, 1.77],  # car
                [0.84, 0.91, 1.74],  # pedestrian
                [0.84, 1.81, 1.77],  # cyclist
            ],
            rotations=[0, 1.57],
            reshape_out=False),
        diff_rad_by_sin=True,
        dir_offset=0.7854,  # pi/4
        dir_limit_offset=0,
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=7)))

train_cfg = dict(
    assigner=[
        dict(type='MaxIoUAssigner', pos_iou_thr=0.55, neg_iou_thr=0.4,
             min_pos_iou=0.4, ignore_iof_thr=-1),  # car
        dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.3,
             min_pos_iou=0.3, ignore_iof_thr=-1),  # pedestrian
        dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.3,
             min_pos_iou=0.3, ignore_iof_thr=-1),  # cyclist
    ],
    allowed_border=0,
    pos_weight=-1,
    debug=False)
test_cfg = dict(
    use_rotate_nms=True,
    nms_across_levels=False,
    nms_thr=0.25,
    score_thr=0.1,
    min_bbox_size=0,
    nms_pre=4096,
    max_num=500)
