# MVXNet: dynamic-voxelization multi-modal (LiDAR + camera) detector
# on KITTI (reference
# `configs/mvxnet/dv_mvx-fpn_second_secfpn_adamw_2x8_80e_kitti-3d-3class.py`
# — same model surface; fusion decorates raw points before the dynamic
# VFE, see nn/point_fusion.py docstring).
voxel_size = [0.05, 0.05, 0.1]
point_cloud_range = [0, -40, -3, 70.4, 40, 1]
class_names = ['Pedestrian', 'Cyclist', 'Car']

model = dict(
    type='DynamicMVXFasterRCNN',
    img_backbone=dict(
        type='ResNet',
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3)),
    img_neck=dict(
        type='FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=4),
    pts_voxel_layer=dict(
        max_num_points=-1,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size,
        max_voxels=(-1, -1)),
    pts_voxel_encoder=dict(
        type='DynamicVFE',
        in_channels=4,
        feat_channels=[64, 64],
        with_distance=False,
        voxel_size=voxel_size,
        with_cluster_center=True,
        with_voxel_center=True,
        point_cloud_range=point_cloud_range,
        fusion_layer=dict(
            type='PointFusion',
            img_channels=256,
            pts_channels=64,
            mid_channels=128,
            out_channels=128,
            img_levels=[0, 1, 2, 3],
            activate_out=True,
            fuse_out=False)),
    pts_middle_encoder=dict(
        type='SparseEncoder',
        in_channels=128,
        sparse_shape=[41, 1600, 1408],
        order=('conv', 'norm', 'act')),
    pts_backbone=dict(
        type='SECOND',
        in_channels=256,
        layer_nums=[5, 5],
        layer_strides=[1, 2],
        out_channels=[128, 256]),
    pts_neck=dict(
        type='SECONDFPN',
        in_channels=[128, 256],
        upsample_strides=[1, 2],
        out_channels=[256, 256]),
    pts_bbox_head=dict(
        type='Anchor3DHead',
        num_classes=3,
        in_channels=512,
        feat_channels=512,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[
                [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                [0, -40.0, -1.78, 70.4, 40.0, -1.78],
            ],
            sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73],
                   [1.6, 3.9, 1.56]],
            rotations=[0, 1.57],
            reshape_out=False),
        assigner_per_size=True,
        diff_rad_by_sin=True,
        dir_offset=0.7854,
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=7)))

train_cfg = dict(
    pts=dict(
        assigner=[
            dict(type='MaxIoUAssigner', pos_iou_thr=0.35,
                 neg_iou_thr=0.2, min_pos_iou=0.2, ignore_iof_thr=-1),
            dict(type='MaxIoUAssigner', pos_iou_thr=0.35,
                 neg_iou_thr=0.2, min_pos_iou=0.2, ignore_iof_thr=-1),
            dict(type='MaxIoUAssigner', pos_iou_thr=0.6,
                 neg_iou_thr=0.45, min_pos_iou=0.45,
                 ignore_iof_thr=-1),
        ],
        allowed_border=0,
        pos_weight=-1,
        debug=False))
test_cfg = dict(
    pts=dict(use_rotate_nms=True, nms_across_levels=False,
             nms_thr=0.01, score_thr=0.1, min_bbox_size=0, nms_pre=100,
             max_num=50))

dataset_type = 'KittiDataset'
data_root = 'data/kitti/'
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
]
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_train.pkl',
        split='training', pipeline=train_pipeline,
        classes=class_names, test_mode=False),
    val=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_val.pkl',
        split='training', pipeline=test_pipeline,
        classes=class_names, test_mode=True),
    test=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_val.pkl',
        split='training', pipeline=test_pipeline,
        classes=class_names, test_mode=True))

optimizer = dict(type='AdamW', lr=0.003, betas=(0.95, 0.99),
                 weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(step=[67, 75])
total_epochs = 80
log_config = dict(interval=50)
checkpoint_config = dict(interval=1)
evaluation = dict(interval=1)
