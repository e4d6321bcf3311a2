# Tiny PointPillars smoke config for the synthetic-KITTI fixture
# (CI / CPU). Model surface matches
# `configs/_base_/models/hv_pointpillars_secfpn_kitti.py` at reduced
# width; data points at `tools/create_data.py synthetic-kitti` output.
point_cloud_range = [0, -16, -3, 32, 16, 1]
voxel_size = [0.25, 0.25, 4]
class_names = ['Car']

model = dict(
    type='VoxelNet',
    voxel_layer=dict(
        max_num_points=16,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size,
        max_voxels=(2048, 2048)),
    voxel_encoder=dict(
        type='PillarFeatureNet',
        in_channels=4,
        feat_channels=[32],
        with_distance=False,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    middle_encoder=dict(
        type='PointPillarsScatter', in_channels=32,
        output_shape=[128, 128]),
    backbone=dict(
        type='SECOND',
        in_channels=32,
        layer_nums=[2, 2],
        layer_strides=[2, 2],
        out_channels=[32, 64]),
    neck=dict(
        type='SECONDFPN',
        in_channels=[32, 64],
        upsample_strides=[1, 2],
        out_channels=[64, 64]),
    bbox_head=dict(
        type='Anchor3DHead',
        num_classes=1,
        in_channels=128,
        feat_channels=128,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[0, -16.0, -1.78, 32.0, 16.0, -1.78]],
            sizes=[[1.6, 3.9, 1.56]],
            rotations=[0, 1.57],
            reshape_out=False)))

train_cfg = dict(
    assigner=dict(
        type='MaxIoUAssigner',
        pos_iou_thr=0.45, neg_iou_thr=0.3, min_pos_iou=0.3,
        ignore_iof_thr=-1),
    allowed_border=0, pos_weight=-1, debug=False)
test_cfg = dict(
    use_rotate_nms=True, nms_across_levels=False, nms_thr=0.01,
    score_thr=0.1, min_bbox_size=0, nms_pre=100, max_num=50)

dataset_type = 'KittiDataset'
data_root = '/tmp/syn_kitti/'
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
max_points = 4096
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=1,
    train=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_train.pkl',
        split='training', pipeline=train_pipeline,
        classes=class_names, test_mode=False, max_points=max_points),
    val=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_val.pkl',
        split='training', pipeline=test_pipeline,
        classes=class_names, test_mode=True, max_points=max_points),
    test=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_val.pkl',
        split='training', pipeline=test_pipeline,
        classes=class_names, test_mode=True, max_points=max_points))

optimizer = dict(type='AdamW', lr=0.003, betas=(0.95, 0.99),
                 weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(step=[6, 8])
total_epochs = 2
log_config = dict(interval=5)
checkpoint_config = dict(interval=1, max_keep_ckpts=-1)
evaluation = dict(interval=1)
