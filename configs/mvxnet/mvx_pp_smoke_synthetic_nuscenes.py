# Tiny MVX(pts-only) PointPillars+FPN smoke config on the synthetic
# nuScenes fixture (CI / CPU): 9-dim boxes with velocity, 3-level FPN
# head, multi-sweep loading.
point_cloud_range = [-32, -32, -5, 32, 32, 3]
voxel_size = [0.5, 0.5, 8]
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle',
    'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]

model = dict(
    type='MVXFasterRCNN',
    pts_voxel_layer=dict(
        max_num_points=16,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size,
        max_voxels=(2048, 2048)),
    pts_voxel_encoder=dict(
        type='HardVFE',
        in_channels=4,
        feat_channels=[32],
        with_distance=False,
        voxel_size=voxel_size,
        with_cluster_center=True,
        with_voxel_center=True,
        point_cloud_range=point_cloud_range),
    pts_middle_encoder=dict(
        type='PointPillarsScatter', in_channels=32,
        output_shape=[128, 128]),
    pts_backbone=dict(
        type='SECOND',
        in_channels=32,
        layer_nums=[2, 2, 2],
        layer_strides=[2, 2, 2],
        out_channels=[32, 64, 128]),
    pts_neck=dict(
        type='FPN',
        in_channels=[32, 64, 128],
        out_channels=64,
        start_level=0,
        num_outs=3),
    pts_bbox_head=dict(
        type='Anchor3DHead',
        num_classes=10,
        in_channels=64,
        feat_channels=64,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-32, -32, -1.8, 32, 32, -1.8]],
            scales=[1, 2, 4],
            sizes=[[0.866, 2.5981, 1.], [0.5774, 1.7321, 1.],
                   [1., 1., 1.], [0.4, 0.4, 1]],
            custom_values=[0, 0],
            rotations=[0, 1.57],
            reshape_out=True),
        dir_offset=0.7854,
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=9)))

train_cfg = dict(
    pts=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.6,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      ignore_iof_thr=-1),
        pos_weight=-1))
test_cfg = dict(
    pts=dict(use_rotate_nms=True, nms_pre=100, nms_thr=0.2,
             score_thr=0.05, max_num=50))

dataset_type = 'NuScenesDataset'
data_root = '/tmp/syn_nusc/'
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=2, load_dim=5,
         use_dim=[0, 1, 2, 4]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=2, load_dim=5,
         use_dim=[0, 1, 2, 4]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
]
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=1,
    train=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_train.pkl',
        pipeline=train_pipeline, classes=class_names,
        with_velocity=True, test_mode=False, max_points=4096),
    val=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_val.pkl',
        pipeline=test_pipeline, classes=class_names,
        with_velocity=True, test_mode=True, max_points=4096),
    test=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_val.pkl',
        pipeline=test_pipeline, classes=class_names,
        with_velocity=True, test_mode=True, max_points=4096))

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(step=[6, 8])
total_epochs = 2
log_config = dict(interval=5)
checkpoint_config = dict(interval=1)
evaluation = dict(interval=1)
