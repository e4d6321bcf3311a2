# PointPillars + FPN, nuScenes 10-class (reference
# `configs/pointpillars/hv_pointpillars_fpn_sbn-all_4x8_2x_nus-3d.py`).
_base_ = ['../_base_/hv_pointpillars_fpn_nus.py']

point_cloud_range = [-50, -50, -5, 50, 50, 3]
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle',
    'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]

dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes/'
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10),
    dict(type='GlobalRotScaleTrans',
         rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05],
         translation_std=[0, 0, 0]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
]
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    train=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_train.pkl',
        pipeline=train_pipeline, classes=class_names,
        with_velocity=True, test_mode=False),
    val=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_val.pkl',
        pipeline=test_pipeline, classes=class_names,
        with_velocity=True, test_mode=True),
    test=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_val.pkl',
        pipeline=test_pipeline, classes=class_names,
        with_velocity=True, test_mode=True))

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(step=[20, 23])
total_epochs = 24
log_config = dict(interval=50)
checkpoint_config = dict(interval=1)
evaluation = dict(interval=24)
