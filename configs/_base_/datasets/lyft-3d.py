# Lyft L5 3D dataset settings — key surface mirrors the reference
# `configs/_base_/datasets/lyft-3d.py`.
dataset_type = 'LyftDataset'
data_root = 'data/lyft/'
class_names = [
    'car', 'truck', 'bus', 'emergency_vehicle', 'other_vehicle',
    'motorcycle', 'bicycle', 'pedestrian', 'animal'
]
point_cloud_range = [-80, -80, -5, 80, 80, 3]
input_modality = dict(
    use_lidar=True, use_camera=False, use_radar=False, use_map=False,
    use_external=False)

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='GlobalRotScaleTrans',
         rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05],
         translation_std=[0, 0, 0]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='Collect3D', keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Collect3D', keys=['points']),
]

# static padded point capacity (TPU shapes)
max_points = 60000

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'lyft_infos_train.pkl',
        pipeline=train_pipeline,
        classes=class_names,
        modality=input_modality,
        test_mode=False,
        max_points=max_points,
        box_type_3d='LiDAR'),
    val=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'lyft_infos_val.pkl',
        pipeline=test_pipeline,
        classes=class_names,
        modality=input_modality,
        test_mode=True,
        max_points=max_points,
        box_type_3d='LiDAR'),
    test=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'lyft_infos_val.pkl',
        pipeline=test_pipeline,
        classes=class_names,
        modality=input_modality,
        test_mode=True,
        max_points=max_points,
        box_type_3d='LiDAR'))

evaluation = dict(interval=24)
