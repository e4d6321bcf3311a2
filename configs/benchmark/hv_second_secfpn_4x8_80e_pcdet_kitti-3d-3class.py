# SECOND with the OpenPCDet training recipe, for cross-codebase
# benchmarking (reference
# `configs/benchmark/hv_second_secfpn_4x8_80e_pcdet_kitti-3d-3class.py`):
# pcdet voxel caps, uniform min-5-point gt-db filters with
# Car=20/Ped=15/Cyc=15 sample groups, cyclic 80-epoch schedule at
# lr 0.0003.
_base_ = ['../second/hv_second_secfpn_6x8_80e_kitti-3d-3class.py']

data_root = 'data/kitti/'
class_names = ['Pedestrian', 'Cyclist', 'Car']
db_sampler = dict(
    data_root=data_root,
    info_path=data_root + 'kitti_dbinfos_train.pkl',
    rate=1.0,
    prepare=dict(
        filter_by_difficulty=[-1],
        filter_by_min_points=dict(Car=5, Pedestrian=5, Cyclist=5)),
    classes=class_names,
    sample_groups=dict(Car=20, Pedestrian=15, Cyclist=15))

model = dict(
    voxel_layer=dict(max_num_points=5, max_voxels=(16000, 40000)))

lr = 0.0003
optimizer = dict(lr=lr)
total_epochs = 80

point_cloud_range = [0, -40, -3, 70.4, 40, 1]
# pcdet recipe: no ObjectNoise, name filter after the range filters
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='LoadAnnotations3D', with_bbox_3d=True,
         with_label_3d=True),
    dict(type='ObjectSample', db_sampler=db_sampler),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='GlobalRotScaleTrans',
         rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectNameFilter', classes=class_names),
    dict(type='PointShuffle'),
    dict(type='Collect3D',
         keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
data = dict(train=dict(pipeline=train_pipeline))
