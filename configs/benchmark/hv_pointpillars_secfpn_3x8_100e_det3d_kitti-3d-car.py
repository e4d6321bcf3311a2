# PointPillars (car) with the Det3D training recipe, for
# cross-codebase benchmarking (reference `configs/benchmark/
#  hv_pointpillars_secfpn_3x8_100e_det3d_kitti-3d-car.py`):
# det3d voxel caps (64 pts/voxel, 12k/20k voxels), Car=15 gt-db
# sampling, cyclic 50-epoch schedule at lr 0.001.
_base_ = ['../pointpillars/hv_pointpillars_secfpn_6x8_160e_kitti-3d-car.py']

data_root = 'data/kitti/'
class_names = ['Car']
db_sampler = dict(
    data_root=data_root,
    info_path=data_root + 'kitti_dbinfos_train.pkl',
    rate=1.0,
    prepare=dict(filter_by_difficulty=[-1],
                 filter_by_min_points=dict(Car=5)),
    classes=class_names,
    sample_groups=dict(Car=15))

model = dict(
    voxel_layer=dict(max_num_points=64, max_voxels=(12000, 20000)))

lr = 0.001
optimizer = dict(lr=lr)
total_epochs = 50

point_cloud_range = [0, -40, -3, 70.4, 40, 1]
# det3d recipe: tighter ObjectNoise (0.25 m jitter, ±0.157 rad)
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='LoadAnnotations3D', with_bbox_3d=True,
         with_label_3d=True),
    dict(type='ObjectSample', db_sampler=db_sampler),
    dict(type='ObjectNoise', num_try=100,
         translation_std=[0.25, 0.25, 0.25], global_rot_range=[0.0, 0.0],
         rot_range=[-0.15707963267, 0.15707963267]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='GlobalRotScaleTrans',
         rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='Collect3D',
         keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
data = dict(train=dict(pipeline=train_pipeline))
