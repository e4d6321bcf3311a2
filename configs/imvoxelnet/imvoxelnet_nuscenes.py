# Outdoor ImVoxelNet on surround-camera nuScenes, car-only (reference
# `configs/imvoxelnet/imvoxelnet_nuscenes.py` — whose detector class
# the reference repo does NOT ship; runnable here via
# `models/imvoxelnet.py`). DCN stages of the reference backbone are
# replaced by plain convs (no deformable conv on TPU; documented
# deviation).
_base_ = './imvoxelnet_kitti.py'

point_cloud_range = [-49.92, -49.92, -3, 49.92, 49.92, 1]
class_names = ['car']

model = dict(
    neck_3d=dict(type='NuScenesImVoxelNeck', in_channels=64,
                 out_channels=256),
    bbox_head=dict(
        anchor_generator=dict(
            _delete_=True,
            type='Anchor3DRangeGenerator',
            ranges=[[-49.92, -49.92, -1.0, 49.92 - .32 * 2,
                     49.92 - .32 * 2, -1.0]],
            sizes=[[1.98, 4.67, 1.74]],
            rotations=[0, 1.57],
            reshape_out=True)),
    n_voxels=(312, 312, 12),
    voxel_size=(.32, .32, .32),
    volume_origin=(0.0, 0.0, -1.0),
    meta=dict(img_shape=(900, 1600), pad_shape=(928, 1600)))

train_cfg = dict(
    assigner=dict(
        type='MaxIoUAssigner',
        pos_iou_thr=0.6,
        neg_iou_thr=0.3,
        min_pos_iou=0.3,
        ignore_iof_thr=-1))

dataset_type = 'NuScenesMultiViewDataset'
data_root = 'data/nuscenes/'

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'nuscenes_infos_train.pkl',
               classes=class_names),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'nuscenes_infos_val.pkl',
             classes=class_names),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'nuscenes_infos_val.pkl',
              classes=class_names))
