# Outdoor ImVoxelNet on monocular KITTI (reference
# `configs/imvoxelnet/imvoxelnet_kitti.py` — whose `type='ImVoxelNet'`
# detector class the reference repo does NOT ship; runnable here via
# `models/imvoxelnet.py`).
point_cloud_range = [0, -39.68, -3, 69.12, 39.68, 1]
class_names = ['Car']

model = dict(
    type='ImVoxelNet',
    backbone=dict(
        type='ResNet',
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        style='pytorch'),
    neck=dict(
        type='FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=64,
        num_outs=4),
    neck_3d=dict(type='KittiImVoxelNeck', in_channels=64,
                 out_channels=256),
    bbox_head=dict(
        type='Anchor3DHead',
        num_classes=1,
        in_channels=256,
        feat_channels=256,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[0, -39.68, -1.78, 69.12 - .32, 39.68 - .32,
                     -1.78]],
            sizes=[[1.6, 3.9, 1.56]],
            rotations=[0, 1.57],
            reshape_out=True),
        diff_rad_by_sin=True,
        dir_offset=0.7854,
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder')),
    n_voxels=(216, 248, 12),
    voxel_size=(.32, .32, .32),
    # KittiSetOrigin: the point-cloud-range center
    volume_origin=(34.56, 0.0, -1.0),
    meta=dict(img_shape=(370, 1232), pad_shape=(384, 1248)))

train_cfg = dict(
    assigner=dict(
        type='MaxIoUAssigner',
        pos_iou_thr=0.6,
        neg_iou_thr=0.45,
        min_pos_iou=0.45,
        ignore_iof_thr=-1),
    allowed_border=0,
    pos_weight=-1,
    debug=False)
test_cfg = dict(
    use_rotate_nms=True,
    nms_across_levels=False,
    nms_thr=0.01,
    score_thr=0.1,
    min_bbox_size=0,
    nms_pre=100,
    max_num=50)

dataset_type = 'KittiMultiViewDataset'
data_root = 'data/kitti/'
input_modality = dict(use_lidar=False, use_camera=True)

train_pipeline = [
    dict(type='LoadAnnotations3D'),
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1280, 384), keep_ratio=True),
    dict(type='Pad', size_divisor=32),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Collect3D', keys=['img', 'gt_bboxes_3d', 'gt_labels_3d']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1280, 384), keep_ratio=True),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect3D', keys=['img']),
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=3,
    train=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_train.pkl',
        split='training', pipeline=train_pipeline,
        modality=input_modality, classes=class_names, test_mode=False),
    val=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_val.pkl',
        split='training', pipeline=test_pipeline,
        modality=input_modality, classes=class_names, test_mode=True),
    test=dict(
        type=dataset_type, data_root=data_root,
        ann_file=data_root + 'kitti_infos_val.pkl',
        split='training', pipeline=test_pipeline,
        modality=input_modality, classes=class_names, test_mode=True))

optimizer = dict(
    type='AdamW', lr=0.0001, weight_decay=0.0001,
    paramwise_cfg=dict(
        custom_keys={'backbone': dict(lr_mult=0.1, decay_mult=1.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=35., norm_type=2))
lr_config = dict(policy='step', step=[8, 11])
total_epochs = 12
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
evaluation = dict(interval=1)
