# Indoor ImVoxelNet on monocular SUNRGBD (reference
# `configs/imvoxelnet/imvoxelnet_sunrgbd.py`; runnable here via
# `models/imvoxelnet_indoor.py` + `data/sunrgbd_multiview.py`).
# Deviation: the reference's multiscale train Resize + random flips are
# replaced by the framework-wide fixed-shape transform stack.
_base_ = ['./imvoxelnet_scannet.py']

class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk',
               'dresser', 'night_stand', 'bookshelf', 'bathtub')

# nominal SUNRGBD capture resolution (per-scene sizes vary; the
# fixed-shape pipeline letterboxes to the static extent)
ori_shape = (530, 730)

model = dict(
    bbox_head=dict(
        _delete_=True,
        type='SunRgbdImVoxelHead',
        n_classes=10,
        n_channels=64,
        n_convs=0,
        n_reg_outs=7),
    meta=dict(ori_shape=(530, 730), img_shape=(480, 640),
              pad_shape=(480, 640)))

test_cfg = dict(nms_pre=1000, nms_thr=.15, use_rotate_nms=True,
                score_thr=.05)

dataset_type = 'SunRgbdMultiViewDataset'
data_root = 'data/sunrgbd/'

_mv_train = dict(
    type='MultiViewPipeline',
    n_images=1,
    transforms=[
        dict(type='LoadImageFromFile'),
        dict(type='Resize', img_scale=(640, 480), keep_ratio=True),
        dict(type='Normalize',
             mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size=(480, 640))],
    nerf_target_views=0)
_mv_test = dict(_mv_train, loading='stride')

train_pipeline = [
    dict(type='LoadAnnotations3D'),
    _mv_train,
    dict(type='DefaultFormatBundle3D', class_names=class_names),
    dict(type='Collect3D', keys=['img', 'gt_bboxes_3d', 'gt_labels_3d']),
]
test_pipeline = [
    _mv_test,
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         with_label=False),
    dict(type='Collect3D', keys=['img']),
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    train=dict(
        times=2,
        dataset=dict(
            type=dataset_type,
            data_root=data_root,
            ann_file=data_root + 'sunrgbd_imvoxelnet_infos_train.pkl',
            pipeline=train_pipeline,
            classes=class_names)),
    val=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'sunrgbd_imvoxelnet_infos_val.pkl',
        pipeline=test_pipeline,
        classes=class_names),
    test=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'sunrgbd_imvoxelnet_infos_val.pkl',
        pipeline=test_pipeline,
        classes=class_names),
)
