# nuImages 2D instance-segmentation data surface (reference
# configs/_base_/datasets/nuim_instance.py:1-59), consuming the
# SDK-free COCO export of `nerfdet_tpu/data/nuimages_etl.py`
# (`tools/create_data.py nuimages`).

dataset_type = 'CocoDataset'
data_root = 'data/nuimages/'
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle', 'bicycle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=[(1280, 720), (1920, 1080)],
         multiscale_mode='range', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect',
         keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(1600, 900), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='Pad', size_divisor=32),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ])
]


def _split(ann, pipeline):
    return dict(type=dataset_type, data_root=data_root,
                ann_file=data_root + ann, img_prefix=data_root,
                classes=class_names, pipeline=pipeline)


data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=_split('annotations/nuimages_v1.0-train.json', train_pipeline),
    val=_split('annotations/nuimages_v1.0-val.json', test_pipeline),
    test=_split('annotations/nuimages_v1.0-val.json', test_pipeline))
evaluation = dict(metric=['bbox', 'segm'])
