# NeRF-Det-R101, 240x320, no depth supervision.
_base_ = './_base_nerfdet.py'
model = dict(
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101))
train_pipeline_overrides = dict(n_images=48)
