# NeRF-Det-R101*, 240x320, with depth supervision (mAP@25 52.6 / mAP@50 29.8).
_base_ = './nerfdet_res50_2x_low_res_depth_sp.py'
model = dict(
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101))
train_pipeline_overrides = dict(n_images=48)
