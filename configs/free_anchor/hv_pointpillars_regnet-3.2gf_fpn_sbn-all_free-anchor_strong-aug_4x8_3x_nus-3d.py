# FreeAnchor RegNet-3.2GF with the strong augmentation recipe
# (reference `configs/free_anchor/hv_pointpillars_regnet-3.2gf_fpn_
# sbn-all_free-anchor_strong-aug_4x8_3x_nus-3d.py`).
_base_ = './hv_pointpillars_regnet-1.6gf_fpn_sbn-all_free-anchor_strong-aug_4x8_3x_nus-3d.py'

model = dict(
    pts_backbone=dict(
        arch=dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25,
                  bot_mul=1.0)),
    pts_neck=dict(in_channels=[192, 432, 1008]))
