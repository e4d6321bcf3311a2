# Smoke-test config: tiny indoor ImVoxelNet (Atlas neck + V1 head) on
# the generated synthetic dataset (tools/create_data.py synthetic).
_base_ = ['../nerfdet/nerfdet_smoke_synthetic.py']

model = dict(
    _delete_=True,
    type='ImVoxelNet',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=False),
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=8, num_outs=4),
    neck_3d=dict(
        type='ImVoxelNeck',
        channels=[8, 16, 32],
        out_channels=8,
        down_layers=[1, 1, 1],
        up_layers=[1, 1],
        conditional=False),
    bbox_head=dict(
        type='ScanNetImVoxelHead',
        loss_bbox=dict(type='AxisAlignedIoULoss', loss_weight=1.0),
        n_classes=18,
        n_channels=8,
        n_convs=0,
        n_reg_outs=6),
    voxel_size=(.8, .8, .8),
    n_voxels=(8, 8, 4))

train_cfg = dict()
test_cfg = dict(nms_pre=200, iou_thr=.15, score_thr=.0)
input_modality = dict(use_image=True, use_depth=False, use_lidar=False,
                      use_neuralrecon_depth=False, use_ray=False)
