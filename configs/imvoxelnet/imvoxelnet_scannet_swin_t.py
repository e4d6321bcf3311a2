# ImVoxelNet with a Swin-T image backbone (reference
# `configs/imvoxelnet/imvoxelnet_scannet_fast_cov_w_mean_volume_renderrgb_image_mode_35_swintest.py`
# — same backbone/neck surface; the rendering branch stays off in the
# imvoxelnet mode).
_base_ = ['../nerfdet/_base_nerfdet.py']

model = dict(
    type='imvoxelnet',
    backbone=dict(
        _delete_=True,
        type='SwinTransformer',
        pretrain_img_size=224,
        embed_dims=96,
        patch_size=4,
        window_size=7,
        mlp_ratio=4,
        depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24],
        strides=(4, 2, 2, 2),
        out_indices=(0, 1, 2, 3),
        qkv_bias=True),
    neck=dict(in_channels=[96, 192, 384, 768]))

optimizer = dict(
    paramwise_cfg=dict(
        custom_keys={'backbone': dict(lr_mult=0.1, decay_mult=1.0)}))
