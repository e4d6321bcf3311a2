# Base for the `imvoxelnet_scannet_fast_cov*` ablation family (56 reference
# configs). Upstream these are NeRF-Det's dev surface typed as
# `ImVoxelNet` — the reference ships the configs but no ImVoxelNet
# detector class, and nothing there consumes `volume_type`
# (`configs/imvoxelnet/imvoxelnet_scannet_fast_cov_w_mean_volume_renderrgb_image_mode_1028_rgb_depthtest.py:1-56`).
# Here they build and run: the builder routes nerf-keyed ImVoxelNet
# configs to the NeRF-Det graph (`models/builder.py`), and
# `volume_type` selects the fused statistic feeding the detection neck
# (mean / cov / cov_w_mean — see `models/nerfdet.py`).
#
# Values mirror the reference exemplar above: 480x640 images (n_images
# 30 train / 51 test), 0.2 m voxels, depth supervision on, RepeatDataset
# times=3.
_base_ = ['../nerfdet/_base_nerfdet.py']

model = dict(
    type='ImVoxelNet',
    voxel_size=(.2, .2, .2),
    depth_supervise=True,
    volume_type='cov_w_mean')

input_modality = dict(use_depth=True)

train_pipeline_overrides = dict(
    n_images=30, img_scale=(640, 480), pad_size=(480, 640))
test_pipeline_overrides = dict(
    n_images=51, img_scale=(640, 480), pad_size=(480, 640))

data = dict(train=dict(times=3))
checkpoint_config = dict(interval=1, max_keep_ckpts=1)
