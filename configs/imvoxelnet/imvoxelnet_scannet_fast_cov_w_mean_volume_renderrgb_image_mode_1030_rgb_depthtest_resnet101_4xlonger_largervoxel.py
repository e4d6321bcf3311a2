# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'backbone': {'type': 'ResNet',
              'depth': 101,
              'num_stages': 4,
              'out_indices': (0, 1, 2, 3),
              'frozen_stages': 1,
              'norm_cfg': {'type': 'BN', 'requires_grad': False},
              'norm_eval': True,
              'style': 'pytorch',
              '_delete_': True},
 'pretrained': 'torchvision://resnet101',
 'voxel_size': (0.16, 0.16, 0.2),
 'n_voxels': (56, 56, 16),
 'nerf_sample_view': 10}

train_pipeline_overrides = {'n_images': 20}

data = dict(train=dict(times=12))
