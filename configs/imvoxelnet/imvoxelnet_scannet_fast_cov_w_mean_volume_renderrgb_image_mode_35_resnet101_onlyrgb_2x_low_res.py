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
 'depth_supervise': False}

input_modality = {'use_depth': False}

train_pipeline_overrides = {'n_images': 50, 'img_scale': (320, 240), 'pad_size': (240, 320)}

test_pipeline_overrides = {'n_images': 101, 'img_scale': (320, 240), 'pad_size': (240, 320)}

data = dict(train=dict(times=6))
