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
 'voxel_size': (0.16, 0.16, 0.16)}

input_modality = {'use_depth': False, 'use_ray': False}

train_pipeline_overrides = {'n_images': 18, 'nerf_target_views': 0}

test_pipeline_overrides = {'n_images': 50, 'nerf_target_views': 0}

data = dict(train=dict(times=6))

optimizer = {'type': 'AdamW',
 'lr': 0.0001,
 'weight_decay': 0.0001,
 'paramwise_cfg': {'custom_keys': {'backbone': {'lr_mult': 0.1,
                                                'decay_mult': 1.0}}}}
