# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.16, 0.16, 0.16),
 'near_far_range': [0.5, 5.5],
 'N_rand': 4096,
 'depth_supervise': False,
 'squeeze_scale': 8}

input_modality = {'use_depth': False}

data = dict(train=dict(times=6))

total_epochs = 24

lr_config = {'policy': 'step', 'step': [8, 16]}

optimizer = {'type': 'AdamW',
 'lr': 0.0003,
 'weight_decay': 0.0001,
 'paramwise_cfg': {'custom_keys': {'backbone': {'lr_mult': 0.1,
                                                'decay_mult': 1.0}}}}
