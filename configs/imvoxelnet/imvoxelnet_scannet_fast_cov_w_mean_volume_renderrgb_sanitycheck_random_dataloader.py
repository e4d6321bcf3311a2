# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.16, 0.16, 0.16),
 'near_far_range': [0.5, 6],
 'N_rand': 4096,
 'pc_supervise': False,
 'squeeze_scale': 8,
 'nerf_density': False}

input_modality = {'use_depth': False}

train_pipeline_overrides = {'n_images': 40, 'nerf_target_views': 20}

# reference drops/changes RandomShiftOrigin: std=None

test_pipeline_overrides = {'n_images': 21}

data = dict(train=dict(times=10))

total_epochs = 100

lr_config = {'policy': 'step',
 'step': [8, 24, 40, 56, 72, 88, 104, 120, 136, 152, 168, 184]}

optimizer = {'type': 'AdamW',
 'lr': 0.001,
 'weight_decay': 0.0001,
 'paramwise_cfg': {'custom_keys': {'backbone': {'lr_mult': 0.1,
                                                'decay_mult': 1.0}}}}
