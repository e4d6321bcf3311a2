# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.16, 0.16, 0.16),
 'near_far_range': [0.5, 6],
 'N_rand': 4096,
 'squeeze_scale': 8}

train_pipeline_overrides = {'n_images': 40, 'nerf_target_views': 20, 'loading': 'temporal'}

test_pipeline_overrides = {'loading': 'temporal'}

optimizer = {'type': 'AdamW',
 'lr': 0.0001,
 'weight_decay': 0.0001,
 'paramwise_cfg': {'custom_keys': {'backbone': {'lr_mult': 0.1,
                                                'decay_mult': 1.0}}}}
