# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.1, 0.1, 0.24), 'n_voxels': (64, 64, 12)}

input_modality = {'use_depth': False}

train_pipeline_overrides = {'n_images': 20, 'nerf_target_views': 0}

test_pipeline_overrides = {'n_images': 50, 'nerf_target_views': 0}

optimizer = {'type': 'AdamW',
 'lr': 0.0001,
 'weight_decay': 0.0001,
 'paramwise_cfg': {'custom_keys': {'backbone': {'lr_mult': 0.1,
                                                'decay_mult': 1.0}}}}
