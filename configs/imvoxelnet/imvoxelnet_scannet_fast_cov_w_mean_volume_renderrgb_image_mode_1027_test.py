# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.16, 0.16, 0.16),
 'near_far_range': [0.5, 6.0],
 'depth_supervise': False,
 'squeeze_scale': 8,
 'nerf_density': False}

input_modality = {'use_depth': False}

train_pipeline_overrides = {'n_images': 40, 'nerf_target_views': 20}

test_pipeline_overrides = {'n_images': 40, 'nerf_target_views': 20}

data = dict(train=dict(times=500))

lr_config = {'policy': 'step', 'step': [8, 16]}
