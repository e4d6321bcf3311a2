# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.16, 0.16, 0.2), 'depth_supervise': False}

input_modality = {'use_depth': False}

train_pipeline_overrides = {'loading': 'temporal'}

test_pipeline_overrides = {'n_images': 60, 'nerf_target_views': 10, 'loading': 'temporal'}

data = dict(train=dict(times=6))
