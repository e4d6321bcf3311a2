# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.16, 0.16, 0.2), 'depth_supervise': False}

input_modality = {'use_depth': False}

train_pipeline_overrides = {'n_images': 50, 'img_scale': (320, 240), 'pad_size': (240, 320)}

test_pipeline_overrides = {'n_images': 101, 'img_scale': (320, 240), 'pad_size': (240, 320)}

data = dict(train=dict(times=12))
