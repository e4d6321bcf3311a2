# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'voxel_size': (0.16, 0.16, 0.16), 'N_rand': 4096, 'squeeze_scale': 8}

train_pipeline_overrides = {'n_images': 40, 'nerf_target_views': 20}

lr_config = {'policy': 'step', 'step': [8, 16]}
