# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'n_voxels': (48, 48, 16), 'near_far_range': [0.2, 10.0]}

data = dict(train=dict(times=12))
