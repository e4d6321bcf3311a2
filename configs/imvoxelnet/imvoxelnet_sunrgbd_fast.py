# Fast SUNRGBD variant (reference `imvoxelnet_sunrgbd_fast.py`):
# FastIndoorImVoxelNeck + the yawed V1 head.
_base_ = ['./imvoxelnet_sunrgbd.py']

model = dict(
    neck=dict(out_channels=256),
    neck_3d=dict(
        _delete_=True,
        type='FastIndoorImVoxelNeck',
        in_channels=256,
        out_channels=128,
        n_blocks=[1, 1, 1]),
    bbox_head=dict(n_channels=128),
    voxel_size=(.16, .16, .16),
    n_voxels=(40, 40, 16))
