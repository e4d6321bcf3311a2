# Perspective-class SUNRGBD, fast variant (reference
# `imvoxelnet_perspective_sunrgbd_fast.py`): 30 classes,
# FastIndoorImVoxelNeck + the yawed V2 head.
_base_ = ['./imvoxelnet_perspective_sunrgbd.py']

model = dict(
    neck=dict(out_channels=256),
    neck_3d=dict(
        _delete_=True,
        type='FastIndoorImVoxelNeck',
        in_channels=256,
        out_channels=128,
        n_blocks=[1, 1, 1]),
    bbox_head=dict(
        _delete_=True,
        type='SunRgbdImVoxelHeadV2',
        n_classes=30,
        n_channels=128,
        n_reg_outs=7,
        n_scales=3,
        limit=27,
        centerness_topk=18),
    voxel_size=(.16, .16, .16),
    n_voxels=(40, 40, 16))

test_cfg = dict(nms_pre=1000, nms_thr=.15, use_rotate_nms=True,
                score_thr=.0)
