# Fast indoor ImVoxelNet (reference `imvoxelnet_scannet_fast.py`):
# FastIndoorImVoxelNeck + V2 head at the coarser (40, 40, 16) volume.
_base_ = ['./imvoxelnet_scannet.py']

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
        type='ScanNetImVoxelHeadV2',
        loss_bbox=dict(type='AxisAlignedIoULoss', loss_weight=1.0),
        n_classes=18,
        n_channels=128,
        n_reg_outs=6,
        n_scales=3,
        limit=27,
        centerness_topk=18),
    voxel_size=(.16, .16, .16),
    n_voxels=(40, 40, 16))

test_cfg = dict(nms_pre=1000, iou_thr=.25, score_thr=.01)
