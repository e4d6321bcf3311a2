# Perspective-class SUNRGBD top27 variant (reference
# `imvoxelnet_perspective_sunrgbd_top27.py`): V1 head with
# centerness_topk=28 and no score threshold.
_base_ = ['./imvoxelnet_perspective_sunrgbd.py']

model = dict(bbox_head=dict(centerness_topk=28))

test_cfg = dict(nms_pre=1000, nms_thr=.15, use_rotate_nms=True,
                score_thr=.0)
