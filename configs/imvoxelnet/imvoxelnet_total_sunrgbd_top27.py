# Total-scene SUNRGBD top27 variant (reference
# `imvoxelnet_total_sunrgbd_top27.py`): V1 head with
# centerness_topk=28, tightened regress ranges, no score threshold.
_base_ = ['./imvoxelnet_total_sunrgbd.py']

model = dict(bbox_head=dict(
    centerness_topk=28,
    regress_ranges=((-1e8, .6), (.4, 1.1), (0.9, 1e8))))

test_cfg = dict(nms_pre=1000, nms_thr=.15, use_rotate_nms=True,
                score_thr=.0)
