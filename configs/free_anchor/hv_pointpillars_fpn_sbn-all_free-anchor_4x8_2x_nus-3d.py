# PointPillars + FPN + FreeAnchor, nuScenes (reference
# `configs/free_anchor/hv_pointpillars_fpn_sbn-all_free-anchor_4x8_2x_nus-3d.py`).
_base_ = ['../pointpillars/hv_pointpillars_fpn_sbn-all_4x8_2x_nus-3d.py']

model = dict(
    pts_bbox_head=dict(
        type='FreeAnchor3DHead',
        pre_anchor_topk=25,
        bbox_thr=0.5,
        gamma=2.0,
        alpha=0.5,
    ))
train_cfg = dict(
    pts=dict(code_weight=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.25,
                          0.25]))
