# Tiny PointPillars + FreeAnchor3DHead smoke config (CI / CPU).
# Head surface matches the reference
# `configs/free_anchor/hv_pointpillars_fpn_sbn-all_free-anchor_4x8_2x_nus-3d.py`
# (pre_anchor_topk/bbox_thr/gamma/alpha) on the synthetic-KITTI fixture.
_base_ = ['../pointpillars/pointpillars_smoke_synthetic_kitti.py']

model = dict(
    bbox_head=dict(
        type='FreeAnchor3DHead',
        pre_anchor_topk=25,
        bbox_thr=0.5,
        gamma=2.0,
        alpha=0.5,
    ))
