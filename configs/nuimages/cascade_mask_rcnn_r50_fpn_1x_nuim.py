# reference configs/nuimages/cascade_mask_rcnn_r50_fpn_1x_nuim.py:1-60
# (the three cascade stages re-declared at num_classes=10; the _base_
# stage helper already parameterizes the per-stage target_stds)
_base_ = [
    '../_base_/models/cascade_mask_rcnn_r50_fpn.py',
    '../_base_/datasets/nuim_instance.py',
    '../_base_/schedules/mmdet_schedule_1x.py',
    '../_base_/default_runtime.py',
]


def _stage(stds):
    return dict(
        type='Shared2FCBBoxHead', in_channels=256, fc_out_channels=1024,
        roi_feat_size=7, num_classes=10,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0] * 4, target_stds=stds),
        reg_class_agnostic=True,
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0))


model = dict(
    roi_head=dict(
        bbox_head=[
            _stage([0.1, 0.1, 0.2, 0.2]),
            _stage([0.05, 0.05, 0.1, 0.1]),
            _stage([0.033, 0.033, 0.067, 0.067]),
        ],
        mask_head=dict(num_classes=10)))
