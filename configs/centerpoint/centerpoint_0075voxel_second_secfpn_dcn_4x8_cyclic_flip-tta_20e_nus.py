# CenterPoint voxel-0.075 + DCN heads with double-flip test-time
# augmentation (reference `configs/centerpoint/
#  centerpoint_0075voxel_second_secfpn_dcn_4x8_cyclic_flip-tta_20e_nus.py`).
# The MultiScaleFlipAug3D flip=True marker switches eval to
# `models.centerpoint.centerpoint_aug_forward` (4 BEV flip variants,
# logits averaged before decoding); the range filter runs at the top
# level of the fixed-shape pipeline.
_base_ = './centerpoint_0075voxel_second_secfpn_dcn_4x8_cyclic_20e_nus.py'

point_cloud_range = [-54, -54, -5.0, 54, 54, 3.0]

test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=9,
         pad_empty_sweeps=True, remove_close=True),
    dict(type='MultiScaleFlipAug3D', img_scale=(1333, 800),
         pts_scale_ratio=1, flip=True,
         pcd_horizontal_flip=True, pcd_vertical_flip=True,
         transforms=[
             dict(type='GlobalRotScaleTrans', rot_range=[0, 0],
                  scale_ratio_range=[1., 1.],
                  translation_std=[0, 0, 0]),
             dict(type='RandomFlip3D', sync_2d=False)]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Collect3D', keys=['points']),
]

data = dict(val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
