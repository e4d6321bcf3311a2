# CenterPoint voxel-0.075 with rotated NMS on nuScenes (reference
# `configs/centerpoint/centerpoint_0075voxel_second_secfpn_4x8_cyclic_20e_nus.py`).
_base_ = './centerpoint_0075voxel_second_secfpn_circlenms_4x8_cyclic_20e_nus.py'

model = dict(
    test_cfg=dict(pts=dict(nms_type='rotate', nms_thr=0.2)))
