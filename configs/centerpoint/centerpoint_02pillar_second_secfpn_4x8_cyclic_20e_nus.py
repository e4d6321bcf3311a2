# CenterPoint pillar-0.2 with rotated NMS on nuScenes (reference
# `configs/centerpoint/centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py`).
_base_ = [
    '../_base_/models/centerpoint_02pillar_second_secfpn_nus.py',
    '../_base_/datasets/nus-3d.py',
    '../_base_/schedules/cyclic_20e.py',
    '../_base_/default_runtime.py',
]
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]
data = dict(
    train=dict(classes=class_names),
    val=dict(classes=class_names),
    test=dict(classes=class_names))
