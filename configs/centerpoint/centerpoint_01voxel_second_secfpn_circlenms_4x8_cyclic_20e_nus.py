# CenterPoint voxel-0.1 with circle NMS on nuScenes (reference
# `configs/centerpoint/
#  centerpoint_01voxel_second_secfpn_circlenms_4x8_cyclic_20e_nus.py`).
_base_ = [
    '../_base_/models/centerpoint_01voxel_second_secfpn_nus.py',
    '../_base_/datasets/nus-3d.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]
total_epochs = 20
