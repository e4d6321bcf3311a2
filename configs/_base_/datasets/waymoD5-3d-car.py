# Waymo (KITTI-format export, 1/5 subsampled) car-only dataset — key
# surface mirrors the reference
# `configs/_base_/datasets/waymoD5-3d-car.py`.
_base_ = './waymoD5-3d-3class.py'

class_names = ['Car']

data = dict(
    train=dict(classes=class_names),
    val=dict(classes=class_names),
    test=dict(classes=class_names))
