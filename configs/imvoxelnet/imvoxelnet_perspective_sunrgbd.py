# Perspective-class SUNRGBD (reference
# `imvoxelnet_perspective_sunrgbd.py`): 30 classes, eval at IoU 0.15.
_base_ = ['./imvoxelnet_sunrgbd.py']

class_names = (
    'recycle_bin', 'cpu', 'paper', 'toilet', 'stool', 'whiteboard',
    'coffee_table', 'picture', 'keyboard', 'dresser', 'painting',
    'bookshelf', 'night_stand', 'endtable', 'drawer', 'sink', 'monitor',
    'computer', 'cabinet', 'shelf', 'lamp', 'garbage_bin', 'box', 'bed',
    'sofa', 'sofa_chair', 'pillow', 'desk', 'table', 'chair')

model = dict(bbox_head=dict(n_classes=30))

dataset_type = 'SunRgbdPerspectiveMultiViewDataset'
data_root = 'data/sunrgbd/'
data = dict(
    train=dict(dataset=dict(
        type=dataset_type,
        ann_file=data_root + 'sunrgbd_perspective_infos_train.pkl')),
    val=dict(type=dataset_type,
             ann_file=data_root + 'sunrgbd_perspective_infos_val.pkl'),
    test=dict(type=dataset_type,
              ann_file=data_root + 'sunrgbd_perspective_infos_val.pkl'),
)
