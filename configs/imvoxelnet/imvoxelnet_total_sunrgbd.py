# Total-scene SUNRGBD (reference `imvoxelnet_total_sunrgbd.py`):
# 33 classes + the 2D LayoutHead predicting camera angles and the room
# layout box.
_base_ = ['./imvoxelnet_sunrgbd.py']

class_names = (
    'cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
    'bookshelf', 'picture', 'counter', 'blinds', 'desk', 'shelves',
    'curtain', 'dresser', 'pillow', 'mirror', 'clothes', 'books',
    'fridge', 'tv', 'paper', 'towel', 'shower_curtain', 'box',
    'whiteboard', 'person', 'night_stand', 'toilet', 'sink', 'lamp',
    'bathtub', 'bag')

model = dict(
    head_2d=dict(
        type='LayoutHead',
        n_channels=2048,
        linear_size=256,
        dropout=.0,
        loss_angle=dict(type='SmoothL1Loss', loss_weight=100.),
        loss_layout=dict(type='IoU3DLoss', loss_weight=1.)),
    bbox_head=dict(n_classes=33))

dataset_type = 'SunRgbdTotalMultiViewDataset'
data_root = 'data/sunrgbd/'
data = dict(
    train=dict(
        times=1,
        dataset=dict(
            type=dataset_type,
            ann_file=data_root + 'sunrgbd_total_infos_train.pkl')),
    val=dict(type=dataset_type,
             ann_file=data_root + 'sunrgbd_total_infos_val.pkl'),
    test=dict(type=dataset_type,
              ann_file=data_root + 'sunrgbd_total_infos_val.pkl'),
)
