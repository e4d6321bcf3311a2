# SUNRGBD point-cloud dataset (10-class indoor detection).
# Mirrors the reference `configs/_base_/datasets/sunrgbd-3d-10class.py`.
dataset_type = "SUNRGBDDataset"
data_root = "./data/sunrgbd/"
class_names = ("bed", "table", "sofa", "chair", "toilet", "desk",
               "dresser", "night_stand", "bookshelf", "bathtub")

train_pipeline = [
    dict(type="LoadPointsFromFile", coord_type="DEPTH",
         shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
    dict(type="RandomFlip3D", sync_2d=False,
         flip_ratio_bev_horizontal=0.5),
    dict(type="GlobalRotScaleTrans", rot_range=[-0.523599, 0.523599],
         scale_ratio_range=[0.85, 1.15], shift_height=True),
    dict(type="IndoorPointSample", num_points=20000),
]
test_pipeline = [
    dict(type="LoadPointsFromFile", coord_type="DEPTH",
         shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
    dict(type="IndoorPointSample", num_points=20000),
]

data = dict(
    samples_per_gpu=16,
    workers_per_gpu=4,
    train=dict(
        type="RepeatDataset",
        times=5,
        dataset=dict(
            type=dataset_type,
            data_root=data_root,
            ann_file=data_root + "sunrgbd_infos_train.pkl",
            pipeline=train_pipeline,
            classes=class_names,
            filter_empty_gt=False,
            box_type_3d="Depth")),
    val=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + "sunrgbd_infos_val.pkl",
        pipeline=test_pipeline,
        classes=class_names,
        test_mode=True,
        box_type_3d="Depth"),
    test=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + "sunrgbd_infos_val.pkl",
        pipeline=test_pipeline,
        classes=class_names,
        test_mode=True,
        box_type_3d="Depth"))
