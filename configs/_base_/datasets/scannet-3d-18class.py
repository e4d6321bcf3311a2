# ScanNet point-cloud dataset (18-class indoor detection).
# Mirrors the reference `configs/_base_/datasets/scannet-3d-18class.py`
# key surface; consumed by `data.dataset.ScanNetPointsDataset`.
dataset_type = "ScanNetDataset"
data_root = "./data/scannet/"
class_names = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "showercurtrain", "toilet", "sink", "bathtub",
    "garbagebin")

train_pipeline = [
    dict(type="LoadPointsFromFile", coord_type="DEPTH",
         shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
    dict(type="IndoorPointSample", num_points=40000),
    dict(type="RandomFlip3D", sync_2d=False,
         flip_ratio_bev_horizontal=0.5, flip_ratio_bev_vertical=0.5),
    dict(type="GlobalRotScaleTrans", rot_range=[-0.087266, 0.087266],
         scale_ratio_range=[1.0, 1.0], shift_height=True),
]
test_pipeline = [
    dict(type="LoadPointsFromFile", coord_type="DEPTH",
         shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
    dict(type="IndoorPointSample", num_points=40000),
]

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=4,
    train=dict(
        type="RepeatDataset",
        times=5,
        dataset=dict(
            type=dataset_type,
            data_root=data_root,
            ann_file=data_root + "scannet_infos_train.pkl",
            pipeline=train_pipeline,
            filter_empty_gt=False,
            classes=class_names,
            box_type_3d="Depth")),
    val=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + "scannet_infos_val.pkl",
        pipeline=test_pipeline,
        classes=class_names,
        test_mode=True,
        box_type_3d="Depth"),
    test=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + "scannet_infos_val.pkl",
        pipeline=test_pipeline,
        classes=class_names,
        test_mode=True,
        box_type_3d="Depth"))
