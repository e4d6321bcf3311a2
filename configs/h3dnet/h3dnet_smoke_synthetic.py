# Tiny H3DNet smoke config for the synthetic indoor points dataset.
_base_ = ["./h3dnet_8x3_scannet-3d-18class.py"]

model = dict(
    backbone=dict(
        num_streams=2,
        backbone_cfg=dict(
            num_points=(256, 128, 64, 32),
            radii=(0.3, 0.6, 1.0, 1.5),
            num_samples=(16, 16, 8, 8),
            sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64),
                         (32, 32, 64)),
            fp_channels=((64, 64), (64, 64)))),
    rpn_head=dict(num_proposal=32))

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=1,
    train=dict(type="RepeatDataset", times=1, dataset=dict(
        pipeline=[
            dict(type="LoadPointsFromFile", coord_type="DEPTH",
                 shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
            dict(type="IndoorPointSample", num_points=1024),
            dict(type="RandomFlip3D", sync_2d=False,
                 flip_ratio_bev_horizontal=0.5,
                 flip_ratio_bev_vertical=0.5),
            dict(type="GlobalRotScaleTrans",
                 rot_range=[-0.087266, 0.087266],
                 scale_ratio_range=[1.0, 1.0], shift_height=True),
        ])),
    val=dict(pipeline=[
        dict(type="LoadPointsFromFile", coord_type="DEPTH",
             shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
        dict(type="IndoorPointSample", num_points=1024),
    ]),
    test=dict(pipeline=[
        dict(type="LoadPointsFromFile", coord_type="DEPTH",
             shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
        dict(type="IndoorPointSample", num_points=1024),
    ]))

total_epochs = 1
