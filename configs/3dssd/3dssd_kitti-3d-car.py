# 3DSSD on KITTI (Car). Mirrors the reference
# `configs/3dssd/3dssd_kitti-3d-car.py` + `_base_/models/3dssd.py`.
_base_ = ["../_base_/datasets/kitti-3d-car.py"]

point_cloud_range = [0, -40, -5, 70, 40, 3]

model = dict(
    type="SSD3DNet",
    backbone=dict(
        type="PointNet2SAMSG",
        in_channels=4,
        num_points=(4096, 512, (256, 256)),
        radii=((0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8)),
        num_samples=((32, 32, 64), (32, 32, 64), (32, 32, 32)),
        sa_channels=(((16, 16, 32), (16, 16, 32), (32, 32, 64)),
                     ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
                     ((128, 128, 256), (128, 192, 256),
                      (128, 256, 256))),
        aggregation_channels=(64, 128, 256),
        fps_mods=("D-FPS", "FS", ("F-FPS", "D-FPS")),
        fps_sample_range_lists=(-1, -1, (512, -1)),
        dilated_group=(True, True, True)),
    bbox_head=dict(
        type="SSD3DHead",
        num_classes=1,
        in_channels=256,
        vote_module_cfg=dict(
            in_channels=256, num_points=256, gt_per_seed=1,
            conv_channels=(128,), with_res_feat=False,
            vote_xyz_range=(3.0, 3.0, 2.0)),
        vote_aggregation_cfg=dict(
            type="PointSAModuleMSG", num_point=256, radii=(4.8, 6.4),
            sample_nums=(16, 32),
            mlp_channels=((256, 256, 256, 512),
                          (256, 256, 512, 1024))),
        pred_layer_cfg=dict(
            in_channels=1536, shared_conv_channels=(512, 128),
            cls_conv_channels=(128,), reg_conv_channels=(128,)),
        bbox_coder=dict(type="AnchorFreeBBoxCoder", num_dir_bins=12,
                        with_rot=True)))

train_cfg = dict(sample_mod="spec", pos_distance_thr=10.0,
                 expand_dims_length=0.05)
test_cfg = dict(nms_cfg=dict(type="nms", iou_thr=0.1),
                sample_mod="spec", score_thr=0.0,
                per_class_proposal=True, max_output_num=100)

lr = 0.002
optimizer = dict(type="AdamW", lr=lr, weight_decay=0)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup=None, step=[80, 120])
total_epochs = 150
