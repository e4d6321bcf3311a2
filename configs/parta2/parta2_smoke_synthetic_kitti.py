# Tiny Part-A2 smoke config on the synthetic KITTI fixture (CI /
# driver checks; toy-scale mirror of hv_PartA2_secfpn_*).
_base_ = ["./hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-3class.py"]

point_cloud_range = [0, -16, -3, 32, 16, 1.1]

model = dict(
    voxel_layer=dict(
        max_num_points=5,
        point_cloud_range=point_cloud_range,
        voxel_size=[0.5, 0.5, 0.1],
        max_voxels=2048),
    middle_encoder=dict(in_channels=4, sparse_shape=[41, 64, 64]),
    backbone=dict(in_channels=256, layer_nums=[2, 2],
                  layer_strides=[1, 2], out_channels=[64, 128]),
    neck=dict(in_channels=[64, 128], upsample_strides=[1, 2],
              out_channels=[64, 64]),
    rpn_head=dict(
        num_classes=3, in_channels=128, feat_channels=128,
        anchor_generator=dict(
            ranges=[[0, -16, -0.6, 32, 16, -0.6],
                    [0, -16, -0.6, 32, 16, -0.6],
                    [0, -16, -1.78, 32, 16, -1.78]],
            sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73],
                   [1.6, 3.9, 1.56]],
            rotations=[0, 1.57])))

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(max_points=2048),
    val=dict(max_points=2048),
    test=dict(max_points=2048))

total_epochs = 1

train_cfg = dict(
    rpn_proposal=dict(nms_pre=512, nms_post=128, max_num=128,
                      nms_thr=0.8, score_thr=0, use_rotate_nms=False),
    rcnn=dict(sampler=dict(type="IoUNegPiecewiseSampler", num=32,
                           pos_fraction=0.55,
                           neg_piece_fractions=[0.8, 0.2],
                           neg_iou_piece_thrs=[0.55, 0.1]),
              assigner_iou_thr=0.55, cls_pos_thr=0.75,
              cls_neg_thr=0.25))
