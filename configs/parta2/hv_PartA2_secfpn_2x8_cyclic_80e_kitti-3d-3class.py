# Part-A2 on KITTI (3-class). Mirrors the reference
# `configs/parta2/hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-3class.py`.
_base_ = [
    "../_base_/datasets/kitti-3d-3class.py",
    "../_base_/schedules/cyclic_40e.py",
]

voxel_size = [0.05, 0.05, 0.1]
point_cloud_range = [0, -40, -3, 70.4, 40, 1]

model = dict(
    type="PartA2",
    voxel_layer=dict(
        max_num_points=5,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size,
        max_voxels=(16000, 40000)),
    voxel_encoder=dict(type="HardSimpleVFE"),
    middle_encoder=dict(
        type="SparseUNet",
        in_channels=4,
        sparse_shape=[41, 1600, 1408]),
    backbone=dict(
        type="SECOND",
        in_channels=256,
        layer_nums=[5, 5],
        layer_strides=[1, 2],
        out_channels=[128, 256]),
    neck=dict(
        type="SECONDFPN",
        in_channels=[128, 256],
        upsample_strides=[1, 2],
        out_channels=[256, 256]),
    rpn_head=dict(
        type="PartA2RPNHead",
        num_classes=3,
        in_channels=512,
        feat_channels=512,
        use_direction_classifier=True,
        anchor_generator=dict(
            type="Anchor3DRangeGenerator",
            ranges=[[0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -1.78, 70.4, 40.0, -1.78]],
            sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73],
                   [1.6, 3.9, 1.56]],
            rotations=[0, 1.57],
            reshape_out=False),
        diff_rad_by_sin=True,
        bbox_coder=dict(type="DeltaXYZWLHRBBoxCoder")),
    roi_head=dict(
        type="PartAggregationROIHead",
        num_classes=3,
        semantic_head=dict(
            type="PointwiseSemanticHead",
            in_channels=16,
            extra_width=0.2,
            seg_score_thr=0.3,
            num_classes=3),
        seg_roi_extractor=dict(
            type="Single3DRoIAwareExtractor",
            roi_layer=dict(type="RoIAwarePool3d", out_size=14,
                           mode="max")),
        part_roi_extractor=dict(
            type="Single3DRoIAwareExtractor",
            roi_layer=dict(type="RoIAwarePool3d", out_size=14,
                           mode="avg")),
        bbox_head=dict(
            type="PartA2BboxHead",
            num_classes=3,
            seg_in_channels=16,
            part_in_channels=4,
            seg_conv_channels=[64, 64],
            part_conv_channels=[64, 64],
            merge_conv_channels=[128, 128],
            down_conv_channels=[128, 256],
            shared_fc_channels=[256, 512, 512, 512],
            cls_channels=[256, 256],
            reg_channels=[256, 256],
            dropout_ratio=0.1,
            roi_feat_size=14,
            with_corner_loss=True)))

train_cfg = dict(
    rpn=dict(
        assigner=[
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
            dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)]),
    rpn_proposal=dict(nms_pre=9000, nms_post=512, max_num=512,
                      nms_thr=0.8, score_thr=0, use_rotate_nms=False),
    rcnn=dict(
        sampler=dict(
            type="IoUNegPiecewiseSampler", num=128, pos_fraction=0.55,
            neg_piece_fractions=[0.8, 0.2],
            neg_iou_piece_thrs=[0.55, 0.1], neg_pos_ub=-1,
            add_gt_as_proposals=False, return_iou=True),
        assigner_iou_thr=0.55,
        cls_pos_thr=0.75,
        cls_neg_thr=0.25))

test_cfg = dict(
    rpn=dict(nms_pre=1024, nms_post=100, max_num=100, nms_thr=0.7,
             score_thr=0, use_rotate_nms=True),
    rcnn=dict(use_rotate_nms=True, use_raw_score=True, nms_thr=0.01,
              score_thr=0.1))
