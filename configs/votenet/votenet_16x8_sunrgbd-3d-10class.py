# VoteNet on SUNRGBD (10-class, yawed boxes). Mirrors the reference
# `configs/votenet/votenet_16x8_sunrgbd-3d-10class.py` surface.
_base_ = [
    "../_base_/datasets/sunrgbd-3d-10class.py",
    "../_base_/schedules/schedule_3x.py",
]

model = dict(
    type="VoteNet",
    backbone_cfg=dict(
        in_channels=4,
        num_points=(2048, 1024, 512, 256),
        radii=(0.2, 0.4, 0.8, 1.2),
        num_samples=(64, 32, 16, 16),
        sa_channels=((64, 64, 128), (128, 128, 256), (128, 128, 256),
                     (128, 128, 256)),
        fp_channels=((256, 256), (256, 256))),
    bbox_head=dict(
        num_classes=10,
        num_proposal=256,
        bbox_coder=dict(
            type="PartialBinBasedBBoxCoder",
            num_sizes=10,
            num_dir_bins=12,
            with_rot=True,
            mean_sizes=[[2.114256, 1.620300, 0.927272],
                        [0.791118, 1.279516, 0.718182],
                        [0.923508, 1.867419, 0.845495],
                        [0.591958, 0.552978, 0.827272],
                        [0.699104, 0.454178, 0.75625],
                        [0.69519, 1.346299, 0.736364],
                        [0.528526, 1.002642, 1.172878],
                        [0.500618, 0.632163, 0.683424],
                        [0.404671, 1.071108, 1.688889],
                        [0.76584, 1.398258, 0.472728]])))

train_cfg = dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                 sample_mod="vote")
test_cfg = dict(sample_mod="seed", nms_thr=0.25, score_thr=0.05,
                per_class_proposal=True)
