"""SSN (ShapeAwareHead) inside the MVX shell (reference
`configs/ssn/hv_ssn_secfpn_sbn-all_2x16_2x_nus-3d.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfdet_tpu.models.mvx import build_mvx, mvx_loss

CFG = dict(
    type="MVXFasterRCNN",
    pts_voxel_layer=dict(
        max_num_points=8,
        point_cloud_range=[-16, -16, -5, 16, 16, 3],
        voxel_size=[0.5, 0.5, 8], max_voxels=(1024, 1024)),
    pts_voxel_encoder=dict(
        type="HardVFE", in_channels=4, feat_channels=[16],
        voxel_size=[0.5, 0.5, 8],
        point_cloud_range=[-16, -16, -5, 16, 16, 3]),
    pts_middle_encoder=dict(
        type="PointPillarsScatter", in_channels=16,
        output_shape=[64, 64]),
    pts_backbone=dict(
        type="SECOND", in_channels=16, layer_nums=[1, 1],
        layer_strides=[2, 2], out_channels=[16, 32]),
    pts_neck=dict(
        type="SECONDFPN", in_channels=[16, 32],
        upsample_strides=[1, 2], out_channels=[16, 16]),
    pts_bbox_head=dict(
        type="ShapeAwareHead", num_classes=3, in_channels=32,
        anchor_generator=dict(
            type="AlignedAnchor3DRangeGeneratorPerCls",
            ranges=[[-16, -16, -1.0, 16, 16, -1.0]] * 3,
            sizes=[[0.6, 0.8, 1.7], [0.7, 2.0, 1.4],
                   [1.9, 4.6, 1.7]],
            custom_values=[0, 0],
            rotations=[0, 1.57], reshape_out=False),
        tasks=[
            dict(num_class=2, shared_conv_channels=(8,),
                 shared_conv_strides=(1,)),
            dict(num_class=1, shared_conv_channels=(8,),
                 shared_conv_strides=(2,)),
        ],
        bbox_coder=dict(code_size=9)),
)
ASSIGNERS = [dict(pos_iou_thr=0.5, neg_iou_thr=0.3,
                  min_pos_iou=0.3)] * 3


def test_ssn_mvx_forward_and_loss():
    model, anchors = build_mvx(CFG)
    assert len(anchors) == 3  # per-class grids
    # tasks: 2 classes at 32x32, 1 class at 16x16, 2 rots, 9-code
    assert anchors[0].shape == (2 * 32 * 32, 9)
    assert anchors[2].shape == (2 * 16 * 16, 9)

    pts = np.random.RandomState(0).uniform(
        -15, 15, (512, 4)).astype(np.float32)
    variables = jax.jit(
        lambda k: model.init(k, jnp.asarray(pts), train=True))(
        jax.random.PRNGKey(0))
    outs, _ = model.apply(variables, jnp.asarray(pts), train=True,
                          mutable=["batch_stats"])
    n_total = sum(a.shape[0] for a in anchors)
    assert outs[0][0].shape == (n_total, 3)

    gt = np.zeros((4, 9), np.float32)
    gt[0] = [1, 2, -1.0, 1.9, 4.6, 1.7, 0.0, 0, 0]
    labels = np.full(4, -1, np.int64)
    labels[0] = 2
    losses = mvx_loss(
        outs, [jnp.asarray(a) for a in anchors], jnp.asarray(gt),
        jnp.maximum(jnp.asarray(labels), 0), jnp.asarray(labels) >= 0,
        num_classes=3, assigner=ASSIGNERS,
        head_cfg=dict(type="ShapeAwareHead"))
    assert int(losses["n_pos"]) >= 1
    for k in ("loss_cls", "loss_bbox", "loss_dir"):
        assert np.isfinite(float(losses[k])), k
