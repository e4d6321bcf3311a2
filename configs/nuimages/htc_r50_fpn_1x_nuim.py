# reference configs/nuimages/htc_r50_fpn_1x_nuim.py:1-44 — adds the
# fused semantic branch (32 nuImages semantic classes) and the
# with_seg/SegRescale pipeline stages over the semantic maps the
# nuimages exporter writes.
_base_ = './htc_without_semantic_r50_fpn_1x_nuim.py'
model = dict(
    roi_head=dict(
        semantic_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=256, featmap_strides=[8]),
        semantic_head=dict(
            type='FusedSemanticHead', num_ins=5, fusion_level=1,
            num_convs=4, in_channels=256, conv_out_channels=256,
            num_classes=32, ignore_label=0, loss_weight=0.2)))
data = dict(
    train=dict(
        seg_prefix='data/nuimages/semantic_masks/',
        pipeline_overrides=dict(
            LoadAnnotations=dict(with_bbox=True, with_mask=True,
                                 with_seg=True),
            SegRescale=dict(scale_factor=0.125))))
