# reference configs/nuimages/mask_rcnn_r50_caffe_fpn_1x_nuim.py:1-46
_base_ = './mask_rcnn_r50_fpn_1x_nuim.py'
model = dict(
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(norm_cfg=dict(requires_grad=False), style='caffe'))
# caffe image normalization, threaded through both pipelines
img_norm_cfg = dict(mean=[103.530, 116.280, 123.675],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
data = dict(
    train=dict(pipeline_overrides=dict(Normalize=img_norm_cfg)),
    val=dict(pipeline_overrides=dict(Normalize=img_norm_cfg)),
    test=dict(pipeline_overrides=dict(Normalize=img_norm_cfg)))
