# reference configs/nuimages/mask_rcnn_r50_caffe_fpn_coco-3x_20e_nuim.py:1-52
_base_ = './mask_rcnn_r50_caffe_fpn_coco-3x_1x_nuim.py'
lr_config = dict(step=[16, 19])
total_epochs = 20
