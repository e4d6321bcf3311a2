# reference configs/nuimages/mask_rcnn_r50_caffe_fpn_coco-3x_1x_nuim.py:1-52
_base_ = './mask_rcnn_r50_caffe_fpn_1x_nuim.py'
load_from = ('https://download.openmmlab.com/mmdetection/v2.0/mask_rcnn/'
             'mask_rcnn_r50_caffe_fpn_mstrain-poly_3x_coco/mask_rcnn_'
             'r50_caffe_fpn_mstrain-poly_3x_coco_bbox_mAP-0.408__segm_'
             'mAP-0.37_20200504_163245-42aa3d00.pth')
