# reference configs/nuimages/cascade_mask_rcnn_r50_fpn_coco-20e_1x_nuim.py:1-3
_base_ = './cascade_mask_rcnn_r50_fpn_1x_nuim.py'
load_from = ('http://download.openmmlab.com/mmdetection/v2.0/'
             'cascade_rcnn/cascade_mask_rcnn_r50_fpn_20e_coco/'
             'cascade_mask_rcnn_r50_fpn_20e_coco_bbox_mAP-0.419__segm_'
             'mAP-0.365_20200504_174711-4af8e66e.pth')
