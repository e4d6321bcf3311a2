# reference configs/nuimages/mask_rcnn_r50_fpn_coco-2x_1x_nuim.py:1-9
_base_ = './mask_rcnn_r50_fpn_1x_nuim.py'
load_from = ('https://download.openmmlab.com/mmdetection/v2.0/mask_rcnn/'
             'mask_rcnn_r50_fpn_2x_coco/mask_rcnn_r50_fpn_2x_coco_'
             'bbox_mAP-0.392__segm_mAP-0.354_20200505_003907-3e542a40.pth')
