# reference configs/nuimages/htc_r50_fpn_coco-20e_1x_nuim.py:1-3
_base_ = './htc_r50_fpn_1x_nuim.py'
load_from = ('http://download.openmmlab.com/mmdetection/v2.0/htc/'
             'htc_r50_fpn_20e_coco/htc_r50_fpn_20e_coco_'
             '20200319-fe28c577.pth')
