# reference configs/nuimages/mask_rcnn_r50_fpn_coco-2x_1x_nus-2d.py:1-39
# (COCO-2x init, evaluated on the nuScenes-2d mono export; the
# reference's petrel s3 file_client is a site-specific storage detail —
# paths here stay filesystem-relative)
_base_ = './mask_rcnn_r50_fpn_coco-2x_1x_nuim.py'
data = dict(
    val=dict(ann_file='data/nuimages/annotations/nuscenes_infos_val_mono3d.coco.json',
             img_prefix='data/nuscenes/'),
    test=dict(ann_file='data/nuimages/annotations/nuscenes_infos_val_mono3d.coco.json',
              img_prefix='data/nuscenes/'))
