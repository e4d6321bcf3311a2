# NeRF-Det-R50*, 240x320, with depth supervision.
_base_ = './_base_nerfdet.py'
model = dict(depth_supervise=True)
input_modality = dict(use_depth=True)
train_collect_keys = ['img', 'gt_bboxes_3d', 'gt_labels_3d', 'depth',
                      'lightpos', 'nerf_sizes', 'raydirs', 'gt_images',
                      'gt_depths', 'denorm_images']
test_collect_keys = ['img', 'depth', 'lightpos', 'nerf_sizes', 'raydirs',
                     'gt_images', 'gt_depths', 'denorm_images']
