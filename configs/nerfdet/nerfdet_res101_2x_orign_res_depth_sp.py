# NeRF-Det-R101*, 480x640 (original-resolution), with depth supervision.
_base_ = './nerfdet_res101_2x_low_res_depth_sp.py'
train_pipeline_overrides = dict(
    n_images=30,
    img_scale=(640, 480),
    pad_size=(480, 640))
test_pipeline_overrides = dict(
    n_images=51,
    img_scale=(640, 480),
    pad_size=(480, 640))
