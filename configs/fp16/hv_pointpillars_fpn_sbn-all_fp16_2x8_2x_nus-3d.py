# PointPillars + FPN, nuScenes, mixed precision (reference
# `configs/fp16/hv_pointpillars_fpn_sbn-all_fp16_2x8_2x_nus-3d.py`).
# On TPU the fp16 mode maps to bf16 compute (no loss scaling needed).
_base_ = '../pointpillars/hv_pointpillars_fpn_sbn-all_4x8_2x_nus-3d.py'
fp16 = dict(loss_scale=512.0)
data = dict(samples_per_gpu=2, workers_per_gpu=2)
