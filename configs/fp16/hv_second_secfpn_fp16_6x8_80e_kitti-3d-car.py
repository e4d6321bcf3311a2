# SECOND, KITTI car-only, mixed precision (reference
# `configs/fp16/hv_second_secfpn_fp16_6x8_80e_kitti-3d-car.py`).
# On TPU the fp16 mode maps to bf16 compute (no loss scaling needed).
_base_ = '../second/hv_second_secfpn_6x8_80e_kitti-3d-car.py'
fp16 = dict(loss_scale=512.0)
