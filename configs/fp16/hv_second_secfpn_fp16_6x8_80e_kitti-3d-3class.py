# SECOND, KITTI 3-class, mixed precision (reference
# `configs/fp16/hv_second_secfpn_fp16_6x8_80e_kitti-3d-3class.py`:
# `fp16 = dict(loss_scale=512.)`). On TPU the fp16 mode maps to bf16
# compute — the wider exponent makes loss scaling unnecessary.
_base_ = '../second/hv_second_secfpn_6x8_80e_kitti-3d-3class.py'
fp16 = dict(loss_scale=512.0)
