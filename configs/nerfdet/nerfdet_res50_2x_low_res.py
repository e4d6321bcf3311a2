# NeRF-Det-R50, 240x320, no depth supervision (mAP@25 53.1 / mAP@50 27.8).
_base_ = './_base_nerfdet.py'
