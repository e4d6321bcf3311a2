# The top27 variant (reference `imvoxelnet_sunrgbd_top27.py`).
_base_ = ['./imvoxelnet_sunrgbd.py']

model = dict(bbox_head=dict(centerness_topk=28))
