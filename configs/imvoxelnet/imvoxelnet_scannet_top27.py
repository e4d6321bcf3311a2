# The top27 variant (reference `imvoxelnet_scannet_top27.py`): same
# model with the assignment's centerness top-k raised to 28.
_base_ = ['./imvoxelnet_scannet.py']

model = dict(bbox_head=dict(centerness_topk=28))
