# Fast ScanNet variant with depth-gated back-projection (reference
# `imvoxelnet_scannet_fast_depth.py`): `use_depth=True` collects the
# sensed depth maps and restricts voxel-feature assignment to within
# one z-voxel of the surface (`ops/voxel.fused_mean_cov` depth gate).
_base_ = ['./imvoxelnet_scannet_fast.py']

input_modality = dict(use_image=True, use_depth=True, use_lidar=False,
                      use_neuralrecon_depth=False, use_ray=False)
