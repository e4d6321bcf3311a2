"""nerfdet_tpu — a TPU-native (JAX/XLA/Pallas) multi-view indoor 3D detection
framework with a jointly-trained generalizable NeRF branch.

Re-implements the capabilities of facebookresearch/NeRF-Det (ICCV 2023)
from scratch with a TPU-first design: functional flax modules, static
shapes, fused streaming back-projection, pjit data parallelism over a
device mesh, and Pallas kernels for the hot gather paths.
"""

from .version import __version__

__all__ = ["__version__"]
