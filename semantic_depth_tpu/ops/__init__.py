"""TPU-native compute kernels: masked point-cloud geometry, MXU resize,
neighborhood outlier removal (exact + Pallas grid kernels), overlay
composition, bilinear warp sampling."""

from . import neighbors, overlay, pcl, resize, sampler
from .pcl import MaskedCloud

__all__ = ["MaskedCloud", "neighbors", "overlay", "pcl", "resize", "sampler"]
