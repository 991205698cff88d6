"""Model zoo: FCN-8s (VGG16) segmentation and monodepth disparity networks,
as flax modules jitted into the fused pipeline."""

from .fcn8s import FCN8s
from .monodepth import Monodepth

__all__ = ["FCN8s", "Monodepth"]
