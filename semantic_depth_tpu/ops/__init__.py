"""TPU-native compute kernels: masked point-cloud geometry, MXU resize,
neighborhood outlier removal, overlay composition."""
