"""semantic_depth_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of SemanticDepth.

SemanticDepth (reference: pablopalafox/semantic-depth) measures the width of the
road at a chosen depth in front of a monocular camera by fusing an FCN-8s
semantic-segmentation network with the monodepth monocular-disparity network,
back-projecting disparity into a 3D point cloud, denoising it, fitting planes,
and measuring either the road width ("rw") or the fence-to-fence distance
("f2f") at a given depth.

This package is a from-scratch TPU-first design, NOT a port:

* every compute stage — resize, both network forwards, mask gating,
  back-projection, point-cloud denoising, plane fits, width measurement —
  lives in ONE jitted XLA program (`semantic_depth_tpu.pipeline`), so a frame
  goes from decoded pixels to a road-width scalar without host round-trips
  (the reference spent ~79% of its wall time on host work, thesis Table 19);
* ragged point clouds become fixed-capacity masked arrays
  (`semantic_depth_tpu.ops.pcl.MaskedCloud`) so XLA sees static shapes;
* the Open3D statistical/radius outlier removal becomes tiled MXU
  distance-matrix kernels (`semantic_depth_tpu.ops.neighbors`);
* cv2.INTER_CUBIC resize becomes separable interpolation matmuls on the MXU
  (`semantic_depth_tpu.ops.resize`);
* multi-device scaling is data-parallel over frames via `jax.sharding.Mesh` +
  `shard_map` (`semantic_depth_tpu.parallel`), with ICI collectives only for
  metric reductions — the reference is single-GPU, so this is a new capability.

Reference behavior citations use `file:line` paths inside the upstream repo,
e.g. `semantic_depth.py:206-245` for the road denoise chain.
"""

__version__ = "0.1.0"

from .config import (  # noqa: E402
    CAMERA_CITYSCAPES,
    CAMERA_CITYSCAPES_SEQUENCE,
    CAMERA_MUNICH,
    CameraConfig,
    PipelineConfig,
    TrainConfig,
    cityscapes_pipeline_config,
    munich_pipeline_config,
    sequence_pipeline_config,
)
from .export import export_pipeline, load_pipeline  # noqa: E402
from .pipeline import FrameOutputs, SemanticDepthPipeline  # noqa: E402

__all__ = [
    "CAMERA_CITYSCAPES",
    "CAMERA_CITYSCAPES_SEQUENCE",
    "CAMERA_MUNICH",
    "CameraConfig",
    "FrameOutputs",
    "PipelineConfig",
    "SemanticDepthPipeline",
    "TrainConfig",
    "cityscapes_pipeline_config",
    "export_pipeline",
    "load_pipeline",
    "munich_pipeline_config",
    "sequence_pipeline_config",
    "__version__",
]
