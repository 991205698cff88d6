"""FCN-8s training: optax Adam trainer, streaming mean-IoU metrics,
Cityscapes-layout data pipeline with the reference's augmentations."""
