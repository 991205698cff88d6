"""Offline utilities mirroring the reference's utils/ tier: video assembly,
PLY rendering, outlier-removal demo."""
