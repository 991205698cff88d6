"""Command-line entry points mirroring the reference scripts:

* ``python -m semantic_depth_tpu.cli.semantic_depth`` — single-frame pipeline
  + Munich focal-length sweep (reference semantic_depth.py)
* ``python -m semantic_depth_tpu.cli.sequence`` — Cityscapes sequence runner
  (reference semantic_depth_cityscapes_sequence.py)
* ``python -m semantic_depth_tpu.cli.fcn`` — FCN-8s train/test
  (reference fcn8s/fcn.py)
"""
