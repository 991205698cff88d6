"""Integration test over the reference's own roborace750_mockup fixture
(SURVEY.md §4: the de-facto FCN train/val/test dataset) — real
Cityscapes-format data through the full train CLI and the fused pipeline."""

import os

import numpy as np
import pytest

MOCKUP = "/root/reference/data/roborace750_mockup"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCKUP), reason="reference mockup dataset not mounted"
)


@pytest.mark.heavy
def test_fcn_cli_trains_on_reference_mockup(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from semantic_depth_tpu.cli import fcn as cli

    cli.main(
        [
            "--mode", "train",
            "--epochs", "1",
            "--dataset", "roborace750_mockup",
            "--data_dir", os.path.dirname(MOCKUP),
            "--image_shape", "(64,128)",
            "--model_dir", str(tmp_path / "models"),
            "--logging_dir", str(tmp_path / "log"),
            "--runs_dir", str(tmp_path / "runs"),
            "--inference_flag",
            "--dev_tiny",
        ]
    )
    model_dir = tmp_path / "models" / "1-Epochs-roborace750_mockup"
    assert (model_dir / "fcn8s.msgpack").exists()
    # test-set overlays were produced from the real berlin images
    run_dir = next((tmp_path / "runs" / "1-Epochs-roborace750_mockup").iterdir())
    pngs = [p for p in run_dir.iterdir() if p.suffix == ".png"]
    assert len(pngs) == 2  # the mockup test split has 2 berlin frames


def test_pipeline_runs_on_reference_mockup_frame(tmp_path):
    """Full fused pipeline over a real mockup frame (random weights — checks
    the end-to-end plumbing on genuine camera data, not accuracy)."""
    from glob import glob

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import tiny_pipeline

    from semantic_depth_tpu.cli.common import imread_bgr

    frame_path = sorted(glob(os.path.join(MOCKUP, "leftImg8bit/train/*/*.png")))[0]
    frame = imread_bgr(frame_path)
    assert frame.shape == (1200, 1600, 3)
    pipe = tiny_pipeline(approach="rw")
    out = pipe.process_frame(frame.astype(np.uint8))
    assert out.disparity.shape == (128, 256)
    float(out.dist_rw)  # materializes without error
