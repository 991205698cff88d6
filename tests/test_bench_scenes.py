"""Analytic-scene oracle checks for utils.bench_scenes (the bench's
accuracy-leg ground truth; reference protocol analog:
semantic_depth.py:903-937 hand-measured MAE sweep)."""

import numpy as np

from semantic_depth_tpu.utils.bench_scenes import (
    SceneParams,
    render_scene,
    scaled_camera,
    scene_pool,
)
from semantic_depth_tpu.config import CAMERA_MUNICH


def test_scene_pool_shapes_and_truths():
    imgs, labels, disps, rw, f2f = scene_pool(3, 64, 128, seed=7)
    assert imgs.shape == (3, 64, 128, 3) and imgs.dtype == np.uint8
    assert labels.shape == (3, 64, 128) and labels.dtype == np.uint8
    assert disps.shape == (3, 64, 128) and disps.dtype == np.float32
    assert rw.shape == (3,) and f2f.shape == (3,)
    assert (rw > 0).all() and (f2f > rw).all()  # fences sit outside the road


def test_fence_truth_is_plane_separation():
    """f2f_true must equal the separation of the two rendered fence planes
    (2*fence_x — camera jitter shifts both planes equally), verified by
    back-projecting fence pixels of the analytic disparity and reading
    their X coordinates."""
    rng = np.random.default_rng(0)
    p = SceneParams(road_width=4.0, cam_height=1.5, fence_x=3.5,
                    fence_height=2.0, center_jitter=0.2)
    h, w = 128, 256
    img, labels, disp_norm, rw_true, f2f_true = render_scene(
        rng, h, w, params=p, disp_noise=0.0
    )
    assert rw_true == p.road_width
    assert f2f_true == 2.0 * p.fence_x

    cam = scaled_camera(CAMERA_MUNICH, h, w)
    s_w = w / 512.0
    d_pix = disp_norm * 2048.0 * s_w
    ys, xs = np.nonzero(labels == 13)
    assert ys.size > 100
    z = -cam.focal * cam.baseline / d_pix[ys, xs]
    x = (xs - cam.cx) * (-z) / cam.focal
    left = x[x < 0]
    right = x[x >= 0]
    assert left.size and right.size
    # plane separation: jitter-shifted planes at -fence_x-j and +fence_x-j
    sep = np.median(right) - np.median(left)
    np.testing.assert_allclose(sep, f2f_true, atol=0.05)
