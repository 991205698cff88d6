"""Back-projection vs cv2.reprojectImageTo3D semantics; MXU resize vs cv2."""

import numpy as np
import pytest

from semantic_depth_tpu import camera
from semantic_depth_tpu.config import CAMERA_MUNICH, CameraConfig
from semantic_depth_tpu.ops import resize

import oracles as o

cv2 = pytest.importorskip("cv2")


def test_reproject_matches_oracle():
    rng = np.random.default_rng(0)
    disp = rng.uniform(1.0, 80.0, size=(32, 64)).astype(np.float32)
    got = np.asarray(camera.reproject_disparity(disp, CAMERA_MUNICH))
    want = o.o_reproject(
        disp, CAMERA_MUNICH.cx, CAMERA_MUNICH.cy, CAMERA_MUNICH.baseline, CAMERA_MUNICH.focal
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reproject_matches_cv2():
    cam = CameraConfig(cx=314.055, cy=124.097, baseline=1.0, focal=380.0)
    rng = np.random.default_rng(1)
    disp = rng.uniform(1.0, 80.0, size=(64, 128)).astype(np.float32)
    Q = np.float32(
        [
            [1, 0, 0, -cam.cx],
            [0, -1, 0, cam.cy],
            [0, 0, 0, -cam.focal],
            [0, 0, 1 / cam.baseline, 0],
        ]
    )
    want = cv2.reprojectImageTo3D(disp, Q)
    got = np.asarray(camera.reproject_disparity(disp, cam))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape_pair", [((96, 192), (48, 96)), ((50, 70), (256, 512))])
def test_cubic_resize_close_to_cv2(shape_pair):
    (sh, sw), (dh, dw) = shape_pair
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(sh, sw, 3)).astype(np.uint8)
    want = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_CUBIC).astype(np.float32)
    got = np.asarray(resize.resize_clip_u8(img.astype(np.float32), (dh, dw)))
    # OpenCV runs 11-bit fixed point; allow ~1 intensity level of rounding
    # jitter (x.5 boundaries land on different sides).
    assert np.mean(np.abs(got - want)) < 0.5
    assert np.max(np.abs(got - want)) <= 2.0


def test_linear_resize_close_to_cv2():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 60)).astype(np.uint8)
    want = cv2.resize(img, (120, 80), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    got = np.asarray(resize.resize_clip_u8(img.astype(np.float32), (80, 120), method="linear"))
    assert np.mean(np.abs(got - want)) < 0.2


def test_scaled_camera_resolution_consistency():
    """The native full-res mode back-projects the SAME physical scene as the
    reference-resolution path: intrinsics scale with resolution and the
    disparity multiplier scales with width (pipeline._scaled_camera)."""
    import jax.numpy as jnp

    from semantic_depth_tpu import camera as camera_lib
    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.pipeline import _scaled_camera

    cfg1 = munich_pipeline_config()  # 256x512 (reference resolution)
    cfg2 = munich_pipeline_config(input_height=512, input_width=1024)
    cam1, s1 = _scaled_camera(cfg1, jnp.float32(380.0))
    cam2, s2 = _scaled_camera(cfg2, jnp.float32(380.0))
    assert s1 == 1.0 and s2 == 2.0
    # the 256x512 path must be bit-identical to the unscaled camera
    assert float(cam1.cx) == cfg1.camera.cx and float(cam1.cy) == cfg1.camera.cy

    rng = np.random.default_rng(0)
    d1 = rng.uniform(0.01, 0.3, size=(256, 512)).astype(np.float32)
    d2 = np.kron(d1, np.ones((2, 2), np.float32))  # same normalized field
    mult = 2048.0  # reference: original frame width
    p1 = np.asarray(camera_lib.reproject_disparity(jnp.asarray(d1 * mult), cam1))
    p2 = np.asarray(
        camera_lib.reproject_disparity(jnp.asarray(d2 * (mult * s2)), cam2)
    )
    # co-located pixels -> identical physical points
    np.testing.assert_allclose(p2[::2, ::2], p1, rtol=1e-5, atol=1e-5)


def test_resize_np_matches_device_resize():
    """The host numpy resize (data-loader path) equals the jitted resize to
    f32 rounding for both methods, including round/clip."""
    import jax.numpy as jnp

    from semantic_depth_tpu.ops import resize as rz

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 61, 3)).astype(np.float32)
    for method in ("cubic", "linear"):
        dev = np.asarray(rz.resize_clip_u8(jnp.asarray(img), (19, 45), method))
        host = rz.resize_clip_u8_np(img, (19, 45), method)
        # identical matrices; tensordot vs MXU matmul may differ by one
        # rounding step on exact-.5 boundaries
        assert (dev != host).mean() < 0.01, method
        np.testing.assert_allclose(host, dev, atol=1.0)
    # same-size: exact identity
    np.testing.assert_array_equal(
        rz.resize_clip_u8_np(img, (37, 61)), np.clip(np.round(img), 0, 255)
    )
