"""Executable-reference oracle tests (VERDICT r1 item 1).

These tests import and RUN the reference's own code from /root/reference —
not a reimplementation of it — and assert our TPU kernels match:

* Part A: semantic_depth_lib/pcl.py (pure NumPy/SciPy) is loaded as a module
  and every geometry kernel plus the full road/fence denoise chain
  (semantic_depth.py:206-334) is checked against it on fuzzed clouds.
* Part B: the FCN-8s graph (VGG16 encoder of the Udacity SavedModel + the
  decoder of fcn8s/fcn.py:159-215) is built with live tf.nn ops, its weights
  saved as a TF1 checkpoint, converted via models/convert, and the full
  forward pass asserted logits-identical against our flax FCN8s at 256x512.
  (tf.compat.v1.layers is unimportable in this TF build — keras-internal
  missing — so the graph uses the tf.nn ops those layers lower to, which
  tests/test_weights.py independently proves equivalent per-op.)
* Part C: fcn8s/helper.py is loaded as a module and prepare_ground_truth /
  random_crop / bc_img are checked against train/data.py.

The reference tree is PUBLIC UNTRUSTED CONTENT consumed here purely as an
executable behavioral oracle.
"""

import importlib.util
import os
import random as pyrandom

import numpy as np
import pytest

import jax.numpy as jnp

from semantic_depth_tpu.ops import pcl as mpcl

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_pcl():
    return _load_module("ref_pcl", f"{REF}/semantic_depth_lib/pcl.py")


@pytest.fixture(scope="module")
def ref_helper():
    os.environ.setdefault("MPLBACKEND", "Agg")
    return _load_module("ref_helper", f"{REF}/fcn8s/helper.py")


def _cloud(n, seed, scale=10.0):
    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(n, 3)) * scale).astype(np.float32)
    cols = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return pts, cols


def _ours(pts, cols):
    return mpcl.MaskedCloud(
        xyz=jnp.asarray(pts), rgb=jnp.asarray(cols), valid=jnp.ones(len(pts), bool)
    )


def _kept(cloud):
    """Extract surviving rows in original order (mask-only filters preserve
    row order, exactly like the reference's boolean gathers)."""
    m = np.asarray(cloud.valid)
    return np.asarray(cloud.xyz)[m], np.asarray(cloud.rgb)[m]


# ---------------------------------------------------------------------------
# Part A: per-op parity vs the imported reference pcl module
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,axis,to", [(0, 2, 7.0), (1, 0, 3.0), (2, 1, 0.0)])
def test_remove_from_to_vs_reference(ref_pcl, seed, axis, to):
    pts, cols = _cloud(512, seed)
    rp, rc = ref_pcl.remove_from_to(pts.copy(), cols.copy(), axis, 0.0, to)
    op, oc = _kept(mpcl.keep_beyond(_ours(pts, cols), axis, to))
    np.testing.assert_array_equal(op, rp)
    np.testing.assert_array_equal(oc, rc)


@pytest.mark.parametrize(
    "seed,axis,thr", [(3, 1, 15.0), (4, 0, 2.0), (5, 2, 5.0), (6, 1, 1.0)]
)
def test_mad_vs_reference(ref_pcl, seed, axis, thr):
    pts, cols = _cloud(777, seed)
    rp, rc = ref_pcl.remove_noise_by_mad(pts.copy(), cols.copy(), axis, thr)
    op, oc = _kept(mpcl.mad_filter(_ours(pts, cols), axis, thr))
    np.testing.assert_array_equal(op, rp)
    np.testing.assert_array_equal(oc, rc)


def test_mad_zero_mad_vs_reference(ref_pcl):
    """Degenerate cloud where >50% of coords share one value -> MAD == 0.
    The reference's np.where(penalty < thr) drops inf/nan penalties."""
    pts = np.zeros((64, 3), np.float32)
    pts[:, 1] = np.concatenate([np.zeros(40), np.linspace(1, 5, 24)]).astype(np.float32)
    cols = np.ones_like(pts)
    with np.errstate(divide="ignore", invalid="ignore"):
        rp, _ = ref_pcl.remove_noise_by_mad(pts.copy(), cols.copy(), 1, 15.0)
    op, _ = _kept(mpcl.mad_filter(_ours(pts, cols), 1, 15.0))
    np.testing.assert_array_equal(op, rp)


@pytest.mark.parametrize("seed,axis,thr", [(7, 2, 35.0), (8, 0, 5.0)])
def test_threshold_complete_vs_reference(ref_pcl, seed, axis, thr):
    pts, cols = _cloud(300, seed)
    rp, rc = ref_pcl.threshold_complete(pts.copy(), cols.copy(), axis, thr)
    op, oc = _kept(mpcl.threshold_abs(_ours(pts, cols), axis, thr))
    np.testing.assert_array_equal(op, rp)
    np.testing.assert_array_equal(oc, rc)


def test_extract_pcls_vs_reference(ref_pcl):
    pts, cols = _cloud(400, 9)
    rl, rlc, rr, rrc = ref_pcl.extract_pcls(pts.copy(), cols.copy(), 0)
    left, right = mpcl.split_by_mean(_ours(pts, cols), 0)
    ol, olc = _kept(left)
    or_, orc = _kept(right)
    # mean in f32 vs f64 can flip points epsilon-close to the mean; none of
    # the fuzzed points are (fixed seed), so the split must be exact
    np.testing.assert_array_equal(ol, rl)
    np.testing.assert_array_equal(or_, rr)
    np.testing.assert_array_equal(olc, rlc)
    np.testing.assert_array_equal(orc, rrc)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_plane_fit_vs_reference(ref_pcl, axis):
    """Plane fit: scipy.linalg.lstsq (reference, f64) vs our centered
    normal-equation solve (f32). Coefficients to 1e-4; inlier selection exact
    on this cloud (no point epsilon-close to the threshold boundary)."""
    rng = np.random.default_rng(40 + axis)
    n = 2000
    uv = rng.uniform(-8, 8, size=(n, 2))
    w = np.array([0.3, -0.2])
    b = uv @ w + 1.5 + rng.normal(0, 0.5, size=n)
    pts = np.zeros((n, 3))
    ui, vi = {0: (1, 2), 1: (0, 2), 2: (0, 1)}[axis]
    pts[:, ui] = uv[:, 0]
    pts[:, vi] = uv[:, 1]
    pts[:, axis] = b
    pts = pts.astype(np.float32)
    cols = np.ones_like(pts)

    rp, rc, _, _, rcoef = ref_pcl.remove_noise_by_fitting_plane(
        pts.copy().astype(np.float64), cols.copy().astype(np.float64),
        axis=axis, threshold=1.0,
    )
    ours, ocoef = mpcl.plane_inlier_filter(_ours(pts, cols), axis, 1.0)
    op, _ = _kept(ours)

    ref_vec = np.array([rcoef["Cx"], rcoef["Cy"], rcoef["Cz"], rcoef["C"]])
    np.testing.assert_allclose(np.asarray(ocoef), ref_vec, rtol=0, atol=1e-4)
    np.testing.assert_allclose(op, rp, rtol=0, atol=1e-5)
    assert op.shape == rp.shape


def _ref_planes_intersection(ref_pcl, c1, c2, z):
    """Call the reference function; under numpy>=2 its final packaging line
    (pcl.py:235) rejects the ragged nesting, so on ValueError re-run the
    function's own solve lines (pcl.py:226-233) verbatim."""
    try:
        out = ref_pcl.planes_intersection_at_certain_depth(dict(c1), dict(c2), z)
        return np.asarray(out, np.float64).reshape(3)
    except ValueError:
        zz = -z
        A = np.matrix([[c1["Cx"], c1["Cy"]], [c2["Cx"], c2["Cy"]]])
        B = np.matrix(
            [[-(c1["Cz"] * zz + c1["C"])], [-(c2["Cz"] * zz + c2["C"])]]
        )
        X = np.linalg.inv(A) * B
        return np.array([float(X[0, 0]), float(X[1, 0]), zz])


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_planes_intersection_vs_reference(ref_pcl, seed):
    rng = np.random.default_rng(seed)
    c1 = {"Cx": rng.normal(), "Cy": -1.0, "Cz": rng.normal(), "C": rng.normal()}
    c2 = {"Cx": -1.0, "Cy": rng.normal(), "Cz": rng.normal(), "C": rng.normal()}
    ref_pt = _ref_planes_intersection(ref_pcl, c1, c2, 10.0)
    our_pt = np.asarray(
        mpcl.planes_intersection_at_depth(
            jnp.asarray([c1["Cx"], c1["Cy"], c1["Cz"], c1["C"]], jnp.float32),
            jnp.asarray([c2["Cx"], c2["Cy"], c2["Cz"], c2["C"]], jnp.float32),
            10.0,
        )
    )
    np.testing.assert_allclose(our_pt, ref_pt, rtol=0, atol=1e-4)


def test_road_endpoints_vs_reference(ref_pcl):
    pts, _ = _cloud(4096, 14, scale=6.0)
    depth = 5.0
    rl, rr = ref_pcl.get_end_points_of_road(pts.astype(np.float64), depth)
    left, right, found = mpcl.road_endpoints(
        mpcl.MaskedCloud(
            xyz=jnp.asarray(pts), rgb=jnp.zeros_like(jnp.asarray(pts)),
            valid=jnp.ones(len(pts), bool),
        ),
        depth,
    )
    assert bool(found)
    np.testing.assert_allclose(np.asarray(left), rl[0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(right), rr[0], rtol=0, atol=1e-6)
    # empty slab -> reference returns (None, None); ours flags not-found
    rl2, rr2 = ref_pcl.get_end_points_of_road(pts.astype(np.float64), 1e6)
    *_, found2 = mpcl.road_endpoints(
        mpcl.MaskedCloud(
            xyz=jnp.asarray(pts), rgb=jnp.zeros_like(jnp.asarray(pts)),
            valid=jnp.ones(len(pts), bool),
        ),
        1e6,
    )
    assert rl2 is None and rr2 is None and not bool(found2)


def test_distance_3d_vs_reference(ref_pcl):
    a = np.array([1.0, 2.0, -3.0])
    b = np.array([-2.0, 0.5, 4.0])
    ref = ref_pcl.compute_distance_in_3D(a, b)
    ours = float(mpcl.distance_3d(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    assert ours == pytest.approx(float(ref), abs=1e-5)


def test_full_road_fence_chain_vs_reference(ref_pcl):
    """The complete FrameProcessor geometry chain (semantic_depth.py:206-334)
    executed twice — once by calling the reference pcl module function-for-
    function, once through our masked kernels — must agree on dist_rw and
    dist_f2f to <= 3 cm (the BASELINE.md bar), minus the Open3D stages which
    have their own oracle tests (tests/test_neighbors.py)."""
    import dataclasses

    import test_chain_equivalence as tce
    from semantic_depth_tpu import camera as camera_lib
    from semantic_depth_tpu import pipeline as pl
    from semantic_depth_tpu.config import CAMERA_MUNICH, munich_pipeline_config

    cam = CAMERA_MUNICH
    base = munich_pipeline_config()
    cfg = munich_pipeline_config(
        road=dataclasses.replace(
            base.road, stat_nb_neighbors=2, stat_std_ratio=1e9,
            radius_nb_points=0, radius=1e9,
        )
    )
    disp, road_mask, fence_mask = tce.synthetic_scene_with_fences(cam)
    pts = camera_lib.reproject_disparity(jnp.asarray(disp), cam)
    colors = jnp.zeros_like(pts)

    # ours: fused masked chain
    road = mpcl.from_dense(pts, colors, jnp.asarray(road_mask))
    road, road_plane = pl._denoise_road(road, cfg, grid_hw=(256, 512))
    left, right, found = mpcl.road_endpoints(
        road, cfg.depth - cfg.rw_depth_offset, cfg.rw_slab_halfwidth
    )
    assert bool(found)
    dist_rw = float(jnp.abs(left[0] - right[0]))
    fence = mpcl.from_dense(pts, colors, jnp.asarray(fence_mask))
    *_, dist_f2f = pl._fence_f2f(fence, road_plane, cfg)
    dist_f2f = float(dist_f2f)

    # reference: the real pcl module, in the reference's exact call order
    p = np.asarray(pts).reshape(-1, 3).astype(np.float64)
    c = np.zeros_like(p)
    r3, rc3 = p[road_mask.reshape(-1)], c[road_mask.reshape(-1)]
    r3, rc3 = ref_pcl.remove_from_to(r3, rc3, 2, 0.0, 7.0)
    r3, rc3 = ref_pcl.remove_noise_by_mad(r3, rc3, 1, 15.0)
    r3, rc3 = ref_pcl.remove_noise_by_mad(r3, rc3, 0, 2.0)
    r3, rc3, _, _, road_coeff = ref_pcl.remove_noise_by_fitting_plane(
        r3, rc3, axis=1, threshold=5.0
    )
    rl, rr = ref_pcl.get_end_points_of_road(r3, cfg.depth - 0.02)
    ref_rw = abs(rl[0][0] - rr[0][0])

    f3, fc3 = p[fence_mask.reshape(-1)], c[fence_mask.reshape(-1)]
    f3, fc3 = ref_pcl.remove_noise_by_mad(f3, fc3, 1, 5.0)
    f3, fc3 = ref_pcl.threshold_complete(f3, fc3, 2, 35.0)
    fl, flc, fr, frc = ref_pcl.extract_pcls(f3, fc3)
    fl, flc = ref_pcl.remove_noise_by_mad(fl, flc, 0, 5.0)
    fl, flc, _, _, l_coeff = ref_pcl.remove_noise_by_fitting_plane(
        fl, flc, axis=0, threshold=1.0
    )
    fr, frc = ref_pcl.remove_noise_by_mad(fr, frc, 0, 1.0)
    fr, frc, _, _, r_coeff = ref_pcl.remove_noise_by_fitting_plane(
        fr, frc, axis=0, threshold=1.0
    )
    lp = _ref_planes_intersection(ref_pcl, road_coeff, l_coeff, cfg.depth)
    rp = _ref_planes_intersection(ref_pcl, road_coeff, r_coeff, cfg.depth)
    ref_f2f = float(np.linalg.norm(lp - rp))

    assert dist_rw == pytest.approx(ref_rw, abs=0.03), (dist_rw, ref_rw)
    assert dist_f2f == pytest.approx(ref_f2f, abs=0.03), (dist_f2f, ref_f2f)


# ---------------------------------------------------------------------------
# Part B: TF-executed FCN-8s forward golden vs converter + flax FCN8s
# ---------------------------------------------------------------------------

_VGG_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def _tf_fcn_weights(width_mult, fc_channels, num_classes, seed):
    """Random weights for the full FCN-8s graph, named exactly as in the
    reference checkpoint: Udacity VGG vars '<layer>/filter'+'/biases'
    (fcn.py:82-95 tensor surface) and tf.layers auto-names
    conv2d{,_1,_2}/kernel + conv2d_transpose{,_1,_2}/kernel for the decoder
    built in graph order at fcn.py:165-213."""
    rng = np.random.default_rng(seed)

    def w(shape):
        fan_in = int(np.prod(shape[:-1]))
        return (rng.normal(size=shape) / np.sqrt(fan_in)).astype(np.float32)

    V = {}
    in_ch = 3
    for bi, (n_convs, ch) in enumerate(_VGG_BLOCKS, start=1):
        ch = max(1, int(ch * width_mult))
        for ci in range(1, n_convs + 1):
            V[f"conv{bi}_{ci}/filter"] = w((3, 3, in_ch, ch))
            V[f"conv{bi}_{ci}/biases"] = w((ch,))
            in_ch = ch
    V["fc6/filter"] = w((7, 7, in_ch, fc_channels))
    V["fc6/biases"] = w((fc_channels,))
    V["fc7/filter"] = w((1, 1, fc_channels, fc_channels))
    V["fc7/biases"] = w((fc_channels,))

    pool3_ch = max(1, int(256 * width_mult))
    pool4_ch = max(1, int(512 * width_mult))
    # decoder creation order (fcn.py:165-213): score7, score4, score3 then
    # upscore2, upscore4, upscore8
    for i, cin in enumerate((fc_channels, pool4_ch, pool3_ch)):
        base = "conv2d" if i == 0 else f"conv2d_{i}"
        V[f"{base}/kernel"] = w((1, 1, cin, num_classes))
        V[f"{base}/bias"] = w((num_classes,))
    for i, k in enumerate((4, 4, 16)):
        base = "conv2d_transpose" if i == 0 else f"conv2d_transpose_{i}"
        # TF conv2d_transpose kernels are (H, W, out, in)
        V[f"{base}/kernel"] = w((k, k, num_classes, num_classes))
        V[f"{base}/bias"] = w((num_classes,))
    return V


def _tf_fcn_forward(x, V, width_mult, fc_channels, num_classes):
    """Execute the reference FCN-8s forward with live TF ops: VGG16 encoder
    (3x3 SAME convs + relu + 2x2 maxpool, fc6 7x7 / fc7 1x1, keep_prob=1.0
    at inference) and the fcn.py:159-215 decoder."""
    import tensorflow as tf

    t = tf.constant(x)

    def conv(t, name, relu=True):
        t = tf.nn.conv2d(t, V[f"{name}/filter"], strides=1, padding="SAME")
        t = tf.nn.bias_add(t, V[f"{name}/biases"])
        return tf.nn.relu(t) if relu else t

    skips = {}
    for bi, (n_convs, _) in enumerate(_VGG_BLOCKS, start=1):
        for ci in range(1, n_convs + 1):
            t = conv(t, f"conv{bi}_{ci}")
        t = tf.nn.max_pool2d(t, ksize=2, strides=2, padding="VALID")
        if bi == 3:
            skips["pool3"] = t
        elif bi == 4:
            skips["pool4"] = t
    t = conv(t, "fc6")
    t = conv(t, "fc7")

    def score(t, base):
        t = tf.nn.conv2d(t, V[f"{base}/kernel"], strides=1, padding="SAME")
        return tf.nn.bias_add(t, V[f"{base}/bias"])

    def up(t, base, stride):
        kern = V[f"{base}/kernel"]
        shp = tf.shape(t)
        out_shape = tf.stack(
            [shp[0], shp[1] * stride, shp[2] * stride, tf.constant(num_classes)]
        )
        t = tf.nn.conv2d_transpose(
            t, kern, output_shape=out_shape, strides=[1, stride, stride, 1],
            padding="SAME",
        )
        return tf.nn.bias_add(t, V[f"{base}/bias"])

    s7 = score(t, "conv2d")
    s4 = score(skips["pool4"], "conv2d_1")
    s3 = score(skips["pool3"], "conv2d_2")
    u2 = up(s7, "conv2d_transpose", 2)
    u4 = up(tf.add(u2, s4), "conv2d_transpose_1", 2)
    u8 = up(tf.add(u4, s3), "conv2d_transpose_2", 8)
    return u8.numpy()


def _fcn_golden_roundtrip(tmp_path, width_mult, fc_channels, seed=21):
    """Shared machinery: TF executes the reference architecture at 256x512,
    the weights round-trip through a real TF1 checkpoint and our converter,
    and the flax FCN8s forward must reproduce TF's logits."""
    tf = pytest.importorskip("tensorflow")
    import jax

    from semantic_depth_tpu.models import FCN8s
    from semantic_depth_tpu.models import weights as W

    nc = 3
    V = _tf_fcn_weights(width_mult, fc_channels, nc, seed=seed)

    rng = np.random.default_rng(seed + 1)
    x = rng.uniform(0, 255, size=(1, 256, 512, 3)).astype(np.float32)
    tf_logits = _tf_fcn_forward(x, V, width_mult, fc_channels, nc)

    # round-trip the weights through an actual TF1-format checkpoint
    tf1 = tf.compat.v1
    ckpt_prefix = os.path.join(str(tmp_path), "model")
    with tf1.Graph().as_default():
        for name, arr in V.items():
            tf1.get_variable(name, initializer=tf.constant(arr))
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    model = FCN8s(num_classes=nc, width_mult=width_mult, fc_channels=fc_channels)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    params = W.as_jax_params(template, W.convert_fcn_checkpoint(ckpt_prefix))
    jx_logits = np.asarray(model.apply(params, jnp.asarray(x)))

    assert jx_logits.shape == tf_logits.shape == (1, 256, 512, 3)
    scale = np.abs(tf_logits).max()
    np.testing.assert_allclose(jx_logits, tf_logits, rtol=0, atol=2e-3 * scale)
    # the decision surface the pipeline consumes (0.5-threshold masks,
    # semantic_depth.py:555-560) must agree bit-for-bit
    def masks(logits):
        e = np.exp(logits - logits.max(-1, keepdims=True))
        sm = e / e.sum(-1, keepdims=True)
        return sm > 0.5

    np.testing.assert_array_equal(masks(jx_logits), masks(tf_logits))


def test_fcn_forward_matches_tf_reference_graph(tmp_path):
    """Width-scaled full-graph golden (fast; runs in every CI pass)."""
    _fcn_golden_roundtrip(tmp_path, width_mult=0.125, fc_channels=64)


@pytest.mark.slow
def test_fcn_forward_matches_tf_reference_graph_full_width(tmp_path):
    """PRODUCTION-SCALE golden: the real 4096-channel fc6/fc7 and full VGG16
    stack (width_mult 1.0) through TF, a real TF1 checkpoint round-trip, the
    converter, and the flax forward — the last converter/architecture risk
    before published weights arrive. ~134M params, several minutes on CPU;
    deselected by default (pyproject addopts), run once per round with:

        python -m pytest tests/test_reference_oracle.py -m slow -q
    """
    _fcn_golden_roundtrip(tmp_path, width_mult=1.0, fc_channels=4096)


# ---------------------------------------------------------------------------
# Part C: data-pipeline parity vs the imported reference helper module
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "dataset,mode", [("cityscapes", "train"), ("cityscapes", "test"), ("roborace750", "train")]
)
def test_prepare_ground_truth_vs_reference(ref_helper, dataset, mode):
    from semantic_depth_tpu.train import data as D

    rng = np.random.default_rng(30)
    img = rng.integers(0, 34, size=(64, 96)).astype(np.uint8)
    ref = ref_helper.prepare_ground_truth(dataset, img, 3, mode=mode)
    ours = D.prepare_ground_truth(dataset, img, 3, mode=mode)
    np.testing.assert_array_equal(ours, ref)
    assert ours.dtype == ref.dtype


def test_bc_img_vs_reference(ref_helper, monkeypatch):
    from semantic_depth_tpu.train import data as D

    # helper.bc_img uses the long-removed np.int alias (helper.py:109); it
    # was always plain int — restore it for the call only.
    monkeypatch.setattr(np, "int", int, raising=False)
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(32, 48, 3)).astype(np.uint8)
    for s, m in [(0.85, -40), (1.15, 30), (1.0, 0), (1.1, -20)]:
        ref = ref_helper.bc_img(img.copy(), s, m)
        ours = D.bc_img(img.copy(), s, m)
        np.testing.assert_array_equal(ours, ref)
        assert ours.dtype == ref.dtype == np.uint8


def test_random_crop_vs_reference(ref_helper):
    """Same RNG stream -> identical crops: our random_crop consumes the
    Mersenne sequence with the same randint calls as helper.py:99-106."""
    from semantic_depth_tpu.train import data as D

    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, size=(800, 1600, 3)).astype(np.uint8)
    gt = rng.integers(0, 34, size=(800, 1600)).astype(np.uint8)
    for seed in (7, 8, 9):
        pyrandom.seed(seed)
        ri, rg = ref_helper.random_crop(img, gt)
        oi, og = D.random_crop(img, gt, pyrandom.Random(seed))
        np.testing.assert_array_equal(oi, ri)
        np.testing.assert_array_equal(og, rg)


def test_get_files_paths_vs_reference(ref_helper):
    from semantic_depth_tpu.train import data as D

    root = f"{REF}/data/roborace750_mockup"
    gt_dir = os.path.join(root, "gtFine/train")
    imgs_dir = os.path.join(root, "leftImg8bit/train")
    ref_gt, ref_imgs = ref_helper.get_files_paths(gt_dir, imgs_dir)
    our_gt, our_imgs = D.get_files_paths(gt_dir, imgs_dir)
    assert our_gt == ref_gt and our_imgs == ref_imgs
    assert len(ref_imgs) > 0


# ---------------------------------------------------------------------------
# Part D: TF-executed monodepth forward golden vs converter + flax Monodepth
# (VERDICT r3 #2: the full published architecture — both encoders — built
# with raw tf.nn ops, weights round-tripped through a real TF1 checkpoint
# with the reference's slim naming, flax disparity pyramid pinned against
# the live-TF pyramid. The consumed surface is disp_left_est[0],
# semantic_depth.py:609-675; the code is absent upstream
# (monodepth_lib/README.md:1-9) so the published Godard CVPR'17 architecture
# is the spec both implementations are built from, independently.)
# ---------------------------------------------------------------------------


def _mono_golden_roundtrip(tmp_path, encoder, width_mult, hw, seed=31):
    tf = pytest.importorskip("tensorflow")
    import jax

    from semantic_depth_tpu.models import Monodepth
    from semantic_depth_tpu.models import weights as W

    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 1.0, size=(2,) + hw + (3,)).astype(np.float32)

    from tools.tf_twins import TFMonodepth

    twin = TFMonodepth(width_mult, seed=seed + 1)
    tf_disps = twin.forward(x, encoder)

    # round-trip through an actual TF1 checkpoint with slim naming
    tf1 = tf.compat.v1
    ckpt_prefix = os.path.join(str(tmp_path), f"mono_{encoder}")
    with tf1.Graph().as_default():
        for name, arr in twin.V.items():
            tf1.get_variable(name, initializer=tf.constant(arr))
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    model = Monodepth(encoder=encoder, width_mult=width_mult)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 128, 256, 3), jnp.float32)
    )
    params = W.as_jax_params(
        template, W.convert_monodepth_checkpoint(ckpt_prefix, encoder=encoder)
    )
    jx_disps = model.apply(params, jnp.asarray(x))

    assert len(jx_disps) == len(tf_disps) == 4
    for i, (jd, td) in enumerate(zip(jx_disps, tf_disps)):
        jd = np.asarray(jd)
        assert jd.shape == td.shape, (i, jd.shape, td.shape)
        np.testing.assert_allclose(jd, td, rtol=0, atol=1e-4,
                                   err_msg=f"disparity scale {i}")
    # the consumed surface (disp_left_est[0], semantic_depth.py:675)
    left = np.asarray(model.apply(params, jnp.asarray(x), method=Monodepth.disp_left))
    np.testing.assert_allclose(left, tf_disps[0][..., 0], rtol=0, atol=1e-4)


@pytest.mark.parametrize("encoder", ["vgg", "resnet50"])
def test_monodepth_forward_matches_tf_reference_graph(tmp_path, encoder):
    """Width-scaled full-graph golden, both encoders (fast CI pass)."""
    _mono_golden_roundtrip(tmp_path, encoder, width_mult=0.25, hw=(128, 256))


@pytest.mark.slow
@pytest.mark.parametrize("encoder", ["vgg", "resnet50"])
def test_monodepth_forward_matches_tf_reference_graph_full_width(tmp_path, encoder):
    """PRODUCTION-SCALE golden at the reference working resolution 256x512,
    width_mult 1.0 — the from-spec monodepth net (the riskiest parity
    surface: code absent upstream) pinned end-to-end against a live-TF twin
    of the published architecture through the converter. Deselected by
    default; run with -m slow."""
    _mono_golden_roundtrip(tmp_path, encoder, width_mult=1.0, hw=(256, 512))
