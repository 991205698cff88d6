"""bench.py weight-loading policy, pinned without a chip.

The driver runs bench.py unattended at round end; these tests pin the
host-side decisions that could silently ruin that run: which cache files a
leg resolves to, that a failed headline training is never re-attempted per
leg (train=False), and that the random fallback engages cleanly.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_models():
    from semantic_depth_tpu.models import FCN8s, Monodepth

    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    mono = Monodepth(encoder="vgg", width_mult=0.0625)
    return fcn, mono


def test_bench_weight_paths_suffixes(tmp_path):
    from tools.train_bench_weights import bench_weight_paths

    d = str(tmp_path)
    assert bench_weight_paths(d) == (
        os.path.join(d, "fcn8s.msgpack"), os.path.join(d, "monodepth.msgpack"))
    assert bench_weight_paths(d, full_res=True) == (
        os.path.join(d, "fcn8s_fullres.msgpack"),
        os.path.join(d, "monodepth_fullres.msgpack"))
    # native wins over full_res (native implies the full-res protocol)
    assert bench_weight_paths(d, full_res=True, native=True) == (
        os.path.join(d, "fcn8s_native.msgpack"),
        os.path.join(d, "monodepth_native.msgpack"))


def test_load_bench_weights_train_false_never_trains(tmp_path, monkeypatch):
    """train=False must not call ensure_bench_weights at all — a failed
    headline training otherwise re-runs per full-res leg on the chip."""
    import bench
    import tools.train_bench_weights as tbw

    def boom(*a, **k):
        raise AssertionError("ensure_bench_weights must not be called")

    monkeypatch.setattr(tbw, "ensure_bench_weights", boom)
    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))

    fcn, mono = _tiny_models()
    logs = []
    fp, mp, mode = bench._load_bench_weights(
        fcn, mono, 128, 256, logs.append, full_res=True, native=True, train=False
    )
    assert mode == "random"
    assert any("training disabled" in m for m in logs)
    # returned templates are usable params
    out = fcn.apply(fp, jnp.zeros((1, 128, 256, 3), jnp.float32))
    assert out.shape == (1, 128, 256, 3)


def test_load_bench_weights_train_false_uses_cache(tmp_path, monkeypatch):
    import bench
    from semantic_depth_tpu.models import weights as weights_lib
    from tools.train_bench_weights import bench_weight_paths

    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    fcn, mono = _tiny_models()
    fp0 = fcn.init(jax.random.PRNGKey(5), jnp.zeros((1, 128, 256, 3), jnp.float32))
    mp0 = mono.init(jax.random.PRNGKey(6), jnp.zeros((2, 128, 256, 3), jnp.float32))
    wf, wm = bench_weight_paths(str(tmp_path), native=True)
    weights_lib.save_params(fp0, wf)
    weights_lib.save_params(mp0, wm)

    fp, mp, mode = bench._load_bench_weights(
        fcn, mono, 128, 256, lambda *a: None, native=True, train=False
    )
    assert mode == "trained"
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(fp)[0]),
        np.asarray(jax.tree_util.tree_leaves(fp0)[0]),
    )


def test_load_bench_weights_training_failure_falls_back(monkeypatch, tmp_path):
    import bench
    import tools.train_bench_weights as tbw

    def boom(*a, **k):
        raise RuntimeError("synthetic training failure")

    monkeypatch.setattr(tbw, "ensure_bench_weights", boom)
    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    fcn, mono = _tiny_models()
    logs = []
    _, _, mode = bench._load_bench_weights(fcn, mono, 128, 256, logs.append)
    assert mode == "random"
    assert any("training failed" in m for m in logs)


@pytest.mark.heavy
def test_ensure_bench_weights_training_path_runs(tmp_path, monkeypatch):
    """Exercise ensure_bench_weights past the cache check into the training
    branch (with the heavy trainers stubbed): a refactor once left a
    NameError on the very first log line of that branch, which bench.py's
    fallback silently converted into a random-weight benchmark run."""
    import tools.train_bench_weights as tbw

    logs = []
    dummy = {"params": {}}
    saved = []

    def fake_train_fcn(*a, **k):
        return dummy, False  # (params, deadline_truncated) contract

    def fake_train_mono(*a, **k):
        return dummy, False

    class FakeWeightsLib:
        @staticmethod
        def save_params(params, path):
            open(path, "wb").write(b"x")
            saved.append(path)
            return path

    monkeypatch.setattr(tbw, "train_fcn", fake_train_fcn)
    monkeypatch.setattr(tbw, "train_mono", fake_train_mono)

    import semantic_depth_tpu.models.weights as weights_lib

    monkeypatch.setattr(weights_lib, "save_params", FakeWeightsLib.save_params)
    # the native/full-res branches graft from the headline set: stub the
    # loader too (the fake files aren't real msgpack)
    monkeypatch.setattr(weights_lib, "load_params", lambda t, p2: dummy)

    for kwargs, suffix in (
        ({}, ""),
        ({"native": True}, "_native"),
    ):
        fp, mp = tbw.ensure_bench_weights(
            str(tmp_path), log=logs.append, **kwargs
        )
        assert os.path.exists(fp) and os.path.exists(mp)
        assert fp.endswith(f"fcn8s{suffix}.msgpack")
    assert any("training FCN-8s" in m for m in logs)
