"""The bench's conv-roofline receipts and budget guard, pinned without a
chip (VERDICT r3 #1/#4: the driver's bench run must survive its wall-clock
budget and carry checkable roofline numbers).
"""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn


class _TinyConvNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), name="c0")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2), name="c1")(x)
        x = nn.ConvTranspose(8, (4, 4), strides=(2, 2), name="d0")(x)
        return x


def _traced_convs():
    from bench import _collect_convs

    m = _TinyConvNet()
    x = jnp.zeros((2, 32, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: m.apply(p, x))
    convs = []
    _collect_convs(jax.make_jaxpr(f)(p, x).jaxpr, convs)
    return convs


def test_collect_convs_shapes_and_flops():
    convs = _traced_convs()
    assert len(convs) == 3  # two convs + the transposed conv
    by_cout = {c["cout"]: c for c in convs}
    c = by_cout[32]
    assert c["cin"] == 16 and c["k"] == (3, 3) and c["stride"] == (2, 2)
    assert c["out_hw"] == (16, 32) and c["lhs_hw"] == (32, 64)
    # 2 * B * out_hw * k*k * cin * cout
    assert c["flops"] == 2 * 2 * 16 * 32 * 9 * 16 * 32
    # the transposed conv surfaces as lhs_dilation
    assert by_cout[8]["lhs_dilation"] == (2, 2)


def test_probe_conv_class_returns_throughput(monkeypatch):
    import bench

    # short ladder: CPU walks every rung; the real (8..32768) ladder exists
    # to outlast the TPU relay's ~100 ms dispatch, irrelevant in-process
    monkeypatch.setattr(bench, "_PROBE_LADDER", (2, 8, 32))
    convs = _traced_convs()
    tfs = bench._probe_conv_class(convs[1], jax, jnp, np)
    assert tfs is not None and tfs > 0


def test_conv_roofline_receipts_fields(monkeypatch, tmp_path):
    import bench
    from bench import _conv_roofline

    monkeypatch.setattr(bench, "_PROBE_LADDER", (2, 8, 32))
    # receipts sidecars must land in a scratch dir, not the repo cache
    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    m = _TinyConvNet()
    x = jnp.zeros((2, 32, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: m.apply(p, x))
    logs = []
    r = _conv_roofline(f, (p, x), jax, jnp, np, logs.append,
                       time_left=lambda: 1e9, max_classes=4)
    assert r is not None
    assert r["conv_probe_flop_coverage"] == pytest.approx(1.0)
    assert r["conv_weighted_ceiling_tflops"] > 0
    assert len(r["conv_probe_tflops"]) == 3
    # the weighted ceiling is a harmonic mean: between min and max probes
    vals = list(r["conv_probe_tflops"].values())
    assert min(vals) <= r["conv_weighted_ceiling_tflops"] <= max(vals) + 0.1


def test_conv_roofline_respects_budget(monkeypatch, tmp_path):
    """time_left below the floor must stop probing before any probe runs."""
    import bench
    from bench import _conv_roofline

    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    m = _TinyConvNet()
    x = jnp.zeros((2, 32, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: m.apply(p, x))
    logs = []
    r = _conv_roofline(f, (p, x), jax, jnp, np, logs.append,
                       time_left=lambda: 10.0)
    assert r is None
    assert any("budget low" in m for m in logs)


def test_ensure_bench_weights_deadline_refuses_cold_training(tmp_path, monkeypatch):
    """A cold cache + an exhausted budget must raise TimeoutError BEFORE any
    training starts (bench.py then falls back to labeled random weights)."""
    import tools.train_bench_weights as tbw

    def boom(*a, **k):
        raise AssertionError("training must not start past the deadline")

    monkeypatch.setattr(tbw, "train_fcn", boom)
    monkeypatch.setattr(tbw, "train_mono", boom)
    with pytest.raises(TimeoutError):
        tbw.ensure_bench_weights(str(tmp_path), deadline=time.time() + 5.0)


def test_ensure_bench_weights_deadline_ignored_when_cached(tmp_path, monkeypatch):
    """A warm cache resolves instantly regardless of the deadline."""
    import tools.train_bench_weights as tbw

    fp, mp = tbw.bench_weight_paths(str(tmp_path))
    for p in (fp, mp):
        with open(p, "wb") as f:
            f.write(b"x")
    got = tbw.ensure_bench_weights(str(tmp_path), deadline=time.time() - 100.0)
    assert got == (fp, mp)


def test_train_loops_stop_at_deadline(monkeypatch):
    """train_fcn/train_mono hard-stop (returning params) when the deadline
    passes mid-run — the bench budget bounds even a mis-estimated training."""
    import tools.train_bench_weights as tbw

    logs = []
    t0 = time.time()
    params, truncated = tbw.train_fcn(
        [((64, 128), 2, 1, 10_000)], width_mult=0.0625, fc_channels=32,
        deadline=time.time() + 4.0, log=logs.append,
    )
    assert params is not None
    assert truncated  # the flag save_or_reject keys off (ADVICE r4)
    assert time.time() - t0 < 120  # stopped long before 10k steps
    assert any("deadline hit" in m for m in logs)


def test_truncated_training_never_populates_cache(tmp_path, monkeypatch):
    """A deadline-truncated training must park its params in *.partial and
    raise — NOT cache them under the real name where every later warm run
    would silently load the under-trained set as 'trained' (ADVICE r4)."""
    import tools.train_bench_weights as tbw

    def fake_train(*a, **k):
        return {"w": __import__("jax").numpy.zeros((2, 2))}, True  # truncated

    monkeypatch.setattr(tbw, "train_fcn", fake_train)
    monkeypatch.setattr(tbw, "train_mono", fake_train)
    with pytest.raises(TimeoutError, match="partial"):
        tbw.ensure_bench_weights(str(tmp_path), deadline=time.time() + 10_000)
    fp, mp = tbw.bench_weight_paths(str(tmp_path))
    assert not os.path.exists(fp) and not os.path.exists(mp)
    assert os.path.exists(fp + ".partial")


class _FakeOut:
    def __init__(self, n):
        self.dist_rw = jnp.zeros((n,))


class _FakePipe:
    def process_batch(self, dev):
        return _FakeOut(dev.shape[0])


def test_upload_and_decode_trials_return_shapes():
    """The three ingest trials must return what main() unpacks — the serial
    trial a (fps, upload_mbps) PAIR, the overlapped and decode trials a bare
    fps — or main's try/except silently drops the fields from the record
    (this exact swap shipped once)."""
    import bench

    pool = np.zeros((2 * bench.BATCH, 8, 16, 3), np.uint8)
    fps, mbps = bench._upload_trial(_FakePipe(), pool, jax, jnp, np, n_batches=2)
    assert fps > 0 and mbps > 0
    fps_ov = bench._upload_trial_overlapped(_FakePipe(), pool, jax, np, n_batches=2)
    assert isinstance(fps_ov, float) and fps_ov > 0
    fps_dec = bench._decode_trial(_FakePipe(), pool, jax, np, n_batches=2)
    assert isinstance(fps_dec, float) and fps_dec > 0
