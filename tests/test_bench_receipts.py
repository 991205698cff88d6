"""The bench's sidecar receipt cache (bench.py _receipt_load/_receipt_save,
_scene_pool_cached) — the layer that lets warm bench runs replay chip
measurements (conv-probe ceilings, geometry floors, rendered scene pools)
instead of re-measuring and blowing the 1200 s budget (r4 ran 1522 s).

Pinned behaviors: keyed replay, key mismatch = recompute (the key embeds
_RECEIPT_VERSION so a methodology bump invalidates stale receipts), corrupt
sidecars never fail the bench, and the scene-pool npz round-trips exactly.
"""

import json
import os

import numpy as np

import bench


def test_receipt_roundtrip_and_key_mismatch(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    val = {"ceiling": 123.4, "probes": {"a": 1}}
    bench._receipt_save("r.json", "v2|chip|sig", val)
    assert bench._receipt_load("r.json", "v2|chip|sig") == val
    # a different key (new methodology version, other chip, other program
    # signature) must MISS — stale receipts never replay into a new record
    assert bench._receipt_load("r.json", "v3|chip|sig") is None
    assert bench._receipt_load("missing.json", "v2|chip|sig") is None


def test_receipt_corrupt_sidecar_is_a_miss(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    with open(tmp_path / "r.json", "w") as f:
        f.write("{not json")
    assert bench._receipt_load("r.json", "k") is None  # not an exception


def test_receipt_save_failure_is_silent(tmp_path, monkeypatch):
    # the cache is an optimization: an unwritable dir must not fail the bench
    monkeypatch.setattr(
        bench, "BENCH_WEIGHTS_DIR", str(tmp_path / "no" / "such" / "dir")
    )
    monkeypatch.setattr(os, "makedirs", lambda *a, **k: (_ for _ in ()).throw(OSError))
    bench._receipt_save("r.json", "k", {"v": 1})  # must not raise


def test_scene_pool_cached_roundtrip_and_replay(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    calls = []

    def fake_pool(n, h, w, seed=0):
        calls.append((n, h, w, seed))
        rng = np.random.default_rng(seed)
        return (
            rng.integers(0, 256, size=(n, h, w, 3)).astype(np.uint8),
            rng.integers(0, 3, size=(n, h, w)).astype(np.int32),
            rng.random((n, h, w), dtype=np.float32),
            rng.random(n).astype(np.float32),
            rng.random(n).astype(np.float32),
        )

    logs = []
    first = bench._scene_pool_cached(fake_pool, 2, 8, 16, 0, np, logs.append)
    assert len(calls) == 1
    second = bench._scene_pool_cached(fake_pool, 2, 8, 16, 0, np, logs.append)
    assert len(calls) == 1  # replayed from npz, not re-rendered
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    # a different (n, h, w, seed) keys a different file
    bench._scene_pool_cached(fake_pool, 2, 8, 16, 1, np, logs.append)
    assert len(calls) == 2


def test_scene_pool_corrupt_npz_rerenders(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    path = os.path.join(
        str(tmp_path), f"scene_pool_v{bench._RECEIPT_VERSION}_2x8x16_s0.npz"
    )
    with open(path, "wb") as f:
        f.write(b"corrupt")
    calls = []

    def fake_pool(n, h, w, seed=0):
        calls.append(1)
        z = np.zeros((n, h, w, 3), np.uint8)
        return z, z[..., 0].astype(np.int32), z[..., 0].astype(np.float32), \
            np.zeros(n, np.float32), np.zeros(n, np.float32)

    logs = []
    bench._scene_pool_cached(fake_pool, 2, 8, 16, 0, np, logs.append)
    assert calls  # fell back to rendering
    assert any("unreadable" in m for m in logs)


def test_conv_roofline_replays_from_sidecar(tmp_path, monkeypatch):
    """A complete probe pass (coverage >= 0.9) saves receipts; an identical
    second call must replay them without probing."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    monkeypatch.setattr(bench, "BENCH_WEIGHTS_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "_PROBE_LADDER", (2, 8, 32))

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3))(x)

    m = Net()
    x = jnp.zeros((1, 16, 32, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: m.apply(p, x))
    logs = []
    r1 = bench._conv_roofline(f, (p, x), jax, jnp, np, logs.append,
                              time_left=lambda: 1e9, dev_kind="testchip")
    assert r1 is not None and os.path.exists(tmp_path / "conv_probe_receipts.json")
    logs2 = []
    r2 = bench._conv_roofline(f, (p, x), jax, jnp, np, logs2.append,
                              time_left=lambda: 1e9, dev_kind="testchip")
    assert r2 == r1
    assert any("sidecar cache" in m for m in logs2)
    assert not any("conv probe" in m and "TF/s" in m for m in logs2)
