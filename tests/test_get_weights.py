"""Weight-acquisition tests with a mocked fetcher (no egress in CI).

Covers models/get_weights.py: wget -nc skip semantics, checksum verification,
zip extraction + cleanup (get_monodepth_model.sh:1-21), the VGG
missing-files/re-download logic (helper.py:60-94), convert-on-download, and
graceful offline failure.
"""

import hashlib
import os
import zipfile

import numpy as np
import pytest

from semantic_depth_tpu.models import get_weights as G


def _zip_bytes_to(path, members):
    with zipfile.ZipFile(path, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)


def _mock_fetcher_for(members):
    calls = []

    def fetcher(url, out_path):
        calls.append(url)
        _zip_bytes_to(out_path, members)

    return fetcher, calls


def test_monodepth_download_extract_cleanup(tmp_path):
    members = {
        "model_kitti/model_kitti.index": b"idx",
        "model_kitti/model_kitti.data-00000-of-00001": b"data",
    }
    fetcher, calls = _mock_fetcher_for(members)
    out = tmp_path / "md"
    prefix = G.get_monodepth_model("model_kitti", str(out), fetcher=fetcher)
    assert calls == [G.MONODEPTH_URL.format(name="model_kitti")]
    assert prefix == str(out / "model_kitti" / "model_kitti")
    assert os.path.exists(prefix + ".index")
    assert not os.path.exists(out / "model_kitti.zip")  # zip removed (sh:21)


def test_fetch_skips_existing_and_verifies_checksum(tmp_path):
    target = tmp_path / "f.zip"
    target.write_bytes(b"cached")
    calls = []

    def fetcher(url, out_path):  # must NOT be called (wget -nc)
        calls.append(url)

    G.fetch("http://x/f.zip", str(target), fetcher=fetcher)
    assert calls == []

    good = hashlib.sha256(b"cached").hexdigest()
    G.fetch("http://x/f.zip", str(target), fetcher=fetcher, sha256=good)
    with pytest.raises(ValueError, match="checksum mismatch"):
        G.fetch("http://x/f.zip", str(target), fetcher=fetcher, sha256="0" * 64)
    assert not target.exists()  # bad file removed


def test_fetch_cleans_partial_on_failure(tmp_path):
    def fetcher(url, out_path):
        with open(out_path, "wb") as f:
            f.write(b"partial")
        raise OSError("connection reset")

    with pytest.raises(OSError):
        G.fetch("http://x/f.zip", str(tmp_path / "f.zip"), fetcher=fetcher)
    assert list(tmp_path.iterdir()) == []


def test_vgg_download_and_skip(tmp_path):
    members = {
        "vgg/saved_model.pb": b"pb",
        "vgg/variables/variables.index": b"i",
        "vgg/variables/variables.data-00000-of-00001": b"d",
    }
    fetcher, calls = _mock_fetcher_for(members)
    path = G.maybe_download_pretrained_vgg(str(tmp_path), fetcher=fetcher)
    assert path == str(tmp_path / "vgg")
    assert os.path.exists(os.path.join(path, "saved_model.pb"))
    assert not os.path.exists(os.path.join(path, "vgg.zip"))
    # all files present -> second call is a no-op (helper.py:72 check)
    G.maybe_download_pretrained_vgg(str(tmp_path), fetcher=fetcher)
    assert len(calls) == 1
    # delete one file -> clean re-download (helper.py:74-77)
    os.remove(os.path.join(path, "saved_model.pb"))
    G.maybe_download_pretrained_vgg(str(tmp_path), fetcher=fetcher)
    assert len(calls) == 2
    assert os.path.exists(os.path.join(path, "saved_model.pb"))


def test_monodepth_convert_on_download(tmp_path):
    """End-to-end: the zip carries a real (tiny, synthetic) TF1 monodepth
    checkpoint; convert=True must produce a loadable msgpack."""
    tf = pytest.importorskip("tensorflow")
    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.models import Monodepth
    from semantic_depth_tpu.models import weights as W

    model = Monodepth(encoder="vgg", width_mult=0.0625)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 128, 256, 3)))
    p = params["params"]
    rng = np.random.default_rng(4)
    var_specs = {}
    for scope, order in (
        ("model/encoder", W._MONODEPTH_VGG_ENCODER),
        ("model/decoder", W._monodepth_decoder_order(7)),
    ):
        for i, our in enumerate(order):
            suffix = "" if i == 0 else f"_{i}"
            var_specs[f"{scope}/Conv{suffix}/weights"] = rng.normal(
                size=np.asarray(p[our]["kernel"]).shape
            ).astype(np.float32)
            var_specs[f"{scope}/Conv{suffix}/biases"] = rng.normal(
                size=np.asarray(p[our]["bias"]).shape
            ).astype(np.float32)

    ckpt_dir = tmp_path / "build" / "model_kitti"
    ckpt_dir.mkdir(parents=True)
    tf1 = tf.compat.v1
    with tf1.Graph().as_default():
        for name, arr in var_specs.items():
            tf1.get_variable(name, initializer=tf.constant(arr))
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, str(ckpt_dir / "model_kitti"))

    zip_members = {}
    for fn in os.listdir(ckpt_dir):
        with open(ckpt_dir / fn, "rb") as f:
            zip_members[f"model_kitti/{fn}"] = f.read()

    fetcher, _ = _mock_fetcher_for(zip_members)
    # convert.py builds the FULL-size template by default; monkeypatching is
    # avoided by converting via the library against our tiny template instead
    prefix = G.get_monodepth_model("model_kitti", str(tmp_path / "md"), fetcher=fetcher)
    converted = W.convert_monodepth_checkpoint(prefix, encoder="vgg")
    grafted = W.as_jax_params(params, converted)
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["enc1a"]["kernel"]),
        var_specs["model/encoder/Conv/weights"],
    )


def test_cli_offline_graceful(tmp_path, capsys):
    """No egress: the CLI must print a helpful message and return 1."""
    rc = G.main(["monodepth", "model_kitti", str(tmp_path / "x")])
    assert rc == 1
    assert "offline" in capsys.readouterr().out
