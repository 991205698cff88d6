"""Multi-device tests on the 8-virtual-CPU-device mesh: sharded train step
compiles + executes; parity with the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from semantic_depth_tpu.config import TrainConfig
from semantic_depth_tpu.models import FCN8s
from semantic_depth_tpu.parallel import make_mesh, make_sharded_train_step
from semantic_depth_tpu.parallel.mesh import shard_batch
from semantic_depth_tpu.parallel.train_step import _opt_state_shardings, param_shardings


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_runs_and_matches_single_device():
    cfg = TrainConfig(learning_rate=1e-3, batch_size=8, image_shape=(32, 64))
    mesh = make_mesh(8)  # (dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    model = FCN8s(num_classes=3, width_mult=0.25, fc_channels=128)
    tx = optax.adam(cfg.learning_rate)

    h, w = cfg.image_shape
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (8, h, w, 3)), jnp.float32)
    labels_idx = rng.integers(0, 3, (8, h, w))
    labels = jax.nn.one_hot(jnp.asarray(labels_idx), 3, dtype=jnp.float32)
    dropout_rng = jax.random.PRNGKey(42)

    # single-device reference step (same math, no shardings)
    from semantic_depth_tpu.models.fcn8s import decoder_l2_loss
    from semantic_depth_tpu.train.trainer import softmax_xent

    def loss_fn(p, x, y):
        logits = model.apply(p, x, train=True, rngs={"dropout": dropout_rng})
        return softmax_xent(logits, y) + decoder_l2_loss(p, cfg.l2_scale)

    ref_loss = float(loss_fn(params, images, labels))

    with mesh:
        p_shard = param_shardings(mesh, params)
        o_shard = _opt_state_shardings(mesh, opt_state, params)
        sp = jax.tree.map(jax.device_put, params, p_shard)
        so = jax.tree.map(jax.device_put, opt_state, o_shard)
        step = make_sharded_train_step(mesh, model, tx, 3, cfg.l2_scale)(sp, so)
        simages = shard_batch(mesh, images)
        slabels = shard_batch(mesh, labels)
        new_params, new_opt, loss, cm = step(sp, so, simages, slabels, dropout_rng)

    assert np.isfinite(float(loss))
    # same forward loss as the unsharded computation (dropout rng identical)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    assert float(jnp.sum(cm)) == 8 * h * w
    # params actually updated
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        jax.tree.map(lambda a, b: a - b, new_params, sp),
        0.0,
    )
    assert delta > 0


@pytest.mark.heavy
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_entry_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_inference_matches_single_device():
    import dataclasses

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.parallel.inference import ShardedPipeline
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline

    base = munich_pipeline_config()
    cfg = munich_pipeline_config(
        input_height=128, input_width=256, approach="rw",
        road=dataclasses.replace(base.road, neighbor_capacity=2048),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    from semantic_depth_tpu.models import Monodepth

    mono = Monodepth(encoder="vgg", width_mult=0.0625)
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3)))
    pipe = SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

    mesh = make_mesh(8, dp=8, tp=1)
    sharded = ShardedPipeline(pipe, mesh)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(8, 256, 512, 3)).astype(np.uint8)
    out_sharded = sharded.process_batch(frames)
    out_single = pipe.process_batch(frames)
    np.testing.assert_allclose(
        np.asarray(out_sharded.disparity), np.asarray(out_single.disparity),
        rtol=1e-5, atol=1e-5,
    )
    a = np.asarray(out_sharded.dist_rw)
    b = np.asarray(out_single.dist_rw)
    both_nan = np.isnan(a) & np.isnan(b)
    np.testing.assert_allclose(a[~both_nan], b[~both_nan], rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_inference_matches_single_device():
    """(dp, sp) mesh: image rows sharded over 'sp' (GSPMD conv halo
    exchanges), batch over 'dp' — must agree with the single-device program
    on both the standard and the native input_s2d architectures."""
    import dataclasses

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import Monodepth
    from semantic_depth_tpu.parallel import make_spatial_mesh
    from semantic_depth_tpu.parallel.inference import ShardedPipeline
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline

    base = munich_pipeline_config()
    cfg = munich_pipeline_config(
        input_height=128, input_width=256, approach="rw",
        road=dataclasses.replace(base.road, neighbor_capacity=2048),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    mono = Monodepth(encoder="vgg", width_mult=0.0625)
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3)))
    pipe = SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

    mesh = make_spatial_mesh(8, dp=2, sp=4)
    assert mesh.shape == {"dp": 2, "sp": 4}
    sharded = ShardedPipeline(pipe, mesh)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(2, 256, 512, 3)).astype(np.uint8)
    out_sp = sharded.process_batch(frames)
    out_1 = pipe.process_batch(frames)
    np.testing.assert_allclose(
        np.asarray(out_sp.disparity), np.asarray(out_1.disparity),
        rtol=1e-5, atol=1e-5,
    )
    a, b = np.asarray(out_sp.dist_rw), np.asarray(out_1.dist_rw)
    both_nan = np.isnan(a) & np.isnan(b)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_allclose(a[~both_nan], b[~both_nan], rtol=1e-4)

    # frame height not divisible by sp -> usable error
    with pytest.raises(ValueError, match="sp=4"):
        sharded.process_batch(frames[:, :250])

    # the native input_s2d variant (the full-res mode's architecture) on an
    # all-spatial mesh — single-frame latency configuration
    ncfg = dataclasses.replace(
        cfg, input_height=256, input_width=512,
        monodepth=dataclasses.replace(cfg.monodepth, flip_average=False),
    )
    fcn_n = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32, input_s2d=True)
    mono_n = Monodepth(encoder="vgg", width_mult=0.0625, input_s2d=True)
    fpn = fcn_n.init(jax.random.PRNGKey(2), jnp.zeros((1, 256, 512, 3)))
    mpn = mono_n.init(jax.random.PRNGKey(3), jnp.zeros((2, 256, 512, 3)))
    pipe_n = SemanticDepthPipeline(ncfg, fpn, mpn, fcn=fcn_n, mono=mono_n)
    mesh_n = make_spatial_mesh(8)
    assert mesh_n.shape == {"dp": 1, "sp": 8}
    sharded_n = ShardedPipeline(pipe_n, mesh_n)
    frames_n = rng.integers(0, 256, size=(1, 256, 512, 3)).astype(np.uint8)
    out_nsp = sharded_n.process_batch(frames_n)
    out_n1 = pipe_n.process_batch(frames_n)
    np.testing.assert_allclose(
        np.asarray(out_nsp.disparity), np.asarray(out_n1.disparity),
        rtol=1e-5, atol=1e-5,
    )


def test_graft_entry_traces():
    """entry() must be jit-traceable with its example args (eval_shape only —
    full-size nets are too slow to actually compile in CI)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    shapes = jax.eval_shape(fn, *args)
    assert all(s.shape == () for s in shapes)


@pytest.mark.heavy
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_dryrun_multichip_small_counts():
    """The driver may probe various device counts; odd/small N must work."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry3", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(4)
    mod.dryrun_multichip(2)
    mod.dryrun_multichip(1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fcn_trainer_mesh_mode_matches_single_device():
    """FCNTrainer(mesh=...) — the cli.fcn --mesh path — must train with the
    sharded step and agree with the plain trainer on the same data/rng."""
    from semantic_depth_tpu.train.trainer import FCNTrainer

    cfg = TrainConfig(learning_rate=1e-3, batch_size=8, image_shape=(32, 64))
    model = FCN8s(num_classes=3, width_mult=0.25, fc_channels=128)
    mesh = make_mesh(8)

    plain = FCNTrainer(cfg, model=model, rng=jax.random.PRNGKey(7))
    sharded = FCNTrainer(cfg, model=model, rng=jax.random.PRNGKey(7), mesh=mesh)

    h, w = cfg.image_shape
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 255, (8, h, w, 3)), jnp.float32)
    labels = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, (8, h, w))), 3,
                            dtype=jnp.float32)

    for _ in range(2):
        m_plain = plain.train_batch(images, labels)
        m_shard = sharded.train_batch(images, labels)
    assert np.isfinite(m_shard["loss"])
    assert m_shard["loss"] == pytest.approx(m_plain["loss"], rel=1e-4)
    np.testing.assert_array_equal(m_shard["cm"].sum(), 8 * h * w)
    assert sharded.state.step == 2

    # the fc6 kernel really is tp-sharded on the mesh
    fc6 = sharded.state.params["params"]["fc6"]["kernel"]
    assert not fc6.sharding.is_fully_replicated

    # set_params re-shards and keeps training
    sharded.set_params(jax.device_get(plain.state.params))
    m2 = sharded.train_batch(images, labels)
    assert np.isfinite(m2["loss"])

    # ragged batches are rejected with a usable error at the call (a dataset
    # whose size isn't a multiple of batch_size yields one each epoch — fit()
    # drops them; construction itself must NOT raise, --mode test uses the
    # trainer with batch_size 1)
    with pytest.raises(ValueError, match="split over dp"):
        sharded.train_batch(images[:3], labels[:3])
    FCNTrainer(TrainConfig(learning_rate=1e-3, batch_size=1, image_shape=(32, 64)),
               model=model, mesh=mesh)  # test-mode construction works


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_monodepth_trainer_mesh_mode_matches_single_device():
    """MonodepthTrainer(mesh=...): stereo batch dp over all 8 devices —
    the TPU-native average_gradients.py analog — must match the
    single-device step numerically."""
    from semantic_depth_tpu.models import Monodepth
    from semantic_depth_tpu.train.monodepth_trainer import (
        MonodepthTrainConfig,
        MonodepthTrainer,
    )

    cfg = MonodepthTrainConfig(learning_rate=1e-4)
    model = Monodepth(encoder="vgg", width_mult=0.0625)
    mesh = make_mesh(8)

    plain = MonodepthTrainer(cfg, model=model, input_hw=(128, 256),
                             rng=jax.random.PRNGKey(3))
    sharded = MonodepthTrainer(cfg, model=model, input_hw=(128, 256),
                               rng=jax.random.PRNGKey(3), mesh=mesh)

    rng = np.random.default_rng(2)
    left = jnp.asarray(rng.uniform(0, 1, (8, 128, 256, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 1, (8, 128, 256, 3)), jnp.float32)

    for _ in range(2):
        m_plain = plain.train_batch(left, right)
        m_shard = sharded.train_batch(left, right)
    assert np.isfinite(m_shard["loss"])
    assert m_shard["loss"] == pytest.approx(m_plain["loss"], rel=1e-4)
    assert sharded.step == 2

    with pytest.raises(ValueError, match="multiple"):
        sharded.train_batch(left[:3], right[:3])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pipelined_inference_matches_single_device():
    """(dp, pp) mesh: GPipe-style staged serving (parallel/pp.py) must be the
    exact process_batch program per microbatch — FCN stage / monodepth(+
    geometry) stage(s) streaming over the ppermute ring — at pp=2 with dp,
    and at pp=3 (geometry split out)."""
    import dataclasses

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import Monodepth
    from semantic_depth_tpu.parallel import PipelinedPipeline, make_pp_mesh
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline

    base = munich_pipeline_config()
    cfg = munich_pipeline_config(
        input_height=128, input_width=256, approach="rw",
        road=dataclasses.replace(base.road, neighbor_capacity=2048),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    mono = Monodepth(encoder="vgg", width_mult=0.0625)
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3)))
    pipe = SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(8, 256, 512, 3)).astype(np.uint8)
    ref = pipe.process_batch(frames)

    for pp_size, dp, mb in ((2, 4, 4), (3, 1, 2)):
        mesh = make_pp_mesh(pp_size * dp, dp=dp, pp=pp_size)
        assert mesh.shape == {"dp": dp, "pp": pp_size}
        staged = PipelinedPipeline(pipe, mesh)
        out = staged.process_stream(frames, microbatch=mb)
        np.testing.assert_allclose(
            np.asarray(out.disparity), np.asarray(ref.disparity),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(out.road_mask), np.asarray(ref.road_mask)
        )
        a, b = np.asarray(out.dist_rw), np.asarray(ref.dist_rw)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        both_nan = np.isnan(a) & np.isnan(b)
        np.testing.assert_allclose(a[~both_nan], b[~both_nan], rtol=1e-4)

    # usable errors on bad stream/microbatch factorization
    staged = PipelinedPipeline(pipe, make_pp_mesh(8, dp=4, pp=2))
    with pytest.raises(ValueError, match="microbatch"):
        staged.process_stream(frames, microbatch=6)
    with pytest.raises(ValueError, match="not divisible"):
        staged.process_stream(frames[:6], microbatch=4)
    with pytest.raises(ValueError, match="pp"):
        PipelinedPipeline(pipe, make_mesh(8))  # no 'pp' axis
    with pytest.raises(ValueError, match="unsupported"):
        PipelinedPipeline(pipe, make_pp_mesh(8, dp=2, pp=4))
    # an odd/single device count can't default to pp=2: the error must name
    # the device-count requirement, not leave pp=1 for a confusing
    # downstream "pp=1 unsupported" (ADVICE r3)
    with pytest.raises(ValueError, match="even device count"):
        make_pp_mesh(7)
    with pytest.raises(ValueError, match="even device count"):
        make_pp_mesh(1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pp_output_stack_dealt_across_stages():
    """VERDICT r4 #6: the pp scan's stacked output must be dealt round-robin
    across stage devices — global leading axis S*ceil((T+S-1)/S) slots, NOT
    the old S*(T+S-1) full per-device copies — while process_stream still
    reassembles the exact frame order."""
    import dataclasses

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import Monodepth
    from semantic_depth_tpu.parallel import PipelinedPipeline, make_pp_mesh
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline, resolve_frame_scalars

    base = munich_pipeline_config()
    cfg = munich_pipeline_config(
        input_height=128, input_width=256, approach="rw",
        road=dataclasses.replace(base.road, neighbor_capacity=2048),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    mono = Monodepth(encoder="vgg", width_mult=0.0625)
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3)))
    pipe = SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(16, 256, 512, 3)).astype(np.uint8)
    mesh = make_pp_mesh(8, dp=4, pp=2)
    staged = PipelinedPipeline(pipe, mesh)

    # T=4 microbatches of 4, S=2 -> n_iter = ceil(5/2) = 3, 6 global slots
    mb, S, T = 4, 2, 4
    n_iter = -(-(T + S - 1) // S)
    focal, dmult = resolve_frame_scalars(cfg, frames.shape[2], None, None)
    stack = jnp.asarray(frames).reshape((T, mb) + frames.shape[1:])
    with mesh:
        raw = staged._fn(fp, mp, stack, jnp.float32(focal), jnp.float32(dmult))
    assert raw.dist_rw.shape[0] == S * n_iter  # 6, not S*(T+S-1) = 10

    # and the host reassembly still yields single-device results in order
    ref = pipe.process_batch(frames)
    out = staged.process_stream(frames, microbatch=mb)
    np.testing.assert_allclose(
        np.asarray(out.disparity), np.asarray(ref.disparity), rtol=1e-5, atol=1e-5
    )
    a, b = np.asarray(out.dist_rw), np.asarray(ref.dist_rw)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    ok = ~(np.isnan(a) & np.isnan(b))
    np.testing.assert_allclose(a[ok], b[ok], rtol=1e-4)
