"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

Covers SURVEY.md §4's gap: the reference had zero distributed tests; here
data-parallel training is validated numerically — the sharded step must
produce the same loss and updated parameters as the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speech_recognition_tpu.models import DeepSpeech2, LAS
from speech_recognition_tpu.parallel import get_device_mesh, shard_batch, shard_params
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _make_ds2_setup():
    model = DeepSpeech2(1, (4,), ((11, 5),), ((2, 2),), "gru", 1, 8, 0.0, 0.0, 32, 14)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.uniform(rng, (8, 64, 12, 1), minval=0.1)
    tokens = jax.random.randint(rng, (8, 6), 1, 13)
    variables = model.init({"params": rng}, audio)
    tx = optax.adam(linear_warmup_decay(100, 1e-3, 1e-5))
    return model, audio, tokens, variables, tx


def test_dp_matches_single_device(eight_devices):
    model, audio, tokens, variables, tx = _make_ds2_setup()
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    rng = jax.random.PRNGKey(42)

    def fresh(v):
        # train steps donate their state buffers; each state needs its own copy
        return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), dict(v))

    # single device
    state1 = TrainState.create(fresh(variables), tx)
    state1, m1 = step(state1, audio, tokens, rng)

    # 8-way data parallel
    mesh = get_device_mesh(data_parallel=8, model_parallel=1, devices=eight_devices)
    state8 = TrainState.create(fresh(variables), tx)
    state8 = state8.replace(
        params=shard_params(state8.params, mesh),
        batch_stats=shard_params(state8.batch_stats, mesh),
        opt_state=shard_params(state8.opt_state, mesh),
    )
    audio_s = shard_batch(audio, mesh)
    tokens_s = shard_batch(tokens, mesh)
    state8, m8 = step(state8, audio_s, tokens_s, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_tensor_parallel_las_runs(eight_devices):
    """dp x tp mesh: vocab-dimension params sharded over 'model'."""
    mesh = get_device_mesh(data_parallel=4, model_parallel=2, devices=eight_devices)
    model = LAS("gru", 64, 8, 8, 1, 1, 0.0, 1.0)
    rng = jax.random.PRNGKey(1)
    audio = jax.random.uniform(rng, (4, 24, 10, 3), minval=0.1)
    tokens = jax.random.randint(rng, (4, 5), 1, 64)
    variables = model.init({"params": rng}, (audio, tokens))

    tx = optax.adam(linear_warmup_decay(100, 1e-3, 1e-5))
    state = TrainState.create(dict(variables), tx)
    state = state.replace(
        params=shard_params(state.params, mesh, tensor_parallel=True),
        batch_stats=shard_params(state.batch_stats, mesh),
        opt_state=shard_params(state.opt_state, mesh, tensor_parallel=True),
    )
    # the vocab projection kernel must actually be sharded over 'model'
    ff = state.params["attend_and_speller"]["feedforward"]["kernel"]
    assert "model" in str(ff.sharding)

    step = make_train_step(model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True)
    mi = shard_batch((audio, tokens[:, :-1]), mesh)
    y = shard_batch(tokens[:, 1:], mesh)
    state, metrics = step(state, mi, y, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_tensor_parallel_matches_single_device(eight_devices):
    """dp x tp must be numerically equivalent to single-device training, not
    just finite (VERDICT: mirror the DP equivalence pattern on the tp mesh).

    Uses teacher_forcing_rate=1.0 so the decoder path is static (no coin) —
    the per-batch Bernoulli would consume RNG identically on both sides, but
    static TF keeps the comparison about sharding, not sampling.
    """
    model = LAS("gru", 64, 8, 8, 1, 1, 0.0, 1.0)
    rng = jax.random.PRNGKey(1)
    audio = jax.random.uniform(rng, (8, 24, 10, 3), minval=0.1)
    tokens = jax.random.randint(rng, (8, 5), 1, 64)
    variables = model.init({"params": rng}, (audio, tokens))
    # SGD, not Adam: with near-zero gradients Adam's update is +-lr * sign(g),
    # so float reduction-order noise between meshes flips whole updates; SGD
    # keeps the comparison proportional to the actual gradient difference.
    tx = optax.sgd(0.1)
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True)
    step_rng = jax.random.PRNGKey(2)

    def fresh(v):
        return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), dict(v))

    state1 = TrainState.create(fresh(variables), tx)
    state1, m1 = step(state1, (audio, tokens[:, :-1]), tokens[:, 1:], step_rng)

    mesh = get_device_mesh(data_parallel=4, model_parallel=2, devices=eight_devices)
    state_tp = TrainState.create(fresh(variables), tx)
    state_tp = state_tp.replace(
        params=shard_params(state_tp.params, mesh, tensor_parallel=True),
        batch_stats=shard_params(state_tp.batch_stats, mesh),
        opt_state=shard_params(state_tp.opt_state, mesh, tensor_parallel=True),
    )
    mi = shard_batch((audio, tokens[:, :-1]), mesh)
    y = shard_batch(tokens[:, 1:], mesh)
    state_tp, m_tp = step(state_tp, mi, y, step_rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["accuracy_sum"]), float(m_tp["accuracy_sum"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(state_tp.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_shard_batch_places_on_data_axis(eight_devices):
    mesh = get_device_mesh(data_parallel=8, model_parallel=1, devices=eight_devices)
    x = np.zeros((16, 4), np.float32)
    placed = shard_batch(x, mesh)
    assert "data" in str(placed.sharding)


def test_sharded_decode_matches_single_device(eight_devices):
    """run.common.sharded_decode_fn: SPMD greedy decode over the 'data' axis
    must produce exactly the single-device tokens (both models)."""
    from speech_recognition_tpu.parallel import set_active_mesh
    from speech_recognition_tpu.run.common import sharded_decode_fn
    from speech_recognition_tpu.search import DeepSpeechSearcher, LASSearcher

    rng = jax.random.PRNGKey(3)
    try:
        # LAS greedy
        set_active_mesh(None)
        las = LAS("gru", 32, 8, 8, 1, 1, 0.0, 1.0)
        audio = jax.random.uniform(rng, (8, 24, 10, 3), minval=0.1)
        variables = las.init({"params": rng}, (audio, jnp.zeros((8, 4), jnp.int32)))
        searcher = LASSearcher(las, variables, 6, bos_id=1, eos_id=2)
        plain = lambda a: searcher.greedy_search(a)[0]
        ref = np.asarray(plain(audio))
        wrapped, mesh = sharded_decode_fn(plain, batch_size=8)
        assert mesh is not None and mesh.shape["data"] == 8
        np.testing.assert_array_equal(np.asarray(wrapped(np.asarray(audio))), ref)

        # DS2 CTC greedy
        set_active_mesh(None)
        ds2 = DeepSpeech2(1, (4,), ((11, 5),), ((2, 2),), "gru", 1, 8, 0.0, 0.0, 32, 14)
        audio2 = jax.random.uniform(rng, (8, 64, 12, 1), minval=0.1)
        vars2 = ds2.init({"params": rng}, audio2)
        searcher2 = DeepSpeechSearcher(ds2, vars2, blank_index=0)
        plain2 = lambda a: searcher2.greedy_search(a)[0]
        ref2 = np.asarray(plain2(audio2))
        wrapped2, mesh2 = sharded_decode_fn(plain2, batch_size=8)
        assert mesh2 is not None
        np.testing.assert_array_equal(np.asarray(wrapped2(np.asarray(audio2))), ref2)

        # batch not divisible beyond 1 -> identity (no mesh)
        _, no_mesh = sharded_decode_fn(plain, batch_size=1)
        assert no_mesh is None

        # raw mode: the decode fn takes an (audio, lengths) tuple batch —
        # shard_batch must shard both leaves over 'data'
        set_active_mesh(None)
        lengths = jnp.full((8,), 24, jnp.int32)
        raw_fn = lambda batch: searcher.greedy_search(batch[0])[0]
        raw_ref = np.asarray(raw_fn((audio, lengths)))
        raw_wrapped, raw_mesh = sharded_decode_fn(raw_fn, batch_size=8)
        assert raw_mesh is not None
        np.testing.assert_array_equal(
            np.asarray(raw_wrapped((np.asarray(audio), np.asarray(lengths)))), raw_ref
        )
    finally:
        set_active_mesh(None)


def test_tensor_parallel_transducer_matches_single_device(eight_devices):
    """Transducer dp x tp == single-device: joint_kernel columns and the
    token embedding rows shard over 'model' (parallel/mesh.py _TP_PATTERNS),
    the streamed lattice loss (ops/transducer.py) reduces identically."""
    from speech_recognition_tpu.models import Transducer

    model = Transducer(
        vocab_size=32, encoder_dim=16, num_encoder_layers=1, num_attention_heads=2,
        conv_kernel_size=5, ffn_expansion=2, subsample_channels=(4,),
        pred_dim=8, num_pred_layers=1, joint_dim=8, dropout=0.0,
    )
    rng = jax.random.PRNGKey(3)
    audio = jax.random.uniform(rng, (8, 40, 12, 3), minval=0.1)
    tokens = jax.random.randint(rng, (8, 6), 3, 32)
    tokens = tokens.at[:, 0].set(1).at[:, -1].set(2)  # BOS ... EOS
    model_input, y_true = (audio, tokens[:, :-1]), tokens[:, 1:]
    variables = model.init({"params": rng}, model_input)
    tx = optax.sgd(0.1)
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())

    def fresh(v):
        return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), dict(v))

    state1 = TrainState.create(fresh(variables), tx)
    state1, m1 = step(state1, model_input, y_true, jax.random.PRNGKey(4))

    mesh = get_device_mesh(data_parallel=4, model_parallel=2, devices=eight_devices)
    state_tp = TrainState.create(fresh(variables), tx)
    state_tp = state_tp.replace(
        params=shard_params(state_tp.params, mesh, tensor_parallel=True),
        opt_state=shard_params(state_tp.opt_state, mesh, tensor_parallel=True),
    )
    assert "model" in str(state_tp.params["joint_kernel"].sharding.spec)
    assert "model" in str(state_tp.params["embedding"]["embedding"].sharding.spec)
    state_tp, m_tp = step(
        state_tp, shard_batch(model_input, mesh), shard_batch(y_true, mesh), jax.random.PRNGKey(4)
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(state_tp.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
