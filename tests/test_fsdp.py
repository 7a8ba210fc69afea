"""FSDP (ZeRO-3 parameter + optimizer-state sharding) equivalence pins.

shard_params(fsdp=True) is a pure re-placement: the train step must produce
the same loss and updated parameters as fully-replicated DP — XLA derives
the all-gather / reduce-scatter schedule from the input shardings alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.parallel import (
    fsdp_spec,
    get_device_mesh,
    shard_batch,
    shard_params,
)
from speech_recognition_tpu.train import TrainState, make_train_step


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_fsdp_spec_picks_largest_divisible_axis():
    x = jnp.zeros((128, 48, 3))
    assert fsdp_spec(x, 8, min_size=1) == P("data", None, None)
    # largest axis (20) not divisible by 8 -> next largest (16) shards
    y = jnp.zeros((20, 16))
    assert fsdp_spec(y, 8, min_size=1) == P(None, "data")
    # nothing divisible -> replicated
    assert fsdp_spec(jnp.zeros((3, 5)), 8, min_size=1) == P(None, None)
    # below min_size -> replicated
    assert fsdp_spec(x, 8, min_size=10**9) == P(None, None, None)
    # scalars -> replicated
    assert fsdp_spec(jnp.zeros(()), 8, min_size=1) == P()


def _las_setup():
    model = LAS("gru", 64, 8, 8, 1, 1, 0.0, 1.0)
    rng = jax.random.PRNGKey(1)
    audio = jax.random.uniform(rng, (8, 24, 10, 3), minval=0.1)
    tokens = jax.random.randint(rng, (8, 5), 1, 64)
    variables = model.init({"params": rng}, (audio, tokens))
    return model, audio, tokens, variables


def _fresh(v):
    # train steps donate their state buffers; each state needs its own copy
    return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), dict(v))


def test_fsdp_matches_single_device(eight_devices):
    model, audio, tokens, variables = _las_setup()
    # SGD, not Adam: sign-flip sensitivity near zero gradients (see
    # test_tensor_parallel_matches_single_device) would dominate the check
    tx = optax.sgd(0.1)
    step = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )
    step_rng = jax.random.PRNGKey(2)

    state1 = TrainState.create(_fresh(variables), tx)
    state1, m1 = step(state1, (audio, tokens[:, :-1]), tokens[:, 1:], step_rng)

    mesh = get_device_mesh(data_parallel=4, model_parallel=1, devices=eight_devices[:4])
    state_f = TrainState.create(_fresh(variables), tx)
    state_f = state_f.replace(
        params=shard_params(state_f.params, mesh, fsdp=True, fsdp_min_size=8),
        batch_stats=shard_params(state_f.batch_stats, mesh),
        opt_state=shard_params(state_f.opt_state, mesh, fsdp=True, fsdp_min_size=8),
    )
    # the embedding must actually be sharded over 'data' (vocab axis 64 % 4 == 0)
    emb = state_f.params["attend_and_speller"]["embedding"]["embedding"]
    assert "data" in str(emb.sharding.spec)

    mi = shard_batch((audio, tokens[:, :-1]), mesh)
    y = shard_batch(tokens[:, 1:], mesh)
    state_f, m_f = step(state_f, mi, y, step_rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m_f["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(state_f.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fsdp_state_checkpoints_roundtrip(eight_devices, tmp_path):
    """FSDP-sharded params must save (gather) and restore bit-identically —
    the checkpoint layer is sharding-agnostic."""
    from speech_recognition_tpu.train import restore_weights, save_weights

    _, _, _, variables = _las_setup()
    mesh = get_device_mesh(data_parallel=4, model_parallel=1, devices=eight_devices[:4])
    sharded = shard_params(dict(variables)["params"], mesh, fsdp=True, fsdp_min_size=8)
    emb = sharded["attend_and_speller"]["embedding"]["embedding"]
    assert "data" in str(emb.sharding.spec)
    save_weights(str(tmp_path / "ckpt"), {"params": sharded})
    restored = restore_weights(str(tmp_path / "ckpt"), template={"params": sharded})
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["params"]), jax.tree_util.tree_leaves(sharded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_composes_with_tensor_parallel(eight_devices):
    """dp x tp mesh with fsdp: vocab params keep their 'model' sharding, the
    rest of the large leaves shard over 'data'; adam state shards like its
    parameters and the step still runs."""
    model, audio, tokens, variables = _las_setup()
    tx = optax.adam(1e-3)
    mesh = get_device_mesh(data_parallel=4, model_parallel=2, devices=eight_devices)
    state = TrainState.create(dict(variables), tx)
    state = state.replace(
        params=shard_params(state.params, mesh, tensor_parallel=True, fsdp=True, fsdp_min_size=8),
        batch_stats=shard_params(state.batch_stats, mesh),
        opt_state=shard_params(state.opt_state, mesh, tensor_parallel=True, fsdp=True, fsdp_min_size=8),
    )
    emb = state.params["attend_and_speller"]["embedding"]["embedding"]
    assert "model" in str(emb.sharding.spec)  # TP wins on vocab params
    ih = state.params["listener"]["encoder_layer0"]["forward_rnn"]["cell"]["kernel"]
    assert "data" in str(ih.sharding.spec)  # FSDP shards the rest
    # adam moments shard exactly like their parameters (shape-derived spec)
    mu_ih = jax.tree_util.tree_leaves(
        [s for s in state.opt_state if hasattr(s, "mu")][0].mu["listener"]["encoder_layer0"]
    )
    assert any("data" in str(l.sharding.spec) for l in mu_ih)

    step = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )
    mi = shard_batch((audio, tokens[:, :-1]), mesh)
    y = shard_batch(tokens[:, 1:], mesh)
    state, metrics = step(state, mi, y, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
