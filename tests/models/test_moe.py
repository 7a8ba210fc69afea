"""DS2-MoE (models/moe.py + deepspeech2.py moe_experts) pins.

The MoE trunk is beyond parity (the reference trunk is dense,
reference models/deepspeech2.py:81-119): these tests pin that (a) the
default config is bit-compatible with the parity architecture, (b) padding
frames are routing-invisible, (c) the aux loss reaches the train objective,
and (d) expert-parallel dispatch on a dp x tp mesh matches the dense form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speech_recognition_tpu.models import DeepSpeech2
from speech_recognition_tpu.models.moe import MoELayer
from speech_recognition_tpu.parallel import get_device_mesh, set_active_mesh, shard_batch
from speech_recognition_tpu.train import TrainState, make_train_step


def _ds2(**moe):
    return DeepSpeech2(
        1, (4,), ((11, 5),), ((2, 2),), "gru", 2, 8, 0.0, 0.0, 32, 14, **moe
    )


MOE = dict(moe_experts=4, moe_hidden_dim=32, moe_capacity_factor=4.0)


def test_moe_layer_mask_and_pad_invariance():
    layer = MoELayer(n_experts=4, hidden_dim=16, capacity_factor=2.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 10, 8))
    mask = jnp.ones((2, 10), bool)
    variables = layer.init(rng, x, mask)
    out = layer.apply(variables, x, mask)
    assert out.shape == x.shape

    # masked tokens: identity residual (never dispatched)
    x_pad = jnp.concatenate([x, jax.random.normal(rng, (2, 4, 8))], axis=1)
    mask_pad = jnp.concatenate([mask, jnp.zeros((2, 4), bool)], axis=1)
    out_pad = layer.apply(variables, x_pad, mask_pad)
    np.testing.assert_array_equal(np.asarray(out_pad[:, 10:]), np.asarray(x_pad[:, 10:]))
    # real tokens: routing unaffected by padding (pads consume no capacity)
    np.testing.assert_allclose(np.asarray(out_pad[:, :10]), np.asarray(out), rtol=1e-6, atol=1e-6)


def test_default_config_keeps_parity_param_tree():
    dense, moe = _ds2(), _ds2(**MOE)
    rng = jax.random.PRNGKey(1)
    audio = jax.random.uniform(rng, (2, 64, 12, 1), minval=0.1)
    vd = dense.init({"params": rng}, audio)
    vm = moe.init({"params": rng}, audio)
    assert "moe0" not in vd["params"]["recurrent"]
    assert "moe0" in vm["params"]["recurrent"] and "moe1" in vm["params"]["recurrent"]
    # the dense leaves keep their names (checkpoint layout unchanged)
    dense_keys = set(vd["params"]["recurrent"].keys())
    assert dense_keys <= set(vm["params"]["recurrent"].keys())
    # logits shapes agree
    assert moe.apply({k: vm[k] for k in ("params", "batch_stats")}, audio).shape == \
        dense.apply({k: vd[k] for k in ("params", "batch_stats")}, audio).shape


def test_train_step_adds_aux_loss():
    """The sown load-balancing loss must reach the objective: two models
    identical except aux_weight produce losses differing by exactly the
    (positive) weighted aux term."""
    rng = jax.random.PRNGKey(2)
    audio = jax.random.uniform(rng, (4, 64, 12, 1), minval=0.1)
    tokens = jax.random.randint(rng, (4, 6), 1, 13)

    losses = {}
    for w in (0.0, 1.0):
        model = _ds2(**{**MOE, "moe_aux_weight": w})
        variables = model.init({"params": rng}, audio)
        state = TrainState.create(dict(variables), optax.adam(1e-3))
        step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
        _, metrics = step(state, audio, tokens, jax.random.PRNGKey(3))
        losses[w] = float(metrics["loss"])
    # aux = E * sum(f * p) >= 1 at balanced routing; strictly > 0 always
    assert losses[1.0] > losses[0.0] + 0.5
    assert np.isfinite(losses[1.0])


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_ep_dispatch_matches_dense_forward(eight_devices, monkeypatch):
    """On a dp x tp mesh whose 'model' axis divides the experts, MoELayer
    routes through expert_parallel_moe (dispatch spy asserts it) — logits
    must match the dense single-device forward."""
    import speech_recognition_tpu.models.moe as moe_mod

    calls = []
    orig = moe_mod.expert_parallel_moe
    monkeypatch.setattr(
        moe_mod, "expert_parallel_moe", lambda *a, **k: calls.append(1) or orig(*a, **k)
    )
    model = _ds2(**MOE)
    rng = jax.random.PRNGKey(4)
    audio = jax.random.uniform(rng, (8, 64, 12, 1), minval=0.1)
    try:
        set_active_mesh(None)
        variables = model.init({"params": rng}, audio)
        v = {k: variables[k] for k in ("params", "batch_stats")}
        want = model.apply(v, audio)
        assert not calls  # no mesh -> dense form

        mesh = get_device_mesh(data_parallel=4, model_parallel=2, devices=eight_devices)
        got = jax.jit(lambda v, a: model.apply(v, a))(v, shard_batch(audio, mesh))
        assert len(calls) == 2  # one per trunk layer
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    finally:
        set_active_mesh(None)
