"""Fused vocab+CTC-emissions Pallas pair: math parity + train-step wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.measure import _emission_logprobs, ctc_loss, ctc_loss_from_hidden
from speech_recognition_tpu.models import DeepSpeech2
from speech_recognition_tpu.ops.pallas.ctc_kernel import fused_vocab_emissions
from speech_recognition_tpu.train import TrainState, make_train_step

bf = jnp.bfloat16


def test_fused_emissions_match_reference_and_grads():
    B, T, H, V, K = 3, 8, 16, 32, 5
    rng = np.random.RandomState(0)
    hid = jnp.asarray(rng.randn(B, T, H).astype(np.float32) * 0.3, bf)
    W = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, (B, K)), jnp.int32)
    dem = jnp.asarray(rng.randn(B, T, K).astype(np.float32) * 0.5)

    def ref(hid, W, b):
        logits = hid @ W.astype(bf) + b.astype(bf)
        return jnp.sum(_emission_logprobs(logits, ids) * dem)

    def fused(hid, W, b):
        return jnp.sum(fused_vocab_emissions(hid, W, b, ids) * dem)

    l_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1, 2))(hid, W, b)
    with pltpu.force_tpu_interpret_mode():
        e_f = fused_vocab_emissions(hid, W, b, ids)
        l_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2))(hid, W, b)

    logits = hid @ W.astype(bf) + b.astype(bf)
    e_ref = np.asarray(_emission_logprobs(logits, ids), np.float32)
    np.testing.assert_allclose(np.asarray(e_f), e_ref, rtol=0, atol=5e-3)
    assert abs(float(l_ref) - float(l_f)) < 5e-2
    for a, g in zip(g_ref, g_f):
        a, g = np.asarray(a, np.float32), np.asarray(g, np.float32)
        np.testing.assert_allclose(g, a, rtol=0, atol=3e-2 * (np.abs(a).max() + 1e-3))


def test_ctc_loss_from_hidden_matches_plain():
    """The XLA fallback inside ctc_loss_from_hidden must equal the plain
    projection + ctc_loss composition exactly (it is the same math)."""
    B, T, H, V, N = 2, 12, 8, 30, 4
    rng = np.random.RandomState(1)
    hid = jnp.asarray(rng.randn(B, T, H).astype(np.float32) * 0.3)
    W = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1)
    y = jnp.asarray([[3, 5, 2, 0], [7, 7, 1, 4]], jnp.int32)
    logits = hid @ W + b
    ref = ctc_loss(y, logits, blank_index=14, pad_index=0)
    got = ctc_loss_from_hidden(y, hid, W, b, blank_index=14, pad_index=0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("flag", ["0", "1"])
def test_ds2_train_step_fused_path_matches_plain(monkeypatch, flag):
    """On CPU the fused branch falls back to the explicit projection; the
    step must produce the same loss and params as the plain path."""
    monkeypatch.setenv("SRT_FUSED_CTC", flag)
    model = DeepSpeech2(1, (4,), ((11, 5),), ((2, 2),), "gru", 1, 16, 0.0, 0.0, 30, 14)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.uniform(rng, (2, 32, 10, 1), minval=0.1)
    tokens = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    variables = model.init({"params": rng}, audio)
    tx = optax.sgd(1e-2)
    fresh = lambda: jax.tree.map(jnp.array, dict(variables))
    state = TrainState.create(fresh(), tx)
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    new_state, metrics = step(state, audio, tokens, rng)

    monkeypatch.setenv("SRT_FUSED_CTC", "0")
    state2 = TrainState.create(fresh(), tx)
    step2 = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    ref_state, ref_metrics = step2(state2, audio, tokens, rng)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-6, atol=1e-6
    )
    for a, g in zip(
        jax.tree_util.tree_leaves(ref_state.params), jax.tree_util.tree_leaves(new_state.params)
    ):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a), rtol=1e-6, atol=1e-6)
