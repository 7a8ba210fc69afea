"""Fused vocab+CE Pallas pair: math parity (interpret) + train-step wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.measure import sparse_categorical_crossentropy
from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.ops.pallas.ce_kernel import fused_ce_vocab
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

bf = jnp.bfloat16


def test_fused_ce_matches_reference_loss_and_grads():
    N, B, H, V = 3, 8, 16, 32
    rng = np.random.RandomState(0)
    hid = jnp.asarray(rng.randn(N, B, H).astype(np.float32) * 0.3, bf)
    W = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, jnp.float32)
    y = jnp.asarray(rng.randint(0, V, (N, B)), jnp.int32)
    y = jnp.where(jnp.asarray(rng.rand(N, B) > 0.2), y, 0)

    def ref_loss(hid, W, b):
        logits = hid @ W.astype(bf) + b.astype(bf)
        return sparse_categorical_crossentropy(y, logits, 0)

    def fused_loss(hid, W, b):
        return fused_ce_vocab(hid, W, b, y, 0)[0]

    l_ref, g_ref = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(hid, W, b)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(hid, W, b)
        _, preds = fused_ce_vocab(hid, W, b, y, 0)

    assert abs(float(l_ref) - float(l_f)) < 2e-3
    logits = np.asarray(hid @ W.astype(bf) + b.astype(bf), np.float32)
    assert np.array_equal(np.asarray(preds), logits.argmax(-1))
    for a, g in zip(g_ref, g_f):
        a, g = np.asarray(a, np.float32), np.asarray(g, np.float32)
        np.testing.assert_allclose(g, a, rtol=0, atol=2e-2 * (np.abs(a).max() + 1e-3))


@pytest.mark.parametrize("flag", ["0", "1"])
def test_train_step_fused_path_matches_plain(monkeypatch, flag):
    """On CPU the fused branch falls back to an explicit projection; the
    step must produce the same loss/metrics/params as the plain path."""
    monkeypatch.setenv("SRT_FUSED_CE", flag)
    model = LAS("lstm", 40, 8, 8, 1, 1, 0.0, 1.0)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.uniform(rng, (2, 24, 10, 3), minval=0.1)
    tokens = jnp.array([[1, 5, 6, 2], [1, 7, 2, 0]], jnp.int32)
    variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
    tx = optax.sgd(1e-2)
    fresh = lambda: jax.tree.map(jnp.array, dict(variables))  # donation-proof
    state = TrainState.create(fresh(), tx)
    step = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )
    new_state, metrics = step(state, (audio, tokens[:, :-1]), tokens[:, 1:], rng)
    # pin against the flag=0 run via a second fresh computation
    monkeypatch.setenv("SRT_FUSED_CE", "0")
    state2 = TrainState.create(fresh(), tx)
    step2 = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )
    ref_state, ref_metrics = step2(state2, (audio, tokens[:, :-1]), tokens[:, 1:], rng)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-6, atol=1e-6
    )
    for k in ref_metrics:
        np.testing.assert_allclose(float(metrics[k]), float(ref_metrics[k]), rtol=1e-6, atol=1e-6)
    for a, g in zip(
        jax.tree_util.tree_leaves(ref_state.params), jax.tree_util.tree_leaves(new_state.params)
    ):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a), rtol=1e-6, atol=1e-6)
