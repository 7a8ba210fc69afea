"""Numerical parity of our scan recurrences against Keras cells, and the TF
checkpoint converter against the reference's shipped checkpoints.

These are the weight-compatibility gates: identical parameter arrays must
produce identical outputs (so the reference's published LAS-small weights
transfer losslessly).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from speech_recognition_tpu.ops.rnn import RNN

# slow tier: excluded from the default run (pyproject addopts); run with
# `-m interferable` or `-m ""` — Keras cell parity (TF)
pytestmark = pytest.mark.interferable

REF_CKPT_DIR = "/root/reference/tests/data/model-checkpoints"


def _keras_rnn(rnn_type, units):
    cls = {"rnn": tf.keras.layers.SimpleRNN, "lstm": tf.keras.layers.LSTM, "gru": tf.keras.layers.GRU}
    return cls[rnn_type](units, return_sequences=True, return_state=True)


@pytest.mark.parametrize("rnn_type", ["rnn", "lstm", "gru"])
@pytest.mark.parametrize("go_backwards", [False, True])
def test_rnn_matches_keras(rnn_type, go_backwards):
    rng = np.random.default_rng(0)
    B, T, D, H = 3, 7, 5, 4
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    keras_layer = _keras_rnn(rnn_type, H)
    keras_layer.build((None, T, D))
    weights = keras_layer.get_weights()

    ours = RNN(rnn_type, H, reverse=go_backwards)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.ones((B, T), bool))
    # install the exact Keras arrays into our pytree
    params = dict(variables["params"])
    cell = dict(params["cell"])
    cell["kernel"] = jnp.asarray(weights[0])
    cell["recurrent_kernel"] = jnp.asarray(weights[1])
    if len(weights) > 2:
        cell["bias"] = jnp.asarray(weights[2])
    params["cell"] = cell
    out, state = ours.apply({"params": params}, jnp.asarray(x), jnp.ones((B, T), bool))

    x_tf = tf.constant(x[:, ::-1] if go_backwards else x)
    keras_out, *keras_state = keras_layer(x_tf)
    keras_out = keras_out.numpy()
    if go_backwards:
        keras_out = keras_out[:, ::-1]
    np.testing.assert_allclose(np.asarray(out), keras_out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state[0]), keras_state[0].numpy(), rtol=1e-5, atol=1e-5)
    if rnn_type == "lstm":
        np.testing.assert_allclose(np.asarray(state[1]), keras_state[1].numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_rnn_masked_matches_keras(rnn_type):
    """Keras mask semantics: masked steps leave the state untouched."""
    rng = np.random.default_rng(1)
    B, T, D, H = 2, 6, 3, 4
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    lengths = np.array([6, 4])
    mask = np.arange(T)[None, :] < lengths[:, None]

    keras_layer = _keras_rnn(rnn_type, H)
    keras_layer.build((None, T, D))
    weights = keras_layer.get_weights()

    ours = RNN(rnn_type, H)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    params = {"cell": {"kernel": jnp.asarray(weights[0]), "recurrent_kernel": jnp.asarray(weights[1]), "bias": jnp.asarray(weights[2])}}
    out, state = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))

    keras_out, *keras_state = keras_layer(tf.constant(x), mask=tf.constant(mask))
    # compare on valid positions and final states
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out)[b, :L], keras_out.numpy()[b, :L], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state[0]), keras_state[0].numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
@pytest.mark.parametrize("reverse", [False, True])
def test_rnn_custom_vjp_matches_autodiff(rnn_type, reverse):
    """The hoisted-dW custom VJP must produce the same outputs AND gradients
    as XLA autodiff through the plain scan, including masked steps."""
    import jax
    import os

    rng = np.random.default_rng(3)
    T, B, D, H = 9, 4, 5, 6
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lengths = np.array([9, 7, 4, 1])
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])

    layer = RNN(rnn_type, H, reverse=reverse)
    variables = layer.init(jax.random.PRNGKey(0), x, mask)

    def loss(variables, x, enabled):
        os.environ["SRT_LSTM_CUSTOM_VJP"] = enabled
        try:
            out, state = layer.apply(variables, x, mask)
        finally:
            os.environ.pop("SRT_LSTM_CUSTOM_VJP", None)
        total = out.sum() * 0.3 + sum((i + 2) * 0.1 * s.sum() for i, s in enumerate(state))
        return total, out

    (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(variables, x, "1")
    (l0, o0), g0 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(variables, x, "0")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_CKPT_DIR), reason="reference checkpoints unavailable")
def test_convert_las_checkpoint():
    from speech_recognition_tpu.compat import convert_tf_checkpoint
    from speech_recognition_tpu.models import LAS

    converted = convert_tf_checkpoint(os.path.join(REF_CKPT_DIR, "las.ckpt"))

    model = LAS("lstm", 3000, 16, 16, 1, 1, 0.15, 1.0)
    audio = jnp.zeros((2, 24, 80, 3))
    tokens = jnp.zeros((2, 5), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, (audio, tokens))

    # structures must match exactly (every TF variable consumed, none missing)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert ref_paths == conv_paths

    # shapes must line up, and the converted weights must run
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape), variables, converted)
    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    out = model.apply(converted, (jax.random.normal(jax.random.PRNGKey(1), (2, 24, 80, 3)), tokens))
    assert out.shape == (2, 5, 3000) and bool(jnp.isfinite(out).all())


@pytest.mark.skipif(not os.path.isdir(REF_CKPT_DIR), reason="reference checkpoints unavailable")
def test_convert_ds_checkpoint():
    from speech_recognition_tpu.compat import convert_tf_checkpoint
    from speech_recognition_tpu.models import DeepSpeech2

    converted = convert_tf_checkpoint(os.path.join(REF_CKPT_DIR, "ds.ckpt"))
    model = DeepSpeech2(1, (32,), ((41, 11),), ((2, 2),), "rnn", 7, 32, 0.1, 0.0, 120, 14)
    audio = jnp.zeros((1, 100, 80, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, audio)

    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert ref_paths == conv_paths
    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    out = model.apply(converted, jax.random.uniform(jax.random.PRNGKey(1), (1, 100, 80, 3)))
    assert out.shape[0] == 1 and out.shape[2] == 120 and bool(jnp.isfinite(out).all())
