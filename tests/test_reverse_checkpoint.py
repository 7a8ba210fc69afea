"""Reverse checkpoint interop (JAX -> TF): a model trained HERE can be
handed back to the reference ecosystem (VERDICT r4 #3).

The mirror of tests/test_model_parity.py: initialize OUR mini LAS / DS2
with random weights, export with ``save_tf_checkpoint``, load the export
into the REFERENCE TF models (/root/reference/speech_recognition/models),
and assert logits + greedy-decode parity on padded and unpadded batches.
Plus the lossless round-trip law:
``convert_tf_checkpoint(save_tf_checkpoint(v)) == v`` bit-for-bit.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

REFERENCE_DIR = "/root/reference"

pytestmark = [
    # slow tier: excluded from the default run (pyproject addopts)
    pytest.mark.interferable,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE_DIR, "speech_recognition")),
        reason="reference package unavailable",
    ),
]

if REFERENCE_DIR not in sys.path:
    sys.path.insert(0, REFERENCE_DIR)


def _assign_tf_weights(root, ckpt_path):
    """Attribute-path assignment (same loader as test_model_parity.py — the
    faithful restore path in this Keras-3 environment, where object-graph
    restore leaves the reference's own checkpoints silently unbound)."""
    reader = tf.train.load_checkpoint(ckpt_path)
    suffix = "/.ATTRIBUTES/VARIABLE_VALUE"
    n = 0
    for key in reader.get_variable_to_shape_map():
        if not key.endswith(suffix):
            continue
        parts = key[: -len(suffix)].split("/")
        obj = root
        for part in parts[:-1]:
            obj = obj[int(part)] if part.isdigit() else getattr(obj, part)
        getattr(obj, parts[-1]).assign(reader.get_tensor(key))
        n += 1
    assert n >= 20, f"only assigned {n} weights"


def _random_features(rng, batch, time, freq=80, feat=3, lengths=None):
    audio = rng.standard_normal((batch, time, freq, feat)).astype(np.float32)
    if lengths is not None:
        for i, n in enumerate(lengths):
            audio[i, n:] = 0.0
    return audio


def _our_las_variables(seed=0):
    from speech_recognition_tpu.models import LAS

    ours = LAS("lstm", 3000, 16, 16, 1, 1, 0.15, 1.0)
    audio = jnp.zeros((1, 24, 80, 3))
    tokens = jnp.zeros((1, 5), jnp.int32)
    variables = ours.init({"params": jax.random.PRNGKey(seed)}, (audio, tokens))
    return ours, dict(variables)


@pytest.fixture(scope="module")
def exported_las(tmp_path_factory):
    """(ref TF LAS loaded from OUR export, our LAS, our variables)."""
    from speech_recognition.models import LAS as RefLAS  # reference package

    from speech_recognition_tpu.compat import save_tf_checkpoint

    ours, variables = _our_las_variables()
    path = str(tmp_path_factory.mktemp("rev") / "las_export")
    save_tf_checkpoint(variables, path)

    ref = RefLAS("lstm", 3000, 16, 16, 1, 1, 0.15, 1.0)
    ref((tf.zeros((1, 24, 80, 3)), tf.zeros((1, 5), tf.int32)), training=False)
    _assign_tf_weights(ref, path)
    return ref, ours, variables


def test_round_trip_is_lossless(tmp_path):
    """convert(save(v)) == v bit-for-bit, for every leaf of both
    collections — the mapping is a bijection."""
    from speech_recognition_tpu.compat import convert_tf_checkpoint, save_tf_checkpoint

    _, variables = _our_las_variables(seed=3)
    path = str(tmp_path / "rt")
    save_tf_checkpoint(variables, path)
    back = convert_tf_checkpoint(path)

    want = jax.tree_util.tree_map(np.asarray, variables)
    flat_w, tree_w = jax.tree_util.tree_flatten(want)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_w == tree_b, f"tree structure drifted:\n{tree_w}\nvs\n{tree_b}"
    for a, b in zip(flat_w, flat_b):
        np.testing.assert_array_equal(a, b)


def test_ds2_round_trip_is_lossless(tmp_path):
    from speech_recognition_tpu.compat import convert_tf_checkpoint, save_tf_checkpoint
    from speech_recognition_tpu.models import DeepSpeech2

    ours = DeepSpeech2(1, (32,), ((41, 11),), ((2, 2),), "rnn", 7, 32, 0.1, 0.0, 120, 14)
    variables = dict(
        ours.init({"params": jax.random.PRNGKey(5)}, jnp.zeros((1, 100, 80, 3)))
    )
    path = str(tmp_path / "rt_ds")
    save_tf_checkpoint(variables, path)
    back = convert_tf_checkpoint(path)
    want = jax.tree_util.tree_map(np.asarray, variables)
    assert jax.tree_util.tree_structure(want) == jax.tree_util.tree_structure(back)
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(a, b)


def test_exported_las_logits_parity(exported_las):
    ref, ours, variables = exported_las
    rng = np.random.default_rng(10)
    lengths = [24, 15]
    audio = _random_features(rng, 2, 24, lengths=lengths)
    tokens = np.array([[1, 300, 4, 2], [1, 7, 2, 0]], np.int32)

    ref_logits = ref((tf.constant(audio), tf.constant(tokens)), training=False).numpy()
    our_logits = np.asarray(ours.apply(variables, (jnp.asarray(audio), jnp.asarray(tokens))))
    assert our_logits.shape == ref_logits.shape
    np.testing.assert_allclose(our_logits[0], ref_logits[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(our_logits[1, :3], ref_logits[1, :3], rtol=1e-4, atol=1e-4)


def test_exported_las_greedy_decode_parity(exported_las):
    from speech_recognition.search import LAS_Searcher as RefSearcher

    from speech_recognition_tpu.search import LASSearcher

    ref, ours, variables = exported_las
    rng = np.random.default_rng(11)
    audio = _random_features(rng, 2, 24, lengths=[24, 18])

    ref_searcher = RefSearcher(ref, 8, bos_id=1, eos_id=2, pad_id=0)
    ref_tokens, ref_ppl = ref_searcher.greedy_search(tf.constant(audio))
    our_searcher = LASSearcher(ours, variables, 8, bos_id=1, eos_id=2, pad_id=0)
    our_tokens, our_ppl = our_searcher.greedy_search(jnp.asarray(audio))
    np.testing.assert_array_equal(np.asarray(our_tokens), ref_tokens.numpy())
    np.testing.assert_allclose(np.asarray(our_ppl), ref_ppl.numpy(), rtol=1e-3)


def test_exported_ds2_logits_parity(tmp_path):
    """DS2 with batch-norm: moving stats travel through batch_stats ->
    moving_mean/moving_variance and gamma/beta mapping."""
    from speech_recognition.models import DeepSpeech2 as RefDS

    from speech_recognition_tpu.compat import save_tf_checkpoint
    from speech_recognition_tpu.models import DeepSpeech2

    ours = DeepSpeech2(1, (32,), ((41, 11),), ((2, 2),), "rnn", 7, 32, 0.1, 0.0, 120, 14)
    rng_init = jax.random.PRNGKey(7)
    variables = dict(ours.init({"params": rng_init}, jnp.zeros((1, 100, 80, 3))))
    # make the BN moving stats non-trivial so the mapping is actually tested
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda x: x + jax.random.uniform(rng_init, x.shape) * 0.3,
        variables["batch_stats"],
    )
    path = str(tmp_path / "ds_export")
    save_tf_checkpoint(variables, path)

    ref = RefDS(1, [32], [[41, 11]], [[2, 2]], "rnn", 7, 32, 0.1, 0.0, 120, 14)

    # same shipped-mask patch as test_model_parity.py::ds_pair — the
    # reference's _audio_mask bug (deepspeech2.py:74) yields constant logits
    def _fixed_audio_mask(audio):
        conv = ref.convolution
        seq = tf.shape(audio)[1]
        mask = tf.reduce_any(
            tf.reshape(audio, [tf.shape(audio)[0], seq, -1]) != conv.AUDIO_PAD_VALUE, axis=2
        )
        stride_prod = 1
        for (k, _), (s, _) in zip(conv.kernel_sizes, conv.strides):
            seq = (seq - (k - s)) // s
            stride_prod *= s
        mask = tf.reshape(mask[:, : seq * stride_prod], [tf.shape(audio)[0], seq, stride_prod])
        return tf.reduce_any(mask, axis=2)

    ref.convolution._audio_mask = _fixed_audio_mask
    ref(tf.zeros((1, 100, 80, 3)), training=False)
    _assign_tf_weights(ref, path)

    rng = np.random.default_rng(12)
    audio = _random_features(rng, 2, 100, lengths=[100, 64])
    ref_logits = ref(tf.constant(audio), training=False).numpy()
    our_logits = np.asarray(ours.apply(variables, jnp.asarray(audio)))
    assert our_logits.shape == ref_logits.shape
    np.testing.assert_allclose(our_logits, ref_logits, rtol=1e-4, atol=1e-4)
