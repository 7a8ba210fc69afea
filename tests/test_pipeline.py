"""Host input-pipeline upgrades (round-2): parallel feature map, prefetch,
row-level resume skip, and true-length threading through batching.

Covers VERDICT.md round-1 items 2 (pipeline throughput plumbing), 3 (frame
lengths through the host batching path) and 8 (row-level resume skip).
"""

import time

import numpy as np
import pytest

from speech_recognition_tpu.data.dataset import (
    bucket_batch,
    get_dataset,
    get_tfrecord_dataset,
    padded_batch,
    parallel_map_stream,
    prefetch_stream,
    repeat_stream,
)
from tests.const import TFRECORD_DATASET_PATH, WAV_DATASET_PATH


class _CodepointTokenizer:
    def tokenize(self, text):
        return [ord(c) for c in text]


# ------------------------------------------------------------ stream helpers
def test_parallel_map_stream_preserves_order_and_values():
    items = list(range(100))
    out = list(parallel_map_stream(items, lambda x: x * x, num_workers=4, window=8))
    assert out == [x * x for x in items]


def test_prefetch_stream_equivalence_and_exception_propagation():
    items = [(np.arange(3), i) for i in range(10)]
    out = list(prefetch_stream(iter(items), size=2))
    assert len(out) == 10
    for (a, i), (b, j) in zip(items, out):
        assert i == j and np.array_equal(a, b)

    def boom():
        yield 1
        raise ValueError("upstream failure")

    it = prefetch_stream(boom(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="upstream failure"):
        next(it)


def test_prefetch_stream_overlaps_producer_and_consumer():
    """With prefetch, producer sleeps overlap consumer sleeps; without, they
    serialize.  Generous margins: this asserts overlap, not exact timing."""

    def slow_producer():
        for i in range(8):
            time.sleep(0.02)
            yield i

    t0 = time.time()
    for _ in prefetch_stream(slow_producer(), size=2):
        time.sleep(0.02)
    overlapped = time.time() - t0
    # serial execution would take ~0.32s; overlapped ~0.18s
    assert overlapped < 0.28, f"prefetch did not overlap ({overlapped:.3f}s)"


# ------------------------------------------------------- row-level skip (#8)
def test_get_dataset_row_level_skip():
    tok = _CodepointTokenizer()
    full = list(get_dataset(WAV_DATASET_PATH, "wav", 16000, tok))
    assert len(full) == 2
    skipped = list(get_dataset(WAV_DATASET_PATH, "wav", 16000, tok, skip=1))
    assert len(skipped) == 1
    assert np.array_equal(skipped[0][1], full[1][1])
    assert list(get_dataset(WAV_DATASET_PATH, "wav", 16000, tok, skip=2)) == []
    # skip larger than the dataset: exhausted, not wrapped
    assert list(get_dataset(WAV_DATASET_PATH, "wav", 16000, tok, skip=5)) == []


def test_get_dataset_skip_never_decodes_skipped_audio(monkeypatch):
    """The point of row-level skip: skipped rows must not cost audio decode."""
    import speech_recognition_tpu.data.dataset as ds

    calls = {"n": 0}
    real_loader = ds.load_audio_file

    def counting_loader(*a, **k):
        fn = real_loader(*a, **k)

        def _load(path):
            calls["n"] += 1
            return fn(path)

        return _load

    monkeypatch.setattr(ds, "load_audio_file", counting_loader)
    out = list(get_dataset(WAV_DATASET_PATH, "wav", 16000, _CodepointTokenizer(), skip=1))
    assert len(out) == 1 and calls["n"] == 1


def test_tfrecord_skip(tmp_path):
    from speech_recognition_tpu.data.tfrecord import serialize_example, write_records

    path = str(tmp_path / "skip.tfrecord")
    examples = [
        (np.random.rand(4, 3, 1).astype(np.float32), np.array([1, 2, i], np.int32))
        for i in range(3)
    ]
    write_records(path, (serialize_example(a, t) for a, t in examples))
    full = list(get_tfrecord_dataset(path))
    assert len(full) == 3
    skipped = list(get_tfrecord_dataset(path, skip=1))
    assert len(skipped) == 2
    np.testing.assert_array_equal(skipped[0][1], full[1][1])


def test_repeat_stream_first_skip():
    calls = []

    def factory(skip=0):
        calls.append(skip)
        return iter(range(skip, 4))

    out = [next_ for _, next_ in zip(range(10), repeat_stream(factory, first_skip=3))]
    assert out == [3, 0, 1, 2, 3, 0, 1, 2, 3, 0]
    assert calls[0] == 3 and all(c == 0 for c in calls[1:])


# ----------------------------------------------- true lengths in batches (#3)
def test_padded_batch_with_lengths():
    examples = [
        (np.ones((5, 4, 1), np.float32), np.array([1, 2], np.int32)),
        (np.ones((3, 4, 1), np.float32), np.array([3], np.int32)),
        (np.ones((7, 4, 1), np.float32), np.array([4, 5, 6], np.int32)),
    ]
    batches = list(padded_batch(examples, 2, 8, 4, pad_to_batch=True, with_lengths=True))
    assert len(batches) == 2
    audio, lengths, tokens = batches[0]
    assert audio.shape == (2, 8, 4, 1) and tokens.shape == (2, 4)
    assert lengths.tolist() == [5, 3]
    audio, lengths, tokens = batches[1]
    assert lengths.tolist() == [7, 0]  # batch-pad row reports length 0


def test_padded_batch_bf16_shipping_matches_device_cast():
    """Host-stacked bf16 features (audio_dtype, shipped under mixed
    precision) must be bit-identical to the model's on-device
    astype(bfloat16) RTNE cast of the f32 batch — numpy/ml_dtypes and XLA
    both round-to-nearest-even, so the transfer-halving path changes no
    math (models/las.py:168, deepspeech2.py:43)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    examples = [
        (rng.standard_normal((5, 4, 3)).astype(np.float32) * 10.0**rng.integers(-6, 6),
         np.array([1, 2], np.int32))
        for _ in range(4)
    ]
    bf16 = np.dtype(jnp.bfloat16)
    f32_batches = list(padded_batch(iter(examples), 2, 8, 4, with_lengths=True))
    bf16_batches = list(
        padded_batch(iter(examples), 2, 8, 4, with_lengths=True, audio_dtype=bf16)
    )
    for (a32, l32, t32), (a16, l16, t16) in zip(f32_batches, bf16_batches):
        assert a16.dtype == bf16
        device_cast = np.asarray(jnp.asarray(a32).astype(jnp.bfloat16))
        assert (a16 == device_cast).all()
        assert (l16 == l32).all() and (t16 == t32).all()

    # bucket_batch and quantized_padded_batch take the same parameter
    from speech_recognition_tpu.data.dataset import quantized_padded_batch

    (qa, _, _), = list(quantized_padded_batch(iter(examples[:2]), 2, audio_dtype=bf16))
    assert qa.dtype == bf16
    (ba, _, _), = list(bucket_batch(iter(examples[:2]), 2, [8], 4, with_lengths=True, audio_dtype=bf16))
    assert ba.dtype == bf16


def test_bucket_batch_with_lengths():
    examples = [
        (np.ones((5, 4, 1), np.float32), np.array([1], np.int32)),
        (np.ones((6, 4, 1), np.float32), np.array([2], np.int32)),
    ]
    batches = list(bucket_batch(examples, 2, [8], 4, with_lengths=True))
    assert len(batches) == 1
    audio, lengths, tokens = batches[0]
    assert audio.shape == (2, 8, 4, 1) and lengths.tolist() == [5, 6]


def test_tail_time_mask_does_not_truncate_encoder_mask():
    """A SpecAugment time mask landing on the sequence tail zeroes real
    frames; with explicit lengths the encoder mask must still cover them
    (round-1 verdict weak #1).  Oracles:

    * on a tail-masked example the explicit-lengths logits DIFFER from the
      last-nonzero heuristic (which truncates the encoder mask), and
    * padding garbage outside the boundary conv frame's receptive field
      does not leak (the group-collapse mask deliberately lets the boundary
      frame mix padding — reference parity, see Listener docstring — so the
      receptive field of valid subsampled frames is inputs
      [0, 4*ceil(L/4) + 2)).
    """
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.models import LAS

    model = LAS("lstm", 40, 8, 8, 1, 1, 0.0, 1.0)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.uniform(rng, (2, 24, 10, 3), minval=0.1)
    lengths = jnp.array([24, 16], jnp.int32)
    # example 1: true length 16, tail time-mask zeroes frames 12:16, padding after
    feats = feats.at[1, 12:].set(0.0)
    dec_in = jnp.array([[1, 5, 6], [1, 7, 2]], jnp.int32)
    variables = model.init({"params": rng}, ((feats, lengths), dec_in))

    out_len = model.apply(variables, ((feats, lengths), dec_in))
    # valid subsampled frames 0..3 draw on inputs 0..18 (VALID 3x3/s2 twice);
    # garbage beyond frame 18 must not leak through the explicit-lengths mask
    feats_garbage = feats.at[1, 19:].set(123.0)
    out_garbage = model.apply(variables, ((feats_garbage, lengths), dec_in))
    np.testing.assert_allclose(
        np.asarray(out_len), np.asarray(out_garbage), rtol=1e-5, atol=1e-5
    )
    # the heuristic path (no lengths) truncates the masked tail -> different logits
    out_heur = model.apply(variables, (feats, dec_in))
    assert not np.allclose(np.asarray(out_len)[1], np.asarray(out_heur)[1], atol=1e-4)
    # where no tail mask landed (last valid frame non-zero) the two paths agree
    feats_clean = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 10, 3), minval=0.1)
    feats_clean = feats_clean.at[1, 16:].set(0.0)  # pure padding only
    out_l = model.apply(variables, ((feats_clean, lengths), dec_in))
    out_h = model.apply(variables, (feats_clean, dec_in))
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_h), rtol=1e-5, atol=1e-5)


def test_train_cli_batch_iterator_threads_lengths(tmp_path):
    """End-to-end: the host (non-raw) train pipeline ships (features,
    lengths) pairs into the step (VERDICT round-1 item 3 done-criterion)."""
    import speech_recognition_tpu.run.train as train_mod
    import speech_recognition_tpu.train as train_pkg

    captured = []
    orig = train_pkg.make_train_step

    def spy_make_train_step(*a, **k):
        step = orig(*a, **k)

        def wrapped(state, model_input, y_true, rng):
            captured.append(model_input)
            return step(state, model_input, y_true, rng)

        return wrapped

    argv = [
        "--data-config", "tests/data/mini_data_config.yml",
        "--model-config", "tests/data/model-configs/las_mini_for_test.yml",
        "--sp-model-path", "resources/sp-models/sp_model_unigram_16K_libri.model",
        "--train-dataset-paths", WAV_DATASET_PATH,
        "--dev-dataset-paths", WAV_DATASET_PATH,
        "--train-dataset-size", "2", "--output-path", str(tmp_path),
        "--epochs", "1", "--steps-per-epoch", "1", "--learning-rate", "1e-3",
        "--batch-size", "2", "--dev-batch-size", "2", "--shuffle-buffer-size", "1",
        "--max-over-policy", "slice", "--device", "CPU", "--seed", "7",
    ]
    from speech_recognition_tpu.configs import TrainConfig

    cfg = TrainConfig(**vars(train_mod.parser.parse_args(argv)))
    try:
        train_pkg.make_train_step = spy_make_train_step
        train_mod.main(cfg)
    finally:
        train_pkg.make_train_step = orig
    assert captured, "train step never ran"
    (audio, lengths), dec_in = captured[0]
    assert lengths.shape == (2,) and lengths.dtype == np.int32
    assert (lengths > 0).all() and (lengths <= audio.shape[1]).all()


def test_quantized_padded_raw_batch():
    """Raw-sample batching for the fused frontend: frame-quantized sample
    lengths, batch-axis zero padding with n_valid, and slicing of audio
    longer than the static shape (data/dataset.py)."""
    from speech_recognition_tpu.data.dataset import quantized_padded_raw_batch

    fl, fs = 320, 160
    rng = np.random.default_rng(0)
    rows = [(rng.standard_normal(n).astype(np.float32), np.array([1, 2, 3][: 1 + i % 3])) for i, n in enumerate([5000, 8000, 2000])]

    # dynamic quantized mode: frames quantized to 4 -> S = (frames-1)*fs + fl
    out = list(quantized_padded_raw_batch(iter(rows), 2, fl, fs, frame_quantum=4))
    assert len(out) == 2
    (audio, lengths), tokens, n_valid = out[0]
    frames = (8000 - fl) // fs + 1  # longest in batch = 48 frames
    frames_q = ((frames + 3) // 4) * 4
    assert audio.shape == (2, (frames_q - 1) * fs + fl)
    assert n_valid == 2 and lengths.tolist() == [5000, 8000]
    np.testing.assert_array_equal(audio[0, :5000], rows[0][0])
    assert (audio[0, 5000:] == 0).all()

    # remainder batch: zero rows + n_valid
    (audio, lengths), tokens, n_valid = out[1]
    assert n_valid == 1 and audio.shape[0] == 2
    assert lengths[1] == 0 and (audio[1] == 0).all()

    # static mode: max_frames fixes the shape; longer audio is sliced
    ((audio, lengths), _, _), = quantized_padded_raw_batch(iter(rows[:2]), 2, fl, fs, max_frames=16)
    S = 15 * fs + fl
    assert audio.shape == (2, S)
    assert lengths.tolist() == [S, S]  # both clipped to the static window
    np.testing.assert_array_equal(audio[1], rows[1][0][:S])


def test_pipelined_decode_orders_and_overlaps():
    """pipelined_decode keeps `depth` decode calls dispatched ahead of
    materialization and preserves input order (run/common.py)."""
    from speech_recognition_tpu.run.common import pipelined_decode

    events = []

    def decode_fn(audio):
        events.append(("dispatch", int(audio[0])))
        return audio + 100

    batches = [(np.array([i]), f"meta{i}", i) for i in range(5)]
    out = []
    for decoded, meta, n in pipelined_decode(iter(batches), decode_fn, depth=2):
        events.append(("materialize", n))
        out.append((int(decoded[0]), meta, n))

    assert out == [(i + 100, f"meta{i}", i) for i in range(5)]
    # batch 1's decode must be dispatched before batch 0 is materialized
    assert events.index(("dispatch", 1)) < events.index(("materialize", 0))
    assert [e for e in events if e[0] == "materialize"] == [("materialize", i) for i in range(5)]
