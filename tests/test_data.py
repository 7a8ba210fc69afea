"""Data pipeline tests: audio decode equivalence, dataset streaming, batching,
and end-to-end frontend parity against the reference's TF-generated TFRecord."""

import os

import numpy as np
import pytest

from speech_recognition_tpu.data import (
    filter_example,
    get_dataset,
    get_tfrecord_dataset,
    padded_batch,
    read_tsv_rows,
    shuffle_stream,
    slice_example,
)
from speech_recognition_tpu.data.audio import decode_pcm, decode_wav
from speech_recognition_tpu.data.flac import decode_flac_bytes, decode_flac_file
from speech_recognition_tpu.ops import features

from .const import PCM_DATASET_PATH, REF_AUDIO_DIR, REF_TFRECORD, REF_WAV_TSV, WAV_DATASET_PATH


class PseudoTokenizer:
    """Unicode-codepoint tokenizer (mirrors the reference's test fake)."""

    @staticmethod
    def tokenize(sentence):
        return np.array([ord(c) for c in sentence], np.int32)


def test_wav_pcm_equivalence():
    wav, sr = decode_wav(os.path.join(os.path.dirname(WAV_DATASET_PATH), "audio_files/test.wav"))
    pcm = decode_pcm(os.path.join(os.path.dirname(WAV_DATASET_PATH), "audio_files/test.pcm"))
    assert sr == 22050
    np.testing.assert_array_equal(wav, pcm)


@pytest.mark.skipif(not os.path.exists(REF_AUDIO_DIR), reason="reference fixtures unavailable")
def test_flac_matches_wav_reference_fixture():
    wav, sr_w = decode_wav(os.path.join(REF_AUDIO_DIR, "test.wav"))
    flac, sr_f = decode_flac_file(os.path.join(REF_AUDIO_DIR, "test.flac"))
    assert sr_w == sr_f
    np.testing.assert_array_equal((wav * 32768).astype(np.int32), flac)


def test_get_dataset():
    data = list(get_dataset(WAV_DATASET_PATH, "wav", 22050, PseudoTokenizer))
    pcm_data = list(get_dataset(PCM_DATASET_PATH, "pcm", 22050, PseudoTokenizer))
    assert len(data) == 2 and len(pcm_data) == 2
    audio, tokens = data[0]
    assert audio.shape == (22050,) and audio.dtype == np.float32
    assert tokens.tolist() == [ord(c) for c in "Hello World Good night"]
    np.testing.assert_array_equal(data[0][0], pcm_data[0][0])


def test_get_dataset_missing_glob():
    with pytest.raises(FileNotFoundError):
        list(get_dataset("nonexistent*.tsv", "wav", 22050, PseudoTokenizer))


@pytest.mark.skipif(not os.path.exists(REF_TFRECORD), reason="reference fixtures unavailable")
def test_frontend_parity_vs_reference_tfrecord():
    """Full-chain parity: our wav decode + log-mel frontend must reproduce the
    feature tensors TF wrote into the reference's TFRecord fixture."""
    ref = list(get_tfrecord_dataset(REF_TFRECORD))
    rows = read_tsv_rows(REF_WAV_TSV)
    fn = features.make_log_mel_spectrogram(16000, 320, 160, 320, 80, 80.0, 7600.0, xp=np)
    for (ref_feat, ref_tokens), (path, text) in zip(ref, rows):
        if path.endswith(".wav"):
            audio, _ = decode_wav(path)
        else:
            from speech_recognition_tpu.data.audio import decode_flac

            audio, _ = decode_flac(path)
        feat = fn(audio.mean(axis=1))
        assert feat.shape == ref_feat.shape
        np.testing.assert_allclose(feat, ref_feat, rtol=1e-3, atol=2e-3)
        assert ref_tokens.tolist() == [ord(c) for c in text]


def test_filter_and_slice_policies():
    data = [(np.zeros((10, 4, 1), np.float32), np.ones(5, np.int32)),
            (np.zeros((20, 4, 1), np.float32), np.ones(9, np.int32))]
    kept = list(filter_example(15, 6)(data))
    assert len(kept) == 1 and kept[0][0].shape[0] == 10
    sliced = list(slice_example(15, 6)(data))
    assert sliced[1][0].shape[0] == 15 and sliced[1][1].shape[0] == 6


def test_padded_batch_static_shapes():
    data = [(np.ones((t, 4, 1), np.float32), np.ones(n, np.int32)) for t, n in [(5, 2), (8, 3), (3, 1)]]
    batches = list(padded_batch(iter(data), 2, audio_pad_length=10, token_pad_length=4))
    assert batches[0][0].shape == (2, 10, 4, 1)
    assert batches[0][1].shape == (2, 4)
    assert batches[1][0].shape == (1, 10, 4, 1)
    # dynamic: pad to longest in batch
    dyn = list(padded_batch(iter(data), 2, None, None))
    assert dyn[0][0].shape == (2, 8, 4, 1) and dyn[0][1].shape == (2, 3)


def test_padded_batch_pad_to_batch():
    data = [(np.ones((5, 4, 1), np.float32), np.ones(2, np.int32))] * 3
    batches = list(padded_batch(iter(data), 2, 8, 4, pad_to_batch=True))
    assert all(b[0].shape == (2, 8, 4, 1) for b in batches)
    assert np.all(batches[-1][0][1] == 0)


def test_shuffle_stream_is_permutation():
    data = list(range(100))
    out = list(shuffle_stream(iter(data), 10, seed=3))
    assert sorted(out) == data and out != data


def test_spec_augment_bounds():
    import jax

    from speech_recognition_tpu.ops import make_spec_augment

    num_time, v = 234, 80
    fn = make_spec_augment(v, W=40, F=15, m_F=2, T=70, p=0.2, m_T=2)
    x = np.random.default_rng(0).uniform(0.1, 1.0, (num_time, v, 1)).astype(np.float32)
    out = np.asarray(fn(jax.random.PRNGKey(0), x))
    assert out.shape == x.shape
    assert not np.array_equal(out, x)
    # masked rows/cols bounded by the paper parameters
    zero_rows = int((out == 0).all(axis=(1, 2)).sum())
    zero_cols = int((out == 0).all(axis=(0, 2)).sum())
    assert zero_rows <= 2 * 70
    assert zero_cols <= 2 * 15


def test_native_library_parity():
    """Native C++ decoders must match the pure-Python implementations bit-for-bit."""
    pytest.importorskip("ctypes")
    from speech_recognition_tpu.data import native

    if not native.available():
        pytest.skip("native library not built (no compiler)")
    from speech_recognition_tpu.data.tfrecord import _TABLES  # noqa: F401 force table build

    assert native.crc32c_native(b"123456789") == 0xE3069283
    wav_path = os.path.join(os.path.dirname(WAV_DATASET_PATH), "audio_files/test.wav")
    w_native, sr = native.wav_decode_native(wav_path)
    w_py, sr_py = decode_wav(wav_path)
    assert sr == sr_py
    np.testing.assert_array_equal(w_native, w_py)
    if os.path.exists(REF_AUDIO_DIR):
        flac_path = os.path.join(REF_AUDIO_DIR, "test.flac")
        f_native, fsr = native.flac_decode_native(flac_path)
        from speech_recognition_tpu.data.flac import decode_flac_bytes

        with open(flac_path, "rb") as fh:
            f_py, psr = decode_flac_bytes(fh.read())
        assert fsr == psr
        np.testing.assert_array_equal(f_native, f_py)


@pytest.mark.skipif(not os.path.exists(REF_AUDIO_DIR), reason="reference fixtures unavailable")
def test_mp3_decode():
    """mp3 decode (libmpg123 binding) must produce the right shape/rate and
    (lossily) match the lossless decode of the same content."""
    from speech_recognition_tpu.data.mp3 import _load_mpg123, decode_mp3_file

    if _load_mpg123() is None:
        pytest.skip("libmpg123 unavailable")
    audio, sr = decode_mp3_file(os.path.join(REF_AUDIO_DIR, "test.mp3"))
    wav, wsr = decode_wav(os.path.join(REF_AUDIO_DIR, "test.wav"))
    assert sr == wsr and audio.shape == wav.shape
    np.testing.assert_allclose(audio, wav, atol=1e-2)  # lossy codec tolerance


def test_mp3_ffmpeg_fallback_parses_rate(monkeypatch):
    """The ffmpeg fallback forces mono output and reads the rate from the
    'NNN Hz' stderr field instead of guessing (no ffmpeg binary needed)."""
    import subprocess
    import types

    from speech_recognition_tpu.data import mp3 as mp3_mod

    payload = np.arange(8, dtype=np.float32).tobytes()
    banner = b"Stream #0:0: Audio: mp3, 22050 Hz, stereo, fltp, 128 kb/s"

    monkeypatch.setattr(mp3_mod.shutil, "which", lambda name: "/usr/bin/ffmpeg")
    monkeypatch.setattr(
        mp3_mod.subprocess,
        "run",
        lambda cmd, capture_output, check: types.SimpleNamespace(stdout=payload, stderr=banner),
    )
    audio, rate = mp3_mod._decode_with_ffmpeg("x.mp3")
    assert rate == 22050 and audio.shape == (8, 1)
    np.testing.assert_array_equal(audio[:, 0], np.arange(8, dtype=np.float32))

    monkeypatch.setattr(
        mp3_mod.subprocess,
        "run",
        lambda cmd, capture_output, check: types.SimpleNamespace(stdout=payload, stderr=b"no rate here"),
    )
    with pytest.raises(ValueError, match="sample rate"):
        mp3_mod._decode_with_ffmpeg("x.mp3")


def test_bucket_batch():
    from speech_recognition_tpu.data.dataset import bucket_batch

    rng = np.random.default_rng(0)
    data = [
        (np.ones((t, 4, 1), np.float32), np.ones(rng.integers(1, 5), np.int32))
        for t in [5, 30, 7, 28, 6, 29, 100]
    ]
    batches = list(bucket_batch(iter(data), 2, [10, 40], token_pad_length=6))
    shapes = sorted(b[0].shape for b in batches)
    # three short (5,7,6) -> one full batch of 2 + remainder 1 at pad 10;
    # three medium -> one full batch + remainder at pad 40; len-100 filtered
    assert shapes == [(1, 10, 4, 1), (1, 40, 4, 1), (2, 10, 4, 1), (2, 40, 4, 1)]
    assert all(b[1].shape[1] == 6 for b in batches)

    # clamp (slice-policy semantics): the len-100 example is truncated into
    # the last bucket instead of silently dropped
    batches = list(bucket_batch(iter(data), 2, [10, 40], token_pad_length=6, over_boundary="clamp"))
    total = sum(b[0].shape[0] for b in batches)
    assert total == len(data)
    assert max(b[0].shape[1] for b in batches) == 40


def test_quantized_padded_batch():
    from speech_recognition_tpu.data.dataset import quantized_padded_batch

    data = [
        (np.ones((t, 4, 1), np.float32), np.ones(3, np.int32))
        for t in [5, 130, 7, 250, 6]
    ]
    batches = list(quantized_padded_batch(iter(data), 2, time_quantum=128))
    # audio axis quantized to multiples of 128, batch axis always full
    assert [b[0].shape for b in batches] == [(2, 256, 4, 1), (2, 256, 4, 1), (2, 128, 4, 1)]
    assert [b[2] for b in batches] == [2, 2, 1]
    # zero-padded final row
    assert (batches[-1][0][1] == 0).all()
    # explicit pad lengths win over quantization
    batches = list(quantized_padded_batch(iter(data), 2, audio_pad_length=300, token_pad_length=8))
    assert all(b[0].shape == (2, 300, 4, 1) and b[1].shape == (2, 8) for b in batches)
