"""TFRecord wire-format reader/writer tests.

The reader is validated against the reference's prebuilt fixture (written by
TensorFlow itself), and the writer against TF's TFRecordDataset when TF is
available — proving both directions of wire compatibility.
"""

import os

import numpy as np
import pytest

from speech_recognition_tpu.data import tfrecord

from .const import REF_TFRECORD


def test_crc32c_known_answer():
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
    assert tfrecord.crc32c(b"") == 0
    assert tfrecord.crc32c(b"a" * 1000) == tfrecord.crc32c(b"a" * 1000)


def test_serialize_parse_roundtrip(tmp_path):
    audio = np.random.default_rng(0).standard_normal((50, 80, 1)).astype(np.float32)
    tokens = np.array([2, 5, 77, 3], np.int32)
    record = tfrecord.serialize_example(audio, tokens)
    path = str(tmp_path / "x.tfrecord")
    tfrecord.write_records(path, [record])
    pairs = list(tfrecord.read_example_dataset(path))
    assert len(pairs) == 1
    np.testing.assert_array_equal(pairs[0][0], audio)
    np.testing.assert_array_equal(pairs[0][1], tokens)


def test_corruption_detected(tmp_path):
    """A flipped byte in the record payload must raise, not pass silently."""
    import gzip

    audio = np.zeros((10, 4, 1), np.float32)
    tokens = np.array([1, 2, 3], np.int32)
    path = str(tmp_path / "x.tfrecord")
    tfrecord.write_records(path, [tfrecord.serialize_example(audio, tokens)])

    raw = bytearray(gzip.open(path, "rb").read())
    raw[20] ^= 0xFF  # flip a payload byte (past the 12-byte header)
    corrupt = str(tmp_path / "bad.tfrecord")
    with gzip.open(corrupt, "wb") as f:
        f.write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt record"):
        list(tfrecord.read_example_dataset(corrupt))


@pytest.mark.skipif(not os.path.exists(REF_TFRECORD), reason="reference fixture unavailable")
def test_read_reference_fixture():
    pairs = list(tfrecord.read_example_dataset(REF_TFRECORD))
    assert len(pairs) == 2
    audio, tokens = pairs[0]
    assert audio.shape == (412, 80, 1) and audio.dtype == np.float32
    assert tokens.shape == (22,) and tokens.dtype == np.int32


def test_tf_can_read_our_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    audio = np.random.default_rng(1).standard_normal((7, 4, 1)).astype(np.float32)
    tokens = np.array([1, 2, 3], np.int32)
    path = str(tmp_path / "ours.tfrecord")
    tfrecord.write_records(path, [tfrecord.serialize_example(audio, tokens)])

    ds = tf.data.TFRecordDataset([path], "GZIP")
    raw = next(iter(ds))
    outer = tf.io.parse_tensor(raw, tf.string)
    got_audio = tf.io.parse_tensor(outer[0], tf.float32).numpy()
    got_tokens = tf.io.parse_tensor(outer[1], tf.int32).numpy()
    np.testing.assert_array_equal(got_audio, audio)
    np.testing.assert_array_equal(got_tokens, tokens)


def test_our_reader_reads_tf_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    audio = np.random.default_rng(2).standard_normal((5, 3, 1)).astype(np.float32)
    tokens = np.array([9, 8], np.int32)
    serialized = tf.io.serialize_tensor(
        tf.stack([tf.io.serialize_tensor(tf.constant(audio)), tf.io.serialize_tensor(tf.constant(tokens))])
    ).numpy()
    path = str(tmp_path / "tf.tfrecord")
    with tf.io.TFRecordWriter(path, tf.io.TFRecordOptions(compression_type="GZIP")) as w:
        w.write(serialized)
    pairs = list(tfrecord.read_example_dataset(path))
    np.testing.assert_array_equal(pairs[0][0], audio)
    np.testing.assert_array_equal(pairs[0][1], tokens)
