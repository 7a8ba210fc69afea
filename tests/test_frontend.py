"""Fused on-device batch frontend must match the host per-example pipeline."""

import numpy as np
import pytest

from speech_recognition_tpu.configs import DataConfig
from speech_recognition_tpu.ops.features import delta_accelerate
from speech_recognition_tpu.ops.frontend import make_batch_frontend, pad_audio_batch

from .const import DEFAULT_LIBRI_CONFIG


@pytest.fixture(scope="module")
def config():
    cfg = DataConfig.from_yaml(DEFAULT_LIBRI_CONFIG)
    return cfg


def test_batch_frontend_matches_host_path(config):
    rng = np.random.default_rng(0)
    audios = [rng.standard_normal(n).astype(np.float32) * 0.3 for n in (8000, 5000, 6500)]
    max_samples = 8000

    batch, lengths = pad_audio_batch(audios, max_samples)
    frontend = make_batch_frontend(config)
    feats, frame_lengths = frontend(batch, lengths)
    feats = np.asarray(feats)

    host_fn = config.make_audio_feature_fn("numpy")
    T = feats.shape[1]
    for i, audio in enumerate(audios):
        host = host_fn(audio)
        host = delta_accelerate(host)
        n = host.shape[0]
        assert int(frame_lengths[i]) == n
        np.testing.assert_allclose(feats[i, :n], host, rtol=2e-3, atol=2e-3)
        # padding region must be exactly zero (models detect pads by zeros)
        assert (feats[i, n:] == 0.0).all()


def test_batch_frontend_shapes(config):
    frontend = make_batch_frontend(config)
    batch = np.zeros((2, 16000), np.float32)
    lengths = np.array([16000, 8000], np.int32)
    feats, frame_lengths = frontend(batch, lengths)
    feats = np.asarray(feats)
    expected_T = (16000 - config.frame_length) // config.frame_step + 1
    assert feats.shape == (2, expected_T, config.frequency_dim, config.feature_dim)
    assert int(frame_lengths[0]) == expected_T
    assert int(frame_lengths[1]) == (8000 - config.frame_length) // config.frame_step + 1
