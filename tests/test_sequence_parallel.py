"""Sequence-parallel frontend (parallel/sequence.py + make_sp_batch_frontend).

The time-sharded sample->feature chain must be a pure re-scheduling of the
fused batch frontend: identical features, identical frame lengths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from speech_recognition_tpu.configs import DataConfig
from speech_recognition_tpu.ops.frontend import make_batch_frontend, make_sp_batch_frontend
from speech_recognition_tpu.parallel.sequence import halo_exchange

from .const import KSPON_MINI_DATA_CONFIG, TEST_DATA_DIR

MINI_DATA_CONFIG = os.path.join(TEST_DATA_DIR, "mini_data_config.yml")


def test_halo_exchange_neighbor_edges():
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("seq",))
    x = jnp.arange(n * 3, dtype=jnp.float32).reshape(1, n * 3)  # [B=1, T=12]

    def body(x_local):
        return halo_exchange(x_local, "seq", time_axis=1, left=1, right=2)

    out = jax.shard_map(
        body, mesh=mesh, in_specs=(P(None, "seq"),), out_specs=P(None, "seq"),
        check_vma=False,
    )(x)
    out = np.asarray(out).reshape(n, 6)  # per-shard extended blocks
    # shard 1 owns [3,4,5]: left halo = 2 (last of shard 0), right = [6,7]
    np.testing.assert_array_equal(out[1], [2, 3, 4, 5, 6, 7])
    # chain ends are zero-padded
    np.testing.assert_array_equal(out[0], [0, 0, 1, 2, 3, 4])
    np.testing.assert_array_equal(out[3], [8, 9, 10, 11, 0, 0])


def _random_audio(key, B, S, lengths):
    audio = jax.random.normal(key, (B, S)) * 0.1
    mask = jnp.arange(S)[None, :] < jnp.asarray(lengths)[:, None]
    return audio * mask, jnp.asarray(lengths, jnp.int32)


@pytest.mark.parametrize("config_path", [MINI_DATA_CONFIG, KSPON_MINI_DATA_CONFIG])
def test_sp_frontend_matches_base(config_path):
    cfg = DataConfig.from_yaml(config_path)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("model",))
    B = 3
    # 41 frames: deliberately NOT divisible into 4 shards (exercises padding)
    S = 40 * cfg.frame_step + cfg.frame_length
    audio, lengths = _random_audio(jax.random.PRNGKey(0), B, S, [S, S - 777, 1000])

    base = make_batch_frontend(cfg, spec_augment=False)
    sp = make_sp_batch_frontend(cfg, mesh, seq_axis="model", spec_augment=False)

    feats_b, valid_b = base(audio, lengths)
    feats_s, valid_s = sp(audio, lengths)
    np.testing.assert_array_equal(np.asarray(valid_b), np.asarray(valid_s))
    assert feats_b.shape == feats_s.shape
    np.testing.assert_allclose(
        np.asarray(feats_s), np.asarray(feats_b), rtol=1e-5, atol=1e-5
    )


def test_sp_frontend_matches_base_with_spec_augment():
    cfg = DataConfig.from_yaml(KSPON_MINI_DATA_CONFIG)
    # masks-only SpecAugment inside the frontend (time warp is host-side;
    # configs/train_config.py keeps the fused frontend off when W is set)
    cfg.spec_augment.W = None
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("model",))
    B = 2
    S = 32 * cfg.frame_step + cfg.frame_length
    audio, lengths = _random_audio(jax.random.PRNGKey(1), B, S, [S, S - 500])
    key = jax.random.PRNGKey(7)

    base = make_batch_frontend(cfg, spec_augment=True)
    sp = make_sp_batch_frontend(cfg, mesh, seq_axis="model", spec_augment=True)
    feats_b, _ = base(audio, lengths, key)
    feats_s, _ = sp(audio, lengths, key)
    np.testing.assert_allclose(
        np.asarray(feats_s), np.asarray(feats_b), rtol=1e-5, atol=1e-5
    )


def test_sp_frontend_composes_with_data_axis():
    cfg = DataConfig.from_yaml(MINI_DATA_CONFIG)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    B = 4
    S = 24 * cfg.frame_step + cfg.frame_length
    audio, lengths = _random_audio(jax.random.PRNGKey(2), B, S, [S, S - 320, 900, S])

    base = make_batch_frontend(cfg, spec_augment=False)
    sp = make_sp_batch_frontend(cfg, mesh, seq_axis="model", data_axis="data")
    feats_b, _ = base(audio, lengths)
    feats_s, _ = sp(audio, lengths)
    np.testing.assert_allclose(
        np.asarray(feats_s), np.asarray(feats_b), rtol=1e-5, atol=1e-5
    )
