"""Regression guards: the fused fast paths must ACTUALLY fire at the real
model shapes.

Round-14 lesson (PERF.md): two fast paths shipped as silent no-ops because
their support gates rejected the real shapes — the fused transducer joint
(encoder T' is ODD: 255) and the fused TSD top-k (joint dim 320 is not a
128-multiple).  A fast path whose gate returns False doesn't fail any
numeric test; it just quietly runs the slow path.  These tests pin the
gates True at the exact shapes the shipped configs produce (with the
device-environment checks mocked to the single-TPU case), so a future
shape or gate change that silently disables a kernel turns a test red.
"""

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture()
def single_chip(monkeypatch):
    """Mock the device-environment checks to the single-real-TPU case (the
    suite runs on 8 virtual CPUs, where kernels legitimately gate off)."""
    from speech_recognition_tpu.ops.pallas import (
        ctc_kernel,
        sharding,
        topk_kernel,
        transducer_kernel,
    )

    for mod in (sharding, ctc_kernel, topk_kernel, transducer_kernel):
        monkeypatch.setattr(mod, "pallas_backend_ok", lambda: True)
        monkeypatch.setattr(mod, "batch_shards", lambda n: (1, n))


def test_fused_joint_gate_fires_at_bench_shapes(single_chip):
    """transducer_small at B=128, T=1024 audio frames -> enc T'=255 (ODD),
    U1=63, J=320, V=16000.  The joint kernel must accept it (frame pad)."""
    from speech_recognition_tpu.ops.pallas.transducer_kernel import joint_planes_supported

    enc = jax.ShapeDtypeStruct((128, 255, 320), jnp.bfloat16)
    pred = jax.ShapeDtypeStruct((128, 63, 320), jnp.bfloat16)
    wo = jax.ShapeDtypeStruct((320, 16000), jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((128, 62), jnp.int32)
    assert joint_planes_supported(enc, pred, wo, ids)
    # libri max-length labels (U1=128 -> TF=1 layout) must also pass
    pred128 = jax.ShapeDtypeStruct((128, 128, 320), jnp.bfloat16)
    ids127 = jax.ShapeDtypeStruct((128, 127), jnp.int32)
    assert joint_planes_supported(enc, pred128, wo, ids127)


def test_tsd_topk_gate_fires_at_padded_joint_dim(single_chip):
    """The TSD beam pads hid/W 320 -> 384 before the top-k kernel
    (search.py Jp); the padded probe must be supported for beams 1..13
    (k_ext = K + 3 <= 16)."""
    from speech_recognition_tpu.ops.pallas.topk_kernel import vocab_topk_pallas_supported

    W = jax.ShapeDtypeStruct((384, 16000), jnp.bfloat16)
    for K in (1, 4, 8, 13):
        hid = jax.ShapeDtypeStruct((128 * K, 384), jnp.bfloat16)
        assert vocab_topk_pallas_supported(hid, W, K + 3), f"beam {K}"
    # the UNPADDED joint dim must still be rejected (the kernel's 128-lane
    # alignment requirement — what made the first bench a silent no-op)
    hid_raw = jax.ShapeDtypeStruct((128 * 8, 320), jnp.bfloat16)
    W_raw = jax.ShapeDtypeStruct((320, 16000), jnp.bfloat16)
    assert not vocab_topk_pallas_supported(hid_raw, W_raw, 11)


def test_las_beam_topk_gate_fires_at_shipped_shapes(single_chip):
    """LAS-small beam-8: hid [B*K, 256] bf16, vocab 16000."""
    from speech_recognition_tpu.ops.pallas.topk_kernel import vocab_topk_pallas_supported

    hid = jax.ShapeDtypeStruct((128 * 8, 256), jnp.bfloat16)
    W = jax.ShapeDtypeStruct((256, 16000), jnp.bfloat16)
    assert vocab_topk_pallas_supported(hid, W, 8)


def test_fused_ctc_gate_fires_at_ds2_shapes(single_chip):
    """DS2 bench shapes: 1024 audio frames / time-stride 8 -> T'=128;
    trunk hidden 2x128 BiGRU = 256; V=16000."""
    from speech_recognition_tpu.ops.pallas.ctc_kernel import vocab_emissions_supported

    hid = jax.ShapeDtypeStruct((128, 128, 256), jnp.bfloat16)
    W = jax.ShapeDtypeStruct((256, 16000), jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((128, 65), jnp.int32)
    assert vocab_emissions_supported(hid, W, ids)
