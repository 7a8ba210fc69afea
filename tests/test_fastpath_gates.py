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
        attention_kernel,
        ce_kernel,
        ctc_kernel,
        decoder_kernel,
        search_kernel,
        sharding,
        topk_kernel,
        transducer_kernel,
    )

    for mod in (
        sharding,
        attention_kernel,
        ce_kernel,
        ctc_kernel,
        decoder_kernel,
        search_kernel,
        topk_kernel,
        transducer_kernel,
    ):
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


def test_fused_ce_gate_fires_at_las_shapes(single_chip):
    """LAS-small CE pair: time-major hidden [N=127, B=128, H=256], V=16000."""
    from speech_recognition_tpu.ops.pallas.ce_kernel import ce_vocab_pallas_supported

    hid = jax.ShapeDtypeStruct((127, 128, 256), jnp.bfloat16)
    W = jax.ShapeDtypeStruct((256, 16000), jnp.bfloat16)
    assert ce_vocab_pallas_supported(hid, W)


def test_fused_mhsa_gate_fires_at_conformer_shapes(single_chip):
    """Conformer bench shapes: B=128, T'=256 (1024 frames / 4x subsample,
    tile-padded), D=256, 4 heads, bf16."""
    from speech_recognition_tpu.ops.pallas.attention_kernel import fused_mhsa_supported

    assert fused_mhsa_supported(128, 256, 256, 4, jnp.bfloat16)


def test_pallas_greedy_gate_fires_at_las_shapes(single_chip):
    """LAS-small greedy decode: keys [128, 256, 256] bf16, listener values
    [128, 256, 512], 16K vocab / 256 emb, 2 LSTM cells."""
    from speech_recognition_tpu.ops.pallas.search_kernel import greedy_pallas_supported

    pk = jax.ShapeDtypeStruct((128, 256, 256), jnp.bfloat16)
    value = jax.ShapeDtypeStruct((128, 256, 512), jnp.bfloat16)
    emb = jax.ShapeDtypeStruct((16000, 256), jnp.bfloat16)
    vw = jax.ShapeDtypeStruct((256, 16000), jnp.bfloat16)
    kernels = [
        jax.ShapeDtypeStruct((256 + 512, 4 * 256), jnp.bfloat16),
        jax.ShapeDtypeStruct((256, 4 * 256), jnp.bfloat16),
    ]
    assert greedy_pallas_supported(pk, value, emb, vw, kernels, "lstm")


def test_las_decoder_gate_fires_at_train_shapes(single_chip):
    """LAS-small train decoder mega-kernel: emb [N=127, B=128, 256] bf16."""
    from speech_recognition_tpu.ops.pallas.decoder_kernel import decoder_pallas_supported

    emb = jax.ShapeDtypeStruct((127, 128, 256), jnp.bfloat16)
    pk = jax.ShapeDtypeStruct((128, 256, 256), jnp.bfloat16)
    value = jax.ShapeDtypeStruct((128, 256, 512), jnp.bfloat16)
    kernels = [
        jax.ShapeDtypeStruct((256 + 512, 4 * 256), jnp.bfloat16),
        jax.ShapeDtypeStruct((256, 4 * 256), jnp.bfloat16),
    ]
    assert decoder_pallas_supported(emb, pk, value, kernels)


def test_matmul_stft_fires_at_shipped_frontend_params():
    """The default-on matmul STFT must lower to dot_generals, not an FFT,
    at the shipped frontend params (frame 320 / step 160 / fft 320)."""
    from speech_recognition_tpu.ops.features import power_stft

    jaxpr = str(
        jax.make_jaxpr(lambda a: power_stft(a, 320, 160, 320))(
            jax.ShapeDtypeStruct((2, 16000), jnp.float32)
        )
    )
    assert "fft" not in jaxpr
    assert "dot_general" in jaxpr


def test_fast_dropout_fires_in_conformer_block():
    """The Conformer's training dropout must be the counter-based hash (no
    threefry RNG ops in the traced step) unless SRT_FAST_DROPOUT=0."""
    import os

    from speech_recognition_tpu.models.conformer import ConformerBlock

    assert os.environ.get("SRT_FAST_DROPOUT", "1") != "0"
    block = ConformerBlock(64, 2, 8, 2, 0.1, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 16, 64), jnp.bfloat16)
    mask = jnp.ones((2, 16), bool)
    variables = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, mask, True,
    )
    jaxpr = str(
        jax.make_jaxpr(
            lambda v, x: block.apply(
                v, x, mask, True, rngs={"dropout": jax.random.PRNGKey(2)}
            )
        )(variables, x)
    )
    assert "threefry" not in jaxpr


def test_gate_declines_are_loud(single_chip):
    """Every default-on fused kernel must report a decline through the
    central fallback funnel (once-per-process log + recorded event), not
    return a silent False — the round-14 silent-no-op regression guard."""
    from speech_recognition_tpu.ops.pallas import fallback
    from speech_recognition_tpu.ops.pallas.attention_kernel import fused_mhsa_supported
    from speech_recognition_tpu.ops.pallas.ce_kernel import ce_vocab_pallas_supported
    from speech_recognition_tpu.ops.pallas.ctc_kernel import vocab_emissions_supported
    from speech_recognition_tpu.ops.pallas.decoder_kernel import decoder_pallas_supported
    from speech_recognition_tpu.ops.pallas.search_kernel import greedy_pallas_supported
    from speech_recognition_tpu.ops.pallas.topk_kernel import vocab_topk_pallas_supported
    from speech_recognition_tpu.ops.pallas.transducer_kernel import joint_planes_supported

    fallback.reset_fallbacks()
    f32 = jnp.float32

    # each probe trips a structural gate (dtype / alignment), never backend
    assert not ce_vocab_pallas_supported(
        jax.ShapeDtypeStruct((4, 8, 256), f32), jax.ShapeDtypeStruct((256, 128), f32)
    )
    assert not vocab_emissions_supported(
        jax.ShapeDtypeStruct((2, 8, 100), jnp.bfloat16),  # H % 128 != 0
        jax.ShapeDtypeStruct((100, 128), jnp.bfloat16),
        jax.ShapeDtypeStruct((2, 5), jnp.int32),
    )
    assert not fused_mhsa_supported(4, 100, 256, 4, jnp.bfloat16)  # T % 128
    assert not vocab_topk_pallas_supported(
        jax.ShapeDtypeStruct((32, 320), jnp.bfloat16),  # H 320 % 128 != 0
        jax.ShapeDtypeStruct((320, 16000), jnp.bfloat16),
        8,
    )
    assert not joint_planes_supported(
        jax.ShapeDtypeStruct((4, 16, 320), jnp.bfloat16),
        jax.ShapeDtypeStruct((4, 8, 320), jnp.bfloat16),
        jax.ShapeDtypeStruct((320, 100), jnp.bfloat16),  # V % 128 != 0
        jax.ShapeDtypeStruct((4, 7), jnp.int32),
    )
    assert not greedy_pallas_supported(
        jax.ShapeDtypeStruct((8, 16, 128), jnp.bfloat16),
        jax.ShapeDtypeStruct((8, 16, 128), jnp.bfloat16),
        jax.ShapeDtypeStruct((128, 128), jnp.bfloat16),
        jax.ShapeDtypeStruct((128, 128), jnp.bfloat16),
        [jax.ShapeDtypeStruct((256, 512), jnp.bfloat16)],
        "gru",  # rnn-type gate
    )
    assert not decoder_pallas_supported(
        jax.ShapeDtypeStruct((4, 8, 128), f32),  # dtype gate
        jax.ShapeDtypeStruct((8, 16, 128), f32),
        jax.ShapeDtypeStruct((8, 16, 128), f32),
        [jax.ShapeDtypeStruct((256, 512), f32)],
    )

    kernels_reported = {k for k, _ in fallback.fallback_events()}
    assert kernels_reported >= {
        "ce_vocab",
        "ctc_vocab_emissions",
        "fused_mhsa",
        "vocab_topk",
        "transducer_joint",
        "greedy_search",
        "las_decoder",
    }
    # every reason must be concrete (mentions the offending dim/dtype/gate)
    for kernel, reason in fallback.fallback_events():
        assert reason and "backend" not in reason, (kernel, reason)


def test_fallback_logs_once_per_process():
    import logging

    from speech_recognition_tpu.ops.pallas import fallback

    fallback.reset_fallbacks()
    records = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    logger = logging.getLogger("speech_recognition_tpu.fastpath")
    handler = _Capture()
    logger.addHandler(handler)
    try:
        for _ in range(3):
            fallback.report_fallback("unit_test_kernel", "some shape reason")
        fallback.report_fallback("unit_test_kernel", "backend reason", loud=False)
    finally:
        logger.removeHandler(handler)
    warn = [r for r in records if r.levelno == logging.WARNING]
    info = [r for r in records if r.levelno == logging.INFO]
    assert len(warn) == 1 and "unit_test_kernel" in warn[0].getMessage()
    assert len(info) == 1
    assert len([e for e in fallback.fallback_events() if e[0] == "unit_test_kernel"]) == 4


def test_flag_registry_covers_sources():
    """Every SRT_* flag referenced anywhere in the package must have a
    registry entry (and therefore a README row + a train_configs.txt dump
    line); a new undocumented flag fails here."""
    import pathlib
    import re

    import speech_recognition_tpu
    from speech_recognition_tpu.utils.srt_flags import SRT_FLAG_DEFAULTS

    pkg = pathlib.Path(speech_recognition_tpu.__file__).parent
    used = set()
    for path in pkg.rglob("*.py"):
        used |= set(re.findall(r"SRT_[A-Z_0-9]+", path.read_text()))
    used.discard("SRT_FLAG_DEFAULTS")
    missing = used - set(SRT_FLAG_DEFAULTS)
    assert not missing, f"undocumented SRT_* flags: {sorted(missing)}"
    stale = set(SRT_FLAG_DEFAULTS) - used
    assert not stale, f"registry entries with no source use: {sorted(stale)}"
