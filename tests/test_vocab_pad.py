"""Vocab-pad shim (ops/pallas/vocab_pad.py): the fused vocab kernels keep
firing at lane-unaligned vocab sizes — kspon's 8K sentencepiece model gives
V=8000 (8000 % 128 = 64), which previously declined EVERY fused vocab path
(CE, CTC emissions, dense/banded transducer joint, decode top-k) and left
Korean configs on the slow XLA fallbacks.

Padding the projection (zero weight columns + -1e30 bias) is exact math:
pad logits underflow every logsumexp and can never win an argmax/top-k.
These tests pin value AND gradient equality against the plain-XLA paths at
V % 128 != 0 (interpret mode), the call-site wiring (the fused branch must
actually FIRE with padded operands), and the support gates at the real
kspon shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.ops.pallas.vocab_pad import (
    pad_vocab_proj,
    pad_vocab_rows,
    vocab_pad_amount,
)

bf = jnp.bfloat16


def test_pad_helper_shapes_and_values():
    assert vocab_pad_amount(8000) == 64
    assert vocab_pad_amount(16000) == 0
    assert vocab_pad_amount(200) == 56
    W = jnp.ones((4, 200), jnp.float32)
    b = jnp.ones((200,), jnp.float32)
    Wp, bp = pad_vocab_proj(W, b)
    assert Wp.shape == (4, 256) and bp.shape == (256,)
    assert float(jnp.abs(Wp[:, 200:]).sum()) == 0.0
    assert float(bp[200]) == float(np.float32(-1e30)) and float(bp[199]) == 1.0
    # aligned: identity (no copies inserted into aligned-vocab graphs)
    W16, b16 = pad_vocab_proj(jnp.ones((4, 128)), jnp.ones((128,)))
    assert W16.shape == (4, 128) and b16.shape == (128,)
    emb = pad_vocab_rows(jnp.ones((200, 8), bf))
    assert emb.shape == (256, 8) and float(jnp.abs(emb[200:]).sum()) == 0.0
    # -1e30 must stay finite (and hugely negative) in bf16
    assert np.isfinite(np.asarray(bp.astype(bf)[200], np.float32))


def test_fused_ce_padded_vocab_matches_reference():
    """fused_ce_vocab with a 200->256 padded projection == plain CE at
    V=200: loss, argmax preds, and all three grads."""
    from speech_recognition_tpu.measure import sparse_categorical_crossentropy
    from speech_recognition_tpu.ops.pallas.ce_kernel import fused_ce_vocab

    N, B, H, V = 3, 8, 16, 200
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
        Wp, bp = pad_vocab_proj(W, b)  # inside: grads flow through the pad
        return fused_ce_vocab(hid, Wp, bp, y, 0)[0]

    l_ref, g_ref = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(hid, W, b)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(hid, W, b)
        Wp, bp = pad_vocab_proj(W, b)
        _, preds = fused_ce_vocab(hid, Wp, bp, y, 0)

    assert abs(float(l_ref) - float(l_f)) < 2e-3
    logits = np.asarray(hid @ W.astype(bf) + b.astype(bf), np.float32)
    assert np.array_equal(np.asarray(preds), logits.argmax(-1))  # never a pad id
    for name, a, g in zip("hWb", g_ref, g_f):
        a, g = np.asarray(a, np.float32), np.asarray(g, np.float32)
        assert g.shape == a.shape, name  # pad columns sliced off the grads
        np.testing.assert_allclose(
            g, a, rtol=0, atol=2e-2 * (np.abs(a).max() + 1e-3), err_msg=name
        )


def _force_gates(monkeypatch, *mods):
    """The single-TPU device environment (tests run on the virtual CPU mesh
    where gates legitimately decline): backend ok + trivial batch shards."""
    for mod in mods:
        monkeypatch.setattr(mod, "pallas_backend_ok", lambda: True)
        monkeypatch.setattr(mod, "batch_shards", lambda n: (1, n))


def test_ctc_call_site_pads_fires_and_matches(monkeypatch):
    """measure.ctc_loss_from_hidden at V=200: the call site pads, the fused
    branch FIRES, and loss + grads equal the plain-XLA branch."""
    from speech_recognition_tpu import measure
    from speech_recognition_tpu.ops.pallas import ctc_kernel

    B, T, H, V, K = 4, 6, 128, 200, 5
    rng = np.random.RandomState(1)
    hid = jnp.asarray(rng.randn(B, T, H).astype(np.float32) * 0.3, bf)
    W = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, jnp.float32)
    y = jnp.asarray(rng.randint(2, V, (B, K)), jnp.int32)
    y = y.at[2, 3:].set(0).at[3, :].set(0)  # padded + all-pad rows

    loss = lambda hid, W, b: measure.ctc_loss_from_hidden(y, hid, W, b, 1, 0)
    l_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1, 2))(hid, W, b)

    fired = []
    real = ctc_kernel.fused_vocab_emissions
    monkeypatch.setattr(
        ctc_kernel, "fused_vocab_emissions",
        lambda *a: (fired.append(a[1].shape), real(*a))[1],
    )
    _force_gates(monkeypatch, ctc_kernel)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(loss, argnums=(0, 1, 2))(hid, W, b)

    assert fired and fired[0][-1] == 256  # the fused branch ran, padded
    assert abs(float(l_ref) - float(l_f)) < 2e-3 * (1 + abs(float(l_ref)))
    for name, a, g in zip("hWb", g_ref, g_f):
        a, g = np.asarray(a, np.float32), np.asarray(g, np.float32)
        assert g.shape == a.shape, name
        np.testing.assert_allclose(
            g, a, rtol=0, atol=3e-2 * (np.abs(a).max() + 1e-3), err_msg=name
        )


def test_joint_planes_padded_vocab_matches_xla():
    """fused_joint_planes with a padded projection == XLA scan at V=200
    (planes + grads; pad columns only touch the in-kernel logsumexp)."""
    from speech_recognition_tpu.ops.transducer import joint_log_planes
    from speech_recognition_tpu.ops.pallas.transducer_kernel import fused_joint_planes

    B, T, J, U1, V = 2, 4, 16, 3, 200
    rng = np.random.RandomState(2)
    enc = jnp.asarray(rng.randn(B, T, J).astype(np.float32) * 0.4, bf)
    pred = jnp.asarray(rng.randn(B, U1, J).astype(np.float32) * 0.4, bf)
    wo = jnp.asarray(rng.randn(J, V).astype(np.float32) * 0.3, bf)
    bo = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, bf)
    ids = jnp.asarray(rng.randint(1, V, (B, U1 - 1)), jnp.int32)
    cb = jnp.asarray(rng.randn(B, T, U1).astype(np.float32))
    ce = jnp.asarray(rng.randn(B, T, U1 - 1).astype(np.float32))

    def scal(fn, pad):
        def s(enc, pred, wo, bo):
            if pad:
                wo2, bo2 = pad_vocab_proj(wo, bo)
            else:
                wo2, bo2 = wo, bo
            lpb, lpe = fn(0, enc, pred, wo2, bo2, ids)
            return jnp.sum(lpb * cb) + jnp.sum(lpe * ce)

        return s

    l_r, g_r = jax.value_and_grad(scal(joint_log_planes, False), argnums=(0, 1, 2, 3))(
        enc, pred, wo, bo
    )
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(
            scal(fused_joint_planes, True), argnums=(0, 1, 2, 3)
        )(enc, pred, wo, bo)
    assert abs(float(l_r) - float(l_f)) < 5e-2 * (1 + abs(float(l_r)))
    for name, a, g in zip(("enc", "pred", "wo", "bo"), g_r, g_f):
        a, g = np.asarray(a, np.float32), np.asarray(g, np.float32)
        assert g.shape == a.shape, name
        np.testing.assert_allclose(
            g, a, rtol=0, atol=4e-2 * (np.abs(a).max() + 1e-3), err_msg=name
        )


def test_transducer_loss_call_site_pads_and_fires(monkeypatch):
    """models/transducer.py's _planes wiring: at V=200 the fused joint FIRES
    with padded operands and the loss equals the SRT_FUSED_JOINT=0 scan."""
    from speech_recognition_tpu.models import Transducer
    from speech_recognition_tpu.ops.pallas import transducer_kernel

    B, T, J, U1, V = 2, 4, 16, 4, 200
    rng = np.random.RandomState(3)
    outputs = {
        "enc_proj": jnp.asarray(rng.randn(B, T, J).astype(np.float32) * 0.4, bf),
        "pred_proj": jnp.asarray(rng.randn(B, U1, J).astype(np.float32) * 0.4, bf),
        "joint_kernel": jnp.asarray(rng.randn(J, V).astype(np.float32) * 0.3, bf),
        "joint_bias": jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, bf),
        "frame_lens": jnp.array([T, T - 1], jnp.int32),
    }
    y_true = jnp.asarray(rng.randint(2, V, (B, U1)), jnp.int32).at[:, -1].set(0)
    loss_fn = Transducer(
        vocab_size=V, encoder_dim=J, num_encoder_layers=1, num_attention_heads=1,
        conv_kernel_size=3, ffn_expansion=1, subsample_channels=(4, 4),
        pred_dim=8, num_pred_layers=1, joint_dim=J, dropout=0.0,
    ).get_loss_fn()

    monkeypatch.setenv("SRT_FUSED_JOINT", "0")
    l_scan = loss_fn(y_true, outputs)

    monkeypatch.setenv("SRT_FUSED_JOINT", "1")
    fired = []
    real = transducer_kernel.fused_joint_planes
    monkeypatch.setattr(
        transducer_kernel, "fused_joint_planes",
        lambda blank, enc, pred, wo, bo, ids: (
            fired.append(wo.shape), real(blank, enc, pred, wo, bo, ids)
        )[1],
    )
    _force_gates(monkeypatch, transducer_kernel)
    with pltpu.force_tpu_interpret_mode():
        l_fused = loss_fn(y_true, outputs)
    assert fired and fired[0][-1] == 256
    assert abs(float(l_scan) - float(l_fused)) < 5e-2 * (1 + abs(float(l_scan)))


def test_pruned_call_site_pads_and_fires(monkeypatch):
    """ops/transducer_pruned.py's banded wiring: at V=200 the fused banded
    pair FIRES with padded operands and matches the XLA banded scan."""
    from speech_recognition_tpu.ops import transducer_pruned as tp
    from speech_recognition_tpu.ops.pallas import band_kernel

    B, T, J, U1, V, S = 2, 6, 16, 5, 200, 4
    rng = np.random.RandomState(4)
    enc = jnp.asarray(rng.randn(B, T, J).astype(np.float32) * 0.4, bf)
    pred = jnp.asarray(rng.randn(B, U1, J).astype(np.float32) * 0.4, bf)
    wo = jnp.asarray(rng.randn(J, V).astype(np.float32) * 0.3, bf)
    bo = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, bf)
    ids = jnp.asarray(rng.randint(1, V, (B, U1 - 1)), jnp.int32)
    frame_lens = jnp.array([T, T - 1], jnp.int32)
    label_lens = jnp.array([U1 - 1, U1 - 2], jnp.int32)

    monkeypatch.setenv("SRT_FUSED_JOINT", "0")
    lpb_s, lpe_s = tp.pruned_log_planes(0, S, enc, pred, wo, bo, ids, frame_lens, label_lens)

    monkeypatch.setenv("SRT_FUSED_JOINT", "1")
    fired = []
    real = band_kernel.fused_banded_planes
    monkeypatch.setattr(
        band_kernel, "fused_banded_planes",
        lambda blank, s, enc, pred, wo, bo, ids, p: (
            fired.append(wo.shape), real(blank, s, enc, pred, wo, bo, ids, p)
        )[1],
    )
    _force_gates(monkeypatch, band_kernel)
    with pltpu.force_tpu_interpret_mode():
        lpb_f, lpe_f = tp.pruned_log_planes(
            0, S, enc, pred, wo, bo, ids, frame_lens, label_lens
        )
    assert fired and fired[0][-1] == 256
    for a, f in ((lpb_s, lpb_f), (lpe_s, lpe_f)):
        a, f = np.asarray(a, np.float32), np.asarray(f, np.float32)
        on = a > -1e29  # band floor entries compare by mask, not value
        assert np.array_equal(on, f > -1e29)
        np.testing.assert_allclose(f[on], a[on], rtol=0, atol=5e-3)


def test_vocab_topk_padded_matches_reference():
    """vocab_topk_pallas with a padded projection == the XLA top-k path at
    V=200: values, indices (all < 200), and logsumexp."""
    from speech_recognition_tpu.ops.pallas.topk_kernel import vocab_topk_pallas
    from speech_recognition_tpu.parallel import get_device_mesh
    from speech_recognition_tpu.parallel.mesh import set_active_mesh

    R, H, V, k = 32, 128, 200, 8
    rng = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(rng, 3)
    hid = jax.random.normal(k1, (R, H), jnp.float32).astype(bf)
    W = jax.random.normal(k2, (H, V), jnp.float32)
    b = jax.random.normal(k3, (V,), jnp.float32)

    # XLA reference at the raw V — same math as tests/test_pallas_topk._ref
    # (bf16-rounded matmul, bias added in bf16)
    logits = (
        jnp.dot(hid, W.astype(hid.dtype), preferred_element_type=jnp.float32).astype(bf)
        + b.astype(hid.dtype)
    ).astype(jnp.float32)
    vals_r, idx_r = jax.lax.top_k(logits, k)
    lse_r = jax.nn.logsumexp(logits, axis=-1)

    get_device_mesh(1, 1, devices=jax.devices()[:1])
    try:
        Wp, bp = pad_vocab_proj(W, b)
        with pltpu.force_tpu_interpret_mode():
            vals, idx, lse = jax.jit(vocab_topk_pallas, static_argnums=3)(
                hid, Wp.astype(bf), bp, k
            )
    finally:
        set_active_mesh(None)
    assert int(jnp.max(idx)) < V  # pad columns never selected
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_r), rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_r), rtol=0, atol=2e-3)


def test_gates_fire_at_kspon_vocab(monkeypatch):
    """The real kspon shapes (V=8000 -> padded 8064) must pass every train
    fast-path gate; the raw 8000 must decline (documents why the shim
    exists).  Mirrors test_fastpath_gates.py's bench-shape pins."""
    from speech_recognition_tpu.ops.pallas import (
        band_kernel,
        ce_kernel,
        ctc_kernel,
        topk_kernel,
        transducer_kernel,
    )

    _force_gates(
        monkeypatch, ce_kernel, ctc_kernel, transducer_kernel, band_kernel, topk_kernel
    )
    V, Vp = 8000, 8064
    # LAS CE: decoder H=256, N=128 steps
    hid = jax.ShapeDtypeStruct((128, 128, 256), bf)
    assert not ce_kernel.ce_vocab_pallas_supported(
        hid, jax.ShapeDtypeStruct((256, V), bf)
    )
    assert ce_kernel.ce_vocab_pallas_supported(hid, jax.ShapeDtypeStruct((256, Vp), bf))
    # DS2/Conformer CTC emissions: T'=256 frames, H=256
    hid = jax.ShapeDtypeStruct((128, 256, 256), bf)
    ids = jax.ShapeDtypeStruct((128, 65), jnp.int32)
    assert not ctc_kernel.vocab_emissions_supported(
        hid, jax.ShapeDtypeStruct((256, V), bf), ids
    )
    assert ctc_kernel.vocab_emissions_supported(
        hid, jax.ShapeDtypeStruct((256, Vp), bf), ids
    )
    # transducer joint (dense + banded): T'=255, U1=63, J=320
    enc = jax.ShapeDtypeStruct((128, 255, 320), bf)
    pred = jax.ShapeDtypeStruct((128, 63, 320), bf)
    ids = jax.ShapeDtypeStruct((128, 62), jnp.int32)
    assert not transducer_kernel.joint_planes_supported(
        enc, pred, jax.ShapeDtypeStruct((320, V), bf), ids
    )
    assert transducer_kernel.joint_planes_supported(
        enc, pred, jax.ShapeDtypeStruct((320, Vp), bf), ids
    )
    assert not band_kernel.banded_planes_supported(
        enc, pred, jax.ShapeDtypeStruct((320, V), bf), ids, 4
    )
    assert band_kernel.banded_planes_supported(
        enc, pred, jax.ShapeDtypeStruct((320, Vp), bf), ids, 4
    )
    # TSD top-k at the padded joint dim (V=8000 has no 128-multiple chunk)
    hid = jax.ShapeDtypeStruct((128 * 4, 384), bf)
    assert not topk_kernel.vocab_topk_pallas_supported(
        hid, jax.ShapeDtypeStruct((384, V), bf), 7
    )
    assert topk_kernel.vocab_topk_pallas_supported(
        hid, jax.ShapeDtypeStruct((384, Vp), bf), 7
    )
