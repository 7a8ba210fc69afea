"""Fused MHSA Pallas pair: math parity, dropout mechanics, gates (interpret).

The kernel (ops/pallas/attention_kernel.py) must reproduce the plain XLA
attention in models/conformer.py MHSA exactly at dropout 0 (values AND all
three gradients), and its in-kernel hardware-PRNG dropout must be a true
Bernoulli(1-p)/(1-p) with a backward that differentiates the *sampled*
function (the fwd and bwd kernels regenerate the identical mask from the
per-example seeds — pinned here with a finite-difference check).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.ops.pallas.attention_kernel import (
    NEG_INF,
    fused_mhsa,
    fused_mhsa_supported,
)

B, T, H, d = 2, 128, 2, 64
D = H * d
SCALE = float(1.0 / np.sqrt(d))
ZSEEDS = jnp.zeros((B,), jnp.int32)


def _operands(dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.3, dtype)
    q, k, v = mk(), mk(), mk()
    mask = jnp.arange(T)[None, :] < jnp.asarray(np.array([T, 77]))[:, None]
    bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    return q, k, v, mask, bias


def _oracle(q, k, v, mask):
    """The plain-path math from models/conformer.py MHSA, dropout 0."""
    qh, kh, vh = (a.reshape(B, T, H, d) for a in (q, k, v))
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.float32(d))
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, T, D)


def test_fwd_and_grads_match_plain_f32():
    q, k, v, mask, bias = _operands()
    co = jnp.asarray(np.random.RandomState(1).randn(B, T, D).astype(np.float32))
    f = lambda q, k, v: jnp.sum(fused_mhsa(q, k, v, bias, ZSEEDS, H, SCALE, 0.0) * co)
    g = lambda q, k, v: jnp.sum(_oracle(q, k, v, mask) * co)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(f, (0, 1, 2))(q, k, v)
    l_r, g_r = jax.value_and_grad(g, (0, 1, 2))(q, k, v)
    assert abs(float(l_f) - float(l_r)) < 1e-3 * (abs(float(l_r)) + 1.0)
    for a, b, name in zip(g_f, g_r, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=1e-4 * (np.abs(b).max() + 1e-3), err_msg=f"d{name}"
        )


def test_fwd_matches_plain_bf16():
    q, k, v, mask, bias = _operands(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mhsa(q, k, v, bias, ZSEEDS, H, SCALE, 0.0)
    ref = _oracle(q, k, v, mask)
    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-2 * (np.abs(b).max() + 1e-3))


# ---- Dropout mechanics.  The keep mask is a counter-based position hash
# (attention_kernel._keep_mask) — plain int32 ops, so the same masks fall
# out under CPU interpret mode as on hardware.  (The TPU hardware PRNG was
# measured to place its bit stream differently in the fwd and bwd kernels,
# which is why the hash exists — see the kernel docstring.)


def test_dropout_deterministic_in_seeds_and_seed_sensitive():
    q, k, v, mask, bias = _operands()
    s1 = jnp.asarray([3, 17], jnp.int32)
    s2 = jnp.asarray([3, 99], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        o1a = fused_mhsa(q, k, v, bias, s1, H, SCALE, 0.3)
        o1b = fused_mhsa(q, k, v, bias, s1, H, SCALE, 0.3)
        o2 = fused_mhsa(q, k, v, bias, s2, H, SCALE, 0.3)
        o_nodrop = fused_mhsa(q, k, v, bias, s1, H, SCALE, 0.0)
    np.testing.assert_array_equal(np.asarray(o1a), np.asarray(o1b))
    # example 0 shares its seed, example 1 differs
    assert np.array_equal(np.asarray(o1a[0]), np.asarray(o2[0]))
    assert not np.array_equal(np.asarray(o1a[1]), np.asarray(o2[1]))
    assert not np.array_equal(np.asarray(o1a), np.asarray(o_nodrop))


def test_dropout_preserves_expectation():
    """With v = ones, each context row is the sum of the dropped probs —
    Bernoulli(1-p)/(1-p) keeps E[row] = 1."""
    q, k, _, mask, bias = _operands()
    v = jnp.ones((B, T, D), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mhsa(q, k, v, bias, jnp.asarray([5, 6], jnp.int32), H, SCALE, 0.5)
    rows = np.asarray(out[0])  # example 0: all keys valid
    assert abs(rows.mean() - 1.0) < 0.03
    # and some probability mass was actually dropped
    assert rows.std() > 0.01


def test_dropout_matches_mask_replicated_oracle():
    """The keep mask is a pure position hash, so the exact sampled function
    can be rebuilt in plain jnp — fused values and all grads must match it.
    (This is the on-chip-safe form of the FD check below: FD is invalid on
    real TPUs because DEFAULT-precision f32 matmuls run as single-pass bf16
    and 1e-3 perturbations sit below MXU resolution.)"""
    from speech_recognition_tpu.ops.pallas.attention_kernel import _keep_mask

    q, k, v, mask, bias = _operands()
    seeds = jnp.asarray([21, 22], jnp.int32)
    p_drop = 0.25
    keep = jnp.stack([
        jnp.stack([_keep_mask(seeds[b], h, (T, T), p_drop) for h in range(H)])
        for b in range(B)
    ])  # [B, H, T, T]

    def oracle_drop(q, k, v):
        qh, kh, vh = (a.reshape(B, T, H, d) for a in (q, k, v))
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.float32(d))
        s = jnp.where(mask[:, None, None, :], s, NEG_INF)
        p = jax.nn.softmax(s, -1)
        pd = jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", pd, vh).reshape(B, T, D)

    co = jnp.asarray(np.random.RandomState(4).randn(B, T, D).astype(np.float32))
    f = lambda q, k, v: jnp.sum(fused_mhsa(q, k, v, bias, seeds, H, SCALE, p_drop) * co)
    g = lambda q, k, v: jnp.sum(oracle_drop(q, k, v) * co)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(f, (0, 1, 2))(q, k, v)
    l_r, g_r = jax.value_and_grad(g, (0, 1, 2))(q, k, v)
    assert abs(float(l_f) - float(l_r)) < 1e-3 * (abs(float(l_r)) + 1.0)
    for a, b, name in zip(g_f, g_r, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=1e-4 * (np.abs(b).max() + 1e-3), err_msg=f"d{name}"
        )


@pytest.mark.skipif(jax.default_backend() == "tpu", reason="FD invalid on MXU bf16")
def test_dropout_backward_differentiates_the_sampled_function():
    """Finite differences through the fixed-seed sampled function must match
    the custom VJP — this fails if the backward kernel regenerates a
    different dropout mask than the forward."""
    q, k, v, mask, bias = _operands()
    seeds = jnp.asarray([11, 12], jnp.int32)
    co = jnp.asarray(np.random.RandomState(2).randn(B, T, D).astype(np.float32))

    def f(q, k, v):
        return jnp.sum(fused_mhsa(q, k, v, bias, seeds, H, SCALE, 0.25) * co)

    rng = np.random.RandomState(3)
    dirs = [jnp.asarray(rng.randn(B, T, D).astype(np.float32)) for _ in range(3)]
    eps = 1e-3
    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(f, (0, 1, 2))(q, k, v)
        for i, (g, u) in enumerate(zip(grads, dirs)):
            args_p = [q, k, v]
            args_m = [q, k, v]
            args_p[i] = args_p[i] + eps * u
            args_m[i] = args_m[i] - eps * u
            fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            vjp = float(jnp.sum(g * u))
            assert abs(fd - vjp) < 2e-2 * (abs(fd) + 1.0), f"arg {i}: fd={fd} vjp={vjp}"


def test_supported_gate(monkeypatch):
    from speech_recognition_tpu.parallel import get_device_mesh, set_active_mesh

    monkeypatch.setenv("SRT_PALLAS_FORCE", "1")
    set_active_mesh(None)  # earlier tests may leave a mesh registered
    if len(jax.devices()) > 1:
        # multi-device: the gate requires a registered mesh whose data axis
        # divides the batch (same contract as the CE/CTC/decoder gates)
        assert not fused_mhsa_supported(B, T, D, H, jnp.bfloat16)
        get_device_mesh(data_parallel=2, model_parallel=1)
    try:
        assert fused_mhsa_supported(B, T, D, H, jnp.bfloat16)
        assert fused_mhsa_supported(B, T, D, H, jnp.float32)
        assert not fused_mhsa_supported(B, 100, D, H, jnp.bfloat16)   # ragged T
        assert not fused_mhsa_supported(B, T, 96, 2, jnp.bfloat16)    # D % 128
        assert not fused_mhsa_supported(B, T, D, 3, jnp.bfloat16)     # D % H
        assert not fused_mhsa_supported(B, T, D, H, jnp.float16)      # dtype
        monkeypatch.delenv("SRT_PALLAS_FORCE")
        if jax.default_backend() != "tpu":
            assert not fused_mhsa_supported(B, T, D, H, jnp.bfloat16)  # backend
    finally:
        set_active_mesh(None)


def test_conformer_mhsa_module_fused_equals_plain(monkeypatch):
    """Model-level: the MHSA module picks the fused kernel under the forced
    gate and produces the plain path's logits (dropout 0, f32)."""
    from speech_recognition_tpu.models import Conformer

    model = Conformer(
        vocab_size=40, encoder_dim=D, num_layers=2, num_attention_heads=H,
        conv_kernel_size=8, ffn_expansion=2, dropout=0.0,
        subsample_channels=(4, 4), blank_index=39, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    # T=515 -> T'=128 after the two VALID stride-2 convs (gate needs T'%128=0)
    audio = jax.random.uniform(rng, (B, 515, 20, 1), minval=0.1)
    audio = audio.at[1, 430:].set(0.0)
    variables = model.init({"params": rng}, audio)

    monkeypatch.setenv("SRT_FUSED_MHSA", "0")
    plain = model.apply(variables, audio)
    monkeypatch.setenv("SRT_FUSED_MHSA", "1")
    monkeypatch.setenv("SRT_PALLAS_FORCE", "1")
    with pltpu.force_tpu_interpret_mode():
        fused = model.apply(variables, audio)
    a, b = np.asarray(fused), np.asarray(plain)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * (np.abs(b).max() + 1e-3))
