"""Fused RNN-T joint-planes Pallas pair (ops/pallas/transducer_kernel.py):
math parity with the XLA scan path (values AND all four gradients), both
lane layouts (TF=2 and TF=1), and the support gate.

Interpret mode only here (the kernels are multi-step-grid, which deadlocks
under shard_map + force_tpu_interpret_mode on the virtual CPU backend —
CLAUDE.md round-5); the on-chip step-level A/B is tools/family_bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.ops.transducer import joint_log_planes
from speech_recognition_tpu.ops.pallas.transducer_kernel import (
    fused_joint_planes,
    joint_planes_supported,
)

bf = jnp.bfloat16


def _case(seed, B, T, J, U1, V):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(B, T, J).astype(np.float32) * 0.4, bf)
    pred = jnp.asarray(rng.randn(B, U1, J).astype(np.float32) * 0.4, bf)
    wo = jnp.asarray(rng.randn(J, V).astype(np.float32) * 0.3, bf)
    bo = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, bf)
    ids = jnp.asarray(rng.randint(1, V, (B, U1 - 1)), jnp.int32)
    cb = jnp.asarray(rng.randn(B, T, U1).astype(np.float32))
    ce = jnp.asarray(rng.randn(B, T, U1 - 1).astype(np.float32))
    return enc, pred, wo, bo, ids, cb, ce


@pytest.mark.parametrize(
    "seed,B,T,J,U1,V",
    [
        (0, 2, 4, 16, 3, 256),    # TF=2 (U1p=64), uneven U1
        (1, 3, 6, 8, 5, 128),     # TF=2, different dims
        (2, 2, 3, 16, 100, 256),  # TF=1 (U1p=128)
        (5, 2, 5, 16, 3, 256),    # TF=2 with ODD T (frame padding path)
    ],
)
def test_fused_matches_scan_values_and_grads(seed, B, T, J, U1, V):
    enc, pred, wo, bo, ids, cb, ce = _case(seed, B, T, J, U1, V)
    blank = 0

    def scal(fn):
        def s(enc, pred, wo, bo):
            lpb, lpe = fn(blank, enc, pred, wo, bo, ids)
            return jnp.sum(lpb * cb) + jnp.sum(lpe * ce)

        return s

    lpb_r, lpe_r = joint_log_planes(blank, enc, pred, wo, bo, ids)
    l_r, g_r = jax.value_and_grad(scal(joint_log_planes), argnums=(0, 1, 2, 3))(
        enc, pred, wo, bo
    )
    with pltpu.force_tpu_interpret_mode():
        lpb_f, lpe_f = fused_joint_planes(blank, enc, pred, wo, bo, ids)
        l_f, g_f = jax.value_and_grad(scal(fused_joint_planes), argnums=(0, 1, 2, 3))(
            enc, pred, wo, bo
        )

    np.testing.assert_allclose(
        np.asarray(lpb_f), np.asarray(lpb_r), rtol=0, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(lpe_f), np.asarray(lpe_r), rtol=0, atol=5e-3
    )
    assert abs(float(l_r) - float(l_f)) < 5e-2 * (1 + abs(float(l_r)))
    for name, a, g in zip(("enc", "pred", "wo", "bo"), g_r, g_f):
        a, g = np.asarray(a, np.float32), np.asarray(g, np.float32)
        np.testing.assert_allclose(
            g, a, rtol=0, atol=4e-2 * (np.abs(a).max() + 1e-3), err_msg=name
        )


def test_nonzero_blank_index():
    enc, pred, wo, bo, ids, cb, ce = _case(3, 2, 4, 8, 3, 128)
    blank = 77
    lpb_r, lpe_r = joint_log_planes(blank, enc, pred, wo, bo, ids)
    with pltpu.force_tpu_interpret_mode():
        lpb_f, lpe_f = fused_joint_planes(blank, enc, pred, wo, bo, ids)
    np.testing.assert_allclose(np.asarray(lpb_f), np.asarray(lpb_r), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lpe_f), np.asarray(lpe_r), rtol=0, atol=5e-3)


def test_support_gate(monkeypatch):
    enc, pred, wo, bo, ids, *_ = _case(4, 2, 4, 16, 3, 256)
    monkeypatch.setenv("SRT_PALLAS_FORCE", "1")
    # bf16 + aligned dims + no multi-device mesh problem -> supported...
    # (conftest runs 8 virtual devices with no registered mesh: gate off)
    import jax as _jax

    expected = len(_jax.devices()) == 1
    assert joint_planes_supported(enc, pred, wo, ids) == expected
    # f32 activations are never supported
    assert not joint_planes_supported(
        enc.astype(jnp.float32), pred.astype(jnp.float32), wo, ids
    )
    # vocab not 128-aligned
    assert not joint_planes_supported(enc, pred, wo[:, :200], ids)
    monkeypatch.delenv("SRT_PALLAS_FORCE")
    monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
    assert not joint_planes_supported(enc, pred, wo, ids)


def test_shape_sweep_fused_or_loud_fallback(monkeypatch):
    """VMEM-margin guard (VERDICT r3 #7): over a sweep of (U1, J, V, lane)
    configs, every shape either FIRES the fused pair (then values match the
    scan path) or declines LOUDLY through the fallback funnel — no silent
    scan-path regression is reachable from a config change."""
    from speech_recognition_tpu.ops.pallas import fallback

    monkeypatch.setenv("SRT_PALLAS_FORCE", "1")
    import jax as _jax

    if len(_jax.devices()) != 1:
        # batch_shards needs the single-device case; mock it like the
        # gate-fires tests do (tests/test_fastpath_gates.py)
        from speech_recognition_tpu.ops.pallas import transducer_kernel as tk

        monkeypatch.setattr(tk, "batch_shards", lambda n: (1, n))

    sweep = [
        # (B, T, J, U1, V, lanes) — mix of firing and declining configs
        (2, 4, 16, 3, 256, "128"),
        (2, 4, 16, 3, 256, "256"),     # wide-lane layout
        (2, 3, 16, 100, 256, "128"),   # U1p=128
        (2, 3, 16, 600, 256, "128"),   # U1 > 512 -> loud decline
        (2, 4, 16, 3, 200, "128"),     # V % 128 -> loud decline
        (2, 4, 12, 3, 256, "128"),     # J % 8 -> loud decline
    ]
    for B, T, J, U1, V, lanes in sweep:
        monkeypatch.setenv("SRT_JOINT_LANES", lanes)
        enc, pred, wo, bo, ids, cb, ce = _case(7, B, T, J, U1, V)
        fallback.reset_fallbacks()
        if joint_planes_supported(enc, pred, wo, ids):
            lpb_r, lpe_r = joint_log_planes(0, enc, pred, wo, bo, ids)
            with pltpu.force_tpu_interpret_mode():
                lpb_f, lpe_f = fused_joint_planes(0, enc, pred, wo, bo, ids)
            np.testing.assert_allclose(
                np.asarray(lpb_f), np.asarray(lpb_r), rtol=0, atol=5e-3,
                err_msg=str((B, T, J, U1, V, lanes)),
            )
            np.testing.assert_allclose(
                np.asarray(lpe_f), np.asarray(lpe_r), rtol=0, atol=5e-3,
                err_msg=str((B, T, J, U1, V, lanes)),
            )
        else:
            events = [e for e in fallback.fallback_events() if e[0] == "transducer_joint"]
            assert events, f"silent decline at {(B, T, J, U1, V, lanes)}"
    monkeypatch.delenv("SRT_JOINT_LANES")


def test_vmem_guard_suggests_lane_width(monkeypatch):
    """When a wide-lane layout busts the VMEM budget, the decline reason
    must name a narrower SRT_JOINT_LANES that fits."""
    from speech_recognition_tpu.ops.pallas import fallback
    from speech_recognition_tpu.ops.pallas import transducer_kernel as tk

    monkeypatch.setenv("SRT_PALLAS_FORCE", "1")
    monkeypatch.setattr(tk, "batch_shards", lambda n: (1, n))
    monkeypatch.setenv("SRT_JOINT_LANES", "512")  # TF=8 at U1<=64: L=512
    fallback.reset_fallbacks()
    enc = jax.ShapeDtypeStruct((2, 8, 320), jnp.bfloat16)
    pred = jax.ShapeDtypeStruct((2, 63, 320), jnp.bfloat16)
    wo = jax.ShapeDtypeStruct((320, 16000), jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((2, 62), jnp.int32)
    assert not joint_planes_supported(enc, pred, wo, ids)
    reasons = [r for k, r in fallback.fallback_events() if k == "transducer_joint"]
    assert reasons and "VMEM" in reasons[-1]
    assert "SRT_JOINT_LANES=" in reasons[-1], reasons[-1]
    monkeypatch.delenv("SRT_JOINT_LANES")
