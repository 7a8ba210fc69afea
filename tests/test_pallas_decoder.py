"""Pallas decoder mega-kernel parity vs the XLA scan path (interpret mode).

The real-chip behaviour (VMEM residency, timing) is exercised by
tools/decoder_kernel_check.py and tools/ab_decoder.py on the TPU; this test
pins the math: forward streams and every gradient must match the XLA
custom-VJP scan path (ops/decoder.py) to bf16 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.ops import decoder as D
from speech_recognition_tpu.ops.pallas.decoder_kernel import decoder_fwd_pallas

bf = jnp.bfloat16
N, B, He, S, H, Dv = 4, 8, 16, 8, 16, 16
CHUNK = 8


def _args(n_cells=2):
    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32), bf)
    emb = f(N, B, He) * 0.5
    tm = jnp.asarray((rng.rand(N, B, 1) > 0.2).astype(np.float32), bf)
    pk, val = f(B, S, H) * 0.3, f(B, S, Dv) * 0.3
    bias = jnp.where(jnp.asarray(rng.rand(B, S) > 0.1), 0.0, -1e9).astype(bf)
    qw, qb = f(H, H) * 0.2, f(H) * 0.1
    ks, rs, bs, cms = [], [], [], []
    in_dim = He + Dv
    for _ in range(n_cells):
        ks.append(f(in_dim, 4 * H) * 0.1)
        rs.append(f(H, 4 * H) * 0.1)
        bs.append(f(4 * H) * 0.1)
        cms.append(jnp.ones((B, in_dim), bf))
        in_dim = H
    om = jnp.ones((B, H), bf)
    h0, c0 = f(B, H) * 0.2, f(B, H) * 0.2
    return (emb, tm, pk, val, bias, qw, qb, tuple(ks), tuple(rs), tuple(bs),
            tuple(cms), om, h0, c0)


def _close(a, b, tol=2e-2, msg=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, rtol=0, atol=tol * (np.abs(b).max() + 1e-3), err_msg=msg)


def test_pallas_decoder_fwd_matches_scan():
    args = _args()
    (hl, cl), (hid, hs, ci, zs, cps) = D._decoder_fwd_core(*args)
    with pltpu.force_tpu_interpret_mode():
        (hl2, cl2), (hid2, hs2, ci2, zs2, cps2) = decoder_fwd_pallas(*args, chunk=CHUNK)
    for nm, a, b in [
        ("hidden", hid2, hid), ("h_last", hl2, hl), ("c_last", cl2, cl),
        ("h_start", hs2, hs), ("c_in0", ci2, ci),
    ]:
        _close(a, b, msg=nm)
    for i in range(2):
        _close(zs2[i], zs[i], msg=f"z{i}")
        _close(cps2[i], cps[i], msg=f"cp{i}")


def test_pallas_decoder_grads_match_scan(monkeypatch):
    args = _args()

    def loss(a):
        hidden, h_last, c_last = D.decoder_scan_lstm(*a)
        w = jnp.arange(1, hidden.size + 1, dtype=jnp.float32).reshape(hidden.shape) * 1e-3
        return jnp.sum(hidden.astype(jnp.float32) * w) + jnp.sum(h_last.astype(jnp.float32))

    g_ref = jax.grad(loss)(args)

    monkeypatch.setenv("SRT_PALLAS_DECODER", "1")
    monkeypatch.setenv("SRT_PALLAS_DECODER_BWD", "1")
    monkeypatch.setattr(D, "_use_pallas_decoder", lambda *a: True)
    monkeypatch.setattr(
        "speech_recognition_tpu.ops.pallas.decoder_kernel.decoder_fwd_pallas",
        lambda *a, **k: decoder_fwd_pallas(*a, chunk=CHUNK, **k),
    )
    from speech_recognition_tpu.ops.pallas import decoder_kernel as DK

    bwd_orig = DK.decoder_bwd_pallas
    monkeypatch.setattr(DK, "decoder_bwd_pallas", lambda *a, **k: bwd_orig(*a, chunk=CHUNK, **k))

    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss)(args)

    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    assert len(flat_r) == len(flat_p)
    for i, (r, p) in enumerate(zip(flat_r, flat_p)):
        _close(p, r, tol=3e-2, msg=f"grad leaf {i}")
