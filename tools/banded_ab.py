"""On-chip probe + isolated A/B for the banded joint pair (band_kernel.py).

Phase 1 (small shapes): fused-vs-XLA value/grad agreement ON THE REAL CHIP
(the interpret-mode tests cover math; this validates the Mosaic lowering).
Phase 2 (bench shapes): isolated joint fwd+bwd timing, banded fused vs the
dense fused pair (transducer_kernel.py) — the expected ~8x FLOP cut.

Run: timeout 3000 python tools/banded_ab.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.ops.pallas.band_kernel import (
    banded_planes_supported,
    fused_banded_planes,
)
from speech_recognition_tpu.ops.pallas.transducer_kernel import (
    fused_joint_planes,
    joint_planes_supported,
)
from speech_recognition_tpu.ops.transducer import joint_log_planes
from speech_recognition_tpu.ops.transducer_pruned import band_offsets, banded_joint_planes

bf = jnp.bfloat16


def case(B, T, J, U1, V, seed=0):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(B, T, J).astype(np.float32) * 0.4, bf)
    pred = jnp.asarray(rng.randn(B, U1, J).astype(np.float32) * 0.4, bf)
    wo = jnp.asarray(rng.randn(J, V).astype(np.float32) * 0.3, bf)
    bo = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, bf)
    ids = jnp.asarray(rng.randint(1, V, (B, U1 - 1)), jnp.int32)
    fl = jnp.full((B,), T, jnp.int32)
    ll = jnp.asarray(rng.randint(max(U1 // 2, 1), U1, (B,)), jnp.int32)
    return enc, pred, wo, bo, ids, fl, ll


def scalar(fn, S, ids, p, cb, ce):
    def s(enc, pred, wo, bo):
        lpb, lpe = fn(0, S, enc, pred, wo, bo, ids, p)
        return jnp.sum(lpb * cb) + jnp.sum(lpe * ce)

    return s


def probe():
    B, T, J, U1, V, S = 8, 33, 320, 63, 16000, 8
    enc, pred, wo, bo, ids, fl, ll = case(B, T, J, U1, V)
    p = band_offsets(fl, ll, T, S)
    assert banded_planes_supported(enc, pred, wo, ids, S), "gate must fire on chip"
    u_true = np.asarray(p)[:, :, None] + np.arange(S)[None, None, :]
    valid_b = jnp.asarray(u_true <= U1 - 1)
    valid_e = jnp.asarray(u_true <= U1 - 2)
    rng = np.random.RandomState(9)
    cb = jnp.asarray(rng.randn(B, T, S).astype(np.float32)) * valid_b
    ce = jnp.asarray(rng.randn(B, T, S).astype(np.float32)) * valid_e

    l_r, g_r = jax.jit(jax.value_and_grad(
        scalar(banded_joint_planes, S, ids, p, cb, ce), argnums=(0, 1, 2, 3)
    ))(enc, pred, wo, bo)
    l_f, g_f = jax.jit(jax.value_and_grad(
        scalar(fused_banded_planes, S, ids, p, cb, ce), argnums=(0, 1, 2, 3)
    ))(enc, pred, wo, bo)
    print(f"[probe] loss xla={float(l_r):.4f} fused={float(l_f):.4f}")
    ok = abs(float(l_r) - float(l_f)) < 5e-2 * (1 + abs(float(l_r)))
    for name, a, g in zip(("enc", "pred", "wo", "bo"), g_r, g_f):
        a, g = np.asarray(a, np.float32), np.asarray(g, np.float32)
        d = np.abs(a - g).max()
        tol = 4e-2 * (np.abs(a).max() + 1e-3)
        print(f"[probe] d{name}: max|diff|={d:.5f} tol={tol:.5f} {'OK' if d <= tol else 'FAIL'}")
        ok &= d <= tol
    print(f"[probe] {'PASS' if ok else 'FAIL'}")
    return ok


def bench():
    B, T, J, U1, V, S = 128, 255, 320, 63, 16000, 8
    enc, pred, wo, bo, ids, fl, ll = case(B, T, J, U1, V, seed=1)
    ll = jnp.full((B,), 40, jnp.int32)  # libri-shaped ~40 labels
    p = band_offsets(fl, ll, T, S)
    cb_d = jnp.ones((B, T, U1), jnp.float32) / (B * T)
    ce_d = jnp.ones((B, T, U1 - 1), jnp.float32) / (B * T)
    cb_b = jnp.ones((B, T, S), jnp.float32) / (B * T)
    ce_b = jnp.ones((B, T, S), jnp.float32) / (B * T)

    assert joint_planes_supported(enc, pred, wo, ids)
    assert banded_planes_supported(enc, pred, wo, ids, S)

    def dense_scalar(enc, pred, wo, bo):
        lpb, lpe = fused_joint_planes(0, enc, pred, wo, bo, ids)
        return jnp.sum(lpb * cb_d) + jnp.sum(lpe * ce_d)

    def banded_scalar(enc, pred, wo, bo):
        lpb, lpe = fused_banded_planes(0, S, enc, pred, wo, bo, ids, p)
        return jnp.sum(lpb * cb_b) + jnp.sum(lpe * ce_b)

    for name, fn in (("dense_fused", dense_scalar), ("banded_fused", banded_scalar)):
        f = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2, 3)))
        t0 = time.perf_counter()
        out = f(enc, pred, wo, bo)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = f(enc, pred, wo, bo)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"[bench] {name}: {best * 1e3:.1f} ms/call (compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    ok = probe()
    if ok:
        bench()
    sys.exit(0 if ok else 1)
