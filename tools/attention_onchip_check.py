"""On-chip validation of the fused MHSA Pallas pair (real TPU).

Runs the same checks as tests/test_pallas_attention.py, including the
dropout-mechanics ones that cannot run under interpret mode (the CPU
interpret stub zero-fills prng_random_bits): value/grad parity vs the
plain XLA math, dropout determinism + seed sensitivity, expectation
preservation, and the finite-difference check that the backward kernel
regenerates the forward's dropout mask.

Run: python tools/attention_onchip_check.py  (real TPU; bound >= 1800 s)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from speech_recognition_tpu.ops.pallas.attention_kernel import NEG_INF, fused_mhsa

B, T, H, d = 4, 256, 4, 64
D = H * d
SCALE = float(1.0 / np.sqrt(d))
ZSEEDS = jnp.zeros((B,), jnp.int32)

rng = np.random.RandomState(0)
mk = lambda dt: jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.3, dt)
q32, k32, v32 = mk(jnp.float32), mk(jnp.float32), mk(jnp.float32)
mask = jnp.arange(T)[None, :] < jnp.asarray(np.array([T, 180, 77, T]))[:, None]
bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)


def oracle(q, k, v):
    qh, kh, vh = (a.reshape(B, T, H, d) for a in (q, k, v))
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.float32(d))
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, T, D)


fails = 0


def check(name, ok, detail=""):
    global fails
    fails += not ok
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)


# 1. value + grad parity at p=0, f32
co = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
f = jax.jit(lambda q, k, v: jnp.sum(fused_mhsa(q, k, v, bias, ZSEEDS, H, SCALE, 0.0) * co))
g = jax.jit(lambda q, k, v: jnp.sum(oracle(q, k, v) * co))
l_f, g_f = jax.value_and_grad(f, (0, 1, 2))(q32, k32, v32)
l_r, g_r = jax.value_and_grad(g, (0, 1, 2))(q32, k32, v32)
check("loss parity f32", abs(float(l_f) - float(l_r)) < 1e-3 * (abs(float(l_r)) + 1),
      f"{float(l_f):.6f} vs {float(l_r):.6f}")
for a, b, n in zip(g_f, g_r, "qkv"):
    a, b = np.asarray(a), np.asarray(b)
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-3)
    check(f"grad d{n} f32", err < 1e-3, f"relmax {err:.2e}")

# 2. bf16 fwd parity
qb, kb, vb = (a.astype(jnp.bfloat16) for a in (q32, k32, v32))
out_b = fused_mhsa(qb, kb, vb, bias, ZSEEDS, H, SCALE, 0.0)
ref_b = oracle(qb, kb, vb)
err = float(jnp.abs(out_b.astype(jnp.float32) - ref_b.astype(jnp.float32)).max())
check("fwd parity bf16", err < 2e-2 * (float(jnp.abs(ref_b.astype(jnp.float32)).max()) + 1e-3),
      f"absmax {err:.2e}")

# 3. dropout determinism + seed sensitivity
s1 = jnp.asarray([3, 17, 21, 30], jnp.int32)
s2 = jnp.asarray([3, 99, 21, 31], jnp.int32)
o1a = fused_mhsa(q32, k32, v32, bias, s1, H, SCALE, 0.3)
o1b = fused_mhsa(q32, k32, v32, bias, s1, H, SCALE, 0.3)
o2 = fused_mhsa(q32, k32, v32, bias, s2, H, SCALE, 0.3)
check("dropout deterministic", bool(jnp.array_equal(o1a, o1b)))
check("same-seed example equal", bool(jnp.array_equal(o1a[0], o2[0])))
check("diff-seed example differs", not bool(jnp.array_equal(o1a[1], o2[1])))
check("dropout changes output", not bool(jnp.array_equal(o1a, fused_mhsa(
    q32, k32, v32, bias, s1, H, SCALE, 0.0))))

# 4. expectation preservation (v = ones)
ones = jnp.ones((B, T, D), jnp.float32)
out = fused_mhsa(q32, k32, ones, bias, jnp.asarray([5, 6, 7, 8], jnp.int32), H, SCALE, 0.5)
rows = np.asarray(out[0])
check("dropout expectation", abs(rows.mean() - 1.0) < 0.03, f"mean {rows.mean():.4f}")
check("dropout actually drops", rows.std() > 0.01, f"std {rows.std():.4f}")

# 5. backward differentiates the sampled function: the keep mask is a pure
# position hash, so the exact sampled function rebuilds in plain jnp and
# values + all grads must match.  (An FD probe is invalid here: DEFAULT-
# precision f32 matmuls run as single-pass bf16 on the MXU, so 1e-3
# perturbations sit below resolution — measured wild FD/VJP gaps at
# perfectly consistent masks.)
from speech_recognition_tpu.ops.pallas.attention_kernel import _keep_mask

seeds = jnp.asarray([11, 12, 13, 14], jnp.int32)
p_drop = 0.25
keep = jnp.stack([
    jnp.stack([_keep_mask(seeds[b], h, (T, T), p_drop) for h in range(H)])
    for b in range(B)
])


def oracle_drop(q, k, v):
    qh, kh, vh = (a.reshape(B, T, H, d) for a in (q, k, v))
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.float32(d))
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, -1)
    pd = jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", pd, vh).reshape(B, T, D)


fd_f = jax.jit(lambda q, k, v: jnp.sum(fused_mhsa(q, k, v, bias, seeds, H, SCALE, p_drop) * co))
or_f = jax.jit(lambda q, k, v: jnp.sum(oracle_drop(q, k, v) * co))
l_f, g_f = jax.value_and_grad(fd_f, (0, 1, 2))(q32, k32, v32)
l_r, g_r = jax.value_and_grad(or_f, (0, 1, 2))(q32, k32, v32)
check("dropout loss vs mask-oracle", abs(float(l_f) - float(l_r)) < 1e-3 * (abs(float(l_r)) + 1),
      f"{float(l_f):.6f} vs {float(l_r):.6f}")
for a, b, n in zip(g_f, g_r, "qkv"):
    a, b = np.asarray(a), np.asarray(b)
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-3)
    check(f"dropout grad d{n} vs mask-oracle", err < 1e-3, f"relmax {err:.2e}")

print(("ALL OK" if fails == 0 else f"{fails} FAILURES"), flush=True)
sys.exit(1 if fails else 0)
