"""Pallas fused-FFN FORWARD probe (Conformer floor follow-up, PERF r15).

One kernel per row-block: ln(x) @ W1 -> swish -> @ W2, weights VMEM-
resident, [R, 4D] intermediate never touching HBM.  Compared against the
jitted XLA chain at the step's shapes/counts (32 FFN instances).  Decides
whether the full custom-VJP fused-FFN module is worth building: the step
trace attributes 10.6 ms fwd / 21.6 ms bwd to the FFN region at ~52% MXU.

Run: timeout 3000 python tools/ffn_pallas_probe.py  (real TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, D, E, N = 128, 256, 256, 4, 8  # N instances; step scale = x4
R = 512  # rows per grid cell
bf = jnp.bfloat16
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B * T, D).astype(np.float32) * 0.1, bf)
W1 = jnp.asarray(rng.randn(N, D, E * D).astype(np.float32) * 0.05, bf)
B1 = jnp.asarray(rng.randn(N, E * D).astype(np.float32) * 0.02, jnp.float32)
W2 = jnp.asarray(rng.randn(N, E * D, D).astype(np.float32) * 0.05, bf)
B2 = jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.02, jnp.float32)
G = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1 + 1.0, jnp.float32)
Bt = jnp.asarray(rng.randn(D).astype(np.float32) * 0.02, jnp.float32)


def ln(h):
    m = h.astype(jnp.float32)
    mu = jnp.mean(m, -1, keepdims=True)
    v = jnp.mean(jnp.square(m - mu), -1, keepdims=True)
    return ((m - mu) * jax.lax.rsqrt(v + 1e-6) * G + Bt).astype(bf)


def xla_ffn(x, w1, b1, w2, b2):
    y = jnp.dot(ln(x), w1, preferred_element_type=jnp.float32) + b1
    y = jax.nn.swish(y).astype(bf)
    y = jnp.dot(y, w2, preferred_element_type=jnp.float32) + b2
    return x + 0.5 * y.astype(bf)


def _kernel(g_ref, bt_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = x_ref[:]
    m = h.astype(jnp.float32)
    mu = jnp.mean(m, -1, keepdims=True)
    v = jnp.mean(jnp.square(m - mu), -1, keepdims=True)
    y = ((m - mu) * jax.lax.rsqrt(v + 1e-6) * g_ref[:] + bt_ref[:]).astype(bf)
    y = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    y = (y * jax.nn.sigmoid(y)).astype(bf)
    y = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = h + 0.5 * y.astype(bf)


def pallas_ffn(x, w1, b1, w2, b2):
    rows = x.shape[0]
    const = lambda *bs: pl.BlockSpec(bs, lambda r: (0,) * len(bs), memory_space=pltpu.VMEM)
    per_r = lambda *bs: pl.BlockSpec(bs, lambda r: (r, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(rows // R,),
        in_specs=[const(1, D), const(1, D), per_r(R, D), const(D, E * D),
                  const(1, E * D), const(E * D, D), const(1, D)],
        out_specs=per_r(R, D),
        out_shape=jax.ShapeDtypeStruct((rows, D), bf),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 2**20
        ),
    )(G[None], Bt[None], x, w1, b1[None], w2, b2[None])


def chain(fn):
    def f(x):
        h = x
        for i in range(N):
            h = fn(h, W1[i], B1[i], W2[i], B2[i])
        return h

    return jax.jit(f)


def bench(name, f):
    out = f(x)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        o = x
        for _ in range(4):
            o = f(o)  # dependency-chained: no cross-call overlap tricks
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"[{name}] {best * 1e3:.2f} ms/call (x4 = step-scale {best * 4e3:.1f} ms)", flush=True)
    return best


if __name__ == "__main__":
    fx = chain(xla_ffn)
    fp = chain(pallas_ffn)
    a = np.asarray(fx(x), np.float32)
    b = np.asarray(fp(x), np.float32)
    d = np.abs(a - b).max()
    print(f"max |xla - pallas| after {N} chained FFNs: {d:.4f} (scale {np.abs(a).max():.2f})")
    bench("xla_ffn_chain", fx)
    bench("pallas_ffn_chain", fp)
