"""Conformer FFN floor probe: is the ~32 ms FFN region (trace, PERF
round-15) matmul-bound or fusion-overhead-bound?

Times, at bench shapes (B*T' = 32768 rows, D=256, expansion 4), N=8
serial instances (scale x4 for the step's 32):
  (a) raw paired matmuls x@W1 -> @W2, fwd+bwd   — the MXU floor
  (b) the macaron FFN chain (ln -> dense -> swish -> residual) fwd+bwd
If (b) ~= (a), the region is at its floor and a fused-FFN Pallas kernel
cannot pay; the gap is the ceiling for any fusion work.

Run: timeout 3000 python tools/ffn_floor_probe.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, D, E, N = 128, 256, 256, 4, 8
bf = jnp.bfloat16
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B * T, D).astype(np.float32) * 0.1, bf)
W1 = jnp.asarray(rng.randn(N, D, E * D).astype(np.float32) * 0.05, bf)
W2 = jnp.asarray(rng.randn(N, E * D, D).astype(np.float32) * 0.05, bf)


def bench(name, grad_fn, *args):
    out = grad_fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = grad_fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"[{name}] {best * 1e3:.2f} ms/call", flush=True)
    return best


def raw_loss(x, W1, W2):
    h = x
    acc = 0.0
    for i in range(N):
        y = jnp.dot(jnp.dot(h, W1[i]), W2[i])
        # quadratic reduction: sum(y) factorizes the matmuls away
        acc = acc + jnp.sum(jnp.square(y.astype(jnp.float32)))
        h = h + 0.01 * y
    return acc


def ffn_loss(x, W1, W2):
    h = x
    acc = 0.0
    for i in range(N):
        m = h.astype(jnp.float32)
        mu = jnp.mean(m, -1, keepdims=True)
        v = jnp.mean(jnp.square(m - mu), -1, keepdims=True)
        y = ((m - mu) * jax.lax.rsqrt(v + 1e-6)).astype(bf)
        y = jnp.dot(y, W1[i])
        y = jax.nn.swish(y.astype(jnp.float32)).astype(bf)
        y = jnp.dot(y, W2[i])
        h = h + 0.5 * y
        acc = acc + jnp.sum(jnp.square(y.astype(jnp.float32)))
    return acc


if __name__ == "__main__":
    flops = N * 2 * (2 * B * T * D * E * D) * 3  # fwd + 2 bwd matmuls each
    peak = 197e12
    raw = bench("raw_matmul_pairs", jax.jit(jax.grad(raw_loss, argnums=(0, 1, 2))), x, W1, W2)
    real = bench("macaron_ffn_chain", jax.jit(jax.grad(ffn_loss, argnums=(0, 1, 2))), x, W1, W2)
    print(
        f"analytic {flops/1e12:.2f} TFLOP: raw {flops/raw/peak:.0%} MXU, "
        f"chain {flops/real/peak:.0%} MXU; step-scale x4: raw {raw*4e3:.1f} ms vs chain {real*4e3:.1f} ms"
    )
