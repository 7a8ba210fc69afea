"""Isolated bench of the LAS conv stem (2x stride-2 VALID 3x3, C=3->32->32).

The profiled train step spends ~5 ms in these convs (C_in=3 / C=32 map
terribly onto the 128x128 MXU).  Compares XLA conv_general_dilated vs
im2col(patches)+matmul, forward and forward+backward, chained for the
remote-dispatch serialization.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, F = 128, 1024, 80
bf = jnp.bfloat16
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, T, F, 3).astype(np.float32), bf)
w1 = jnp.asarray(rng.randn(3, 3, 3, 32).astype(np.float32) * 0.1, bf)
w2 = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.1, bf)

dn = jax.lax.conv_dimension_numbers(x0.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))


def conv_xla(x, w1, w2):
    y = jax.lax.conv_general_dilated(x, w1, (2, 2), "VALID", dimension_numbers=dn)
    y = jax.lax.conv_general_dilated(y, w2, (2, 2), "VALID", dimension_numbers=dn)
    return y


def _im2col(x, k=3, s=2):
    pat = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), (k, k), (s, s), "VALID"
    )  # [B, C*k*k, H', W']
    return pat.transpose(0, 2, 3, 1)  # [B, H', W', C*k*k]


def conv_im2col(x, w1, w2):
    p = _im2col(x)
    y = p @ w1.transpose(2, 0, 1, 3).reshape(-1, 32)  # HWIO -> rows ordered (I, kh, kw)
    p2 = _im2col(y)
    y2 = p2 @ w2.transpose(2, 0, 1, 3).reshape(-1, 32)
    return y2


def time_chain(name, fn, grad=False):
    if grad:
        g = jax.jit(jax.grad(lambda x, a, b: jnp.sum(fn(x, a, b).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
        def run(x):
            dx, dw1, dw2 = g(x, w1, w2)
            return x + dx.astype(bf) * 1e-6 + jnp.sum(dw1 + 0 * dw2[:, :, :3, :]).astype(bf) * 1e-30
    else:
        f = jax.jit(lambda x, a, b: jnp.sum(fn(x, a, b).astype(jnp.float32)))
        run = lambda x: x * (1.0 + f(x, w1, w2) * 1e-30).astype(bf)

    def chain(n):
        x = x0
        for _ in range(n):
            x = run(x)
        return float(x.ravel()[0].astype(jnp.float32))

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); chain(9); tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / 8 * 1e3:.2f} ms")


# correctness first
y_ref = np.asarray(conv_xla(x0, w1, w2), np.float32)
print("xla out", y_ref.shape)

time_chain("xla conv fwd      ", conv_xla)
time_chain("xla conv fwd+bwd  ", conv_xla, grad=True)
time_chain("im2col fwd        ", conv_im2col)
time_chain("im2col fwd+bwd    ", conv_im2col, grad=True)

# im2col correctness vs xla (needs the right weight reshape order)
p = _im2col(x0)
# patches order from conv_general_dilated_patches: channels-major (C, kh, kw)
w1_m = w1.transpose(2, 0, 1, 3).reshape(27, 32)  # (I,kh,kw,O) -> rows (I*kh*kw)
y1 = p @ w1_m
y1_ref = jax.lax.conv_general_dilated(x0, w1, (2, 2), "VALID", dimension_numbers=dn)
err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y1_ref.astype(jnp.float32))))
print("im2col-vs-xla conv1 max err:", err)
