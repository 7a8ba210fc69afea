"""Banded-matmul formulation of the stride-2 3x3 conv stem, vs XLA conv.

Each output (t', f', o) = sum_{dt,df,c} x[2t'+dt, 2f'+df, c] w[dt,df,c,o].
For fixed dt this is ONE matmul over the flattened (freq, chan) axis
against a banded weight matrix Wb[dt] of shape [F*C, F'*O] with
Wb[(2f'+df)*C + c, f'*O + o] = w[dt,df,c,o], built by a constant-indicator
einsum (differentiable, so autodiff provides dx and dW as plain matmul
transposes with MXU-friendly shapes — unlike im2col's [27, 2.5M] dW).

FLOPs inflate ~F/df-band-fold (dense rows vs 3-wide band) but land on the
MXU instead of XLA's dilated-correlation path (conv2 dx alone is 2.85 ms
in the step trace at ~5% MXU).

Run: python tools/banded_conv_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, F, C1 = 128, 1024, 80, 3
O = 32
K, S = 3, 2
dtype = jnp.bfloat16

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, T, F, C1).astype(np.float32), dtype)
w1 = jnp.asarray(rng.randn(K, K, C1, O).astype(np.float32) * 0.1, dtype)
w2 = jnp.asarray(rng.randn(K, K, O, O).astype(np.float32) * 0.1, dtype)


def out_len(n):
    return (n - K) // S + 1


def indicators(F_in, F_out):
    """[K] constant 0/1 matrices Ind[df][f, f'] = (f == S*f' + df)."""
    inds = []
    f = np.arange(F_in)[:, None]
    fp = np.arange(F_out)[None, :]
    for df in range(K):
        inds.append(jnp.asarray((f == S * fp + df).astype(np.float32), dtype))
    return inds


def banded_conv(x, w):
    """stride-2 3x3 VALID conv as 3 shifted matmuls vs banded weights."""
    Bx, Tx, Fx, Cx = x.shape
    To, Fo = out_len(Tx), out_len(Fx)
    inds = indicators(Fx, Fo)
    y = jnp.zeros((Bx * To, Fo * w.shape[-1]), jnp.float32)
    for dt in range(K):
        # Wb[dt]: [F*C, F'*O] = sum_df Ind[df][f,f'] * w[dt,df,c,o]
        wb = jnp.einsum("kfg,kco->fcgo", jnp.stack(inds), w[dt]).reshape(
            Fx * Cx, Fo * w.shape[-1]
        )
        xs = jax.lax.slice_in_dim(x, dt, dt + S * (To - 1) + 1, S, axis=1)
        y = y + jnp.dot(
            xs.reshape(Bx * To, Fx * Cx), wb, preferred_element_type=jnp.float32
        )
    return y.reshape(Bx, To, Fo, w.shape[-1]).astype(x.dtype)


def xla_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (S, S), "VALID", dimension_numbers=dn)


def chain_banded(x, a, b):
    return banded_conv(banded_conv(x, a), b)


def chain_xla(x, a, b):
    return xla_conv(xla_conv(x, a), b)


# numerics
y_ref = np.asarray(jax.jit(chain_xla)(x0, w1, w2), np.float32)
y_b = np.asarray(jax.jit(chain_banded)(x0, w1, w2), np.float32)
print("banded-vs-xla max err:", float(np.max(np.abs(y_b - y_ref))), "shape", y_b.shape, flush=True)

# grad numerics
def loss_fn(f):
    return lambda x, a, b: jnp.sum(f(x, a, b).astype(jnp.float32) ** 2)

gx_r, ga_r, gb_r = jax.jit(jax.grad(loss_fn(chain_xla), argnums=(0, 1, 2)))(x0, w1, w2)
gx_b, ga_b, gb_b = jax.jit(jax.grad(loss_fn(chain_banded), argnums=(0, 1, 2)))(x0, w1, w2)
for n, r, g in [("dx", gx_r, gx_b), ("dw1", ga_r, ga_b), ("dw2", gb_r, gb_b)]:
    r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
    denom = np.abs(r).max() + 1e-6
    print(f"grad {n}: rel max err {float(np.max(np.abs(g - r)))/denom:.3e}")


def timeit(name, fn, *args, grad=False):
    if grad:
        # weights-only grads: the model never needs d/d(input audio), and
        # conv1's input-grad is a ~30 ms dilated correlation that would
        # dominate and distort the comparison
        f = jax.jit(jax.value_and_grad(loss_fn(fn), argnums=(1, 2)))
    else:
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    out = f(*args)
    jax.tree.map(lambda t: np.asarray(t), out)  # warm
    t0 = time.perf_counter()
    out = f(*args)
    jax.tree.map(lambda t: np.asarray(t), out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(8):
        out = f(*args)
    jax.tree.map(lambda t: np.asarray(t), out)
    t8 = time.perf_counter() - t0
    print(f"{name}: {(t8 - t1) / 7 * 1e3:.2f} ms")


timeit("xla    fwd     ", chain_xla, x0, w1, w2)
timeit("banded fwd     ", chain_banded, x0, w1, w2)
timeit("xla    fwd+bwd ", chain_xla, x0, w1, w2, grad=True)
timeit("banded fwd+bwd ", chain_banded, x0, w1, w2, grad=True)

# mixed: banded conv1 (C_in=3 pathological for XLA) + xla conv2, and inverse
def chain_mixed1(x, a, b):
    return xla_conv(banded_conv(x, a), b)

def chain_mixed2(x, a, b):
    return banded_conv(xla_conv(x, a), b)

timeit("banded1+xla2 fwd+bwd ", chain_mixed1, x0, w1, w2, grad=True)
timeit("xla1+banded2 fwd+bwd ", chain_mixed2, x0, w1, w2, grad=True)

# per-conv forward isolation (conv2 input precomputed once)
x1 = jax.jit(xla_conv)(x0, w1)
x1.block_until_ready() if hasattr(x1, "block_until_ready") else np.asarray(x1)
timeit("xla    conv1 fwd ", lambda x, a, b: xla_conv(x, a), x0, w1, w2)
timeit("banded conv1 fwd ", lambda x, a, b: banded_conv(x, a), x0, w1, w2)
timeit("xla    conv2 fwd ", lambda x, a, b: xla_conv(x, b), x1, w1, w2)
timeit("banded conv2 fwd ", lambda x, a, b: banded_conv(x, b), x1, w1, w2)
