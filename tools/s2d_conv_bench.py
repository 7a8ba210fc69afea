"""Time-space-to-depth reformulation of DS2's stride-2-time convs.

A VALID conv with time stride 2 and kernel taps w[d], d<kt, satisfies
  y[t'] = sum_d x[2t'+d] w[d] = sum_p sum_e x[2(t'+e)+p] w[2e+p]
so on the phase-split input xs[u, (p,c)] = x[2u+p, c] it is a STRIDE-1
VALID conv with kernel k2[e, (p,c)] = w[2e+p] (zero-padded to even taps).
Stride-1 convs have no input-dilation in either gradient, which is where
XLA burns DS2's conv backward (conv1 bwd alone ~19 ms in the step trace:
tools/profile_ds2.py).

Run: python tools/s2d_conv_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, F = 128, 1024, 80
CH = [(1, 32, (41, 11), (2, 2)), (32, 32, (21, 11), (2, 1)), (32, 96, (21, 11), (2, 1))]
dtype = jnp.bfloat16

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, T, F, 1).astype(np.float32) * 0.5, dtype)
ws = [
    jnp.asarray(rng.randn(kt, kf, ci, co).astype(np.float32) * (1.0 / np.sqrt(kt * kf * ci)), dtype)
    for ci, co, (kt, kf), _ in CH
]


def xla_conv(x, w, stride):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, stride, "VALID", dimension_numbers=dn)


def s2d_conv(x, w, stride):
    """VALID conv with time stride 2 via phase-split stride-1 conv."""
    st, sf = stride
    assert st == 2
    Bx, Tx, Fx, Cx = x.shape
    kt, kf, ci, co = w.shape
    kt2 = (kt + 1) // 2
    if Tx % 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
        Tx += 1
    xs = x.reshape(Bx, Tx // 2, 2, Fx, Cx).transpose(0, 1, 3, 2, 4).reshape(Bx, Tx // 2, Fx, 2 * Cx)
    wp = jnp.pad(w, ((0, 2 * kt2 - kt), (0, 0), (0, 0), (0, 0)))
    k2 = wp.reshape(kt2, 2, kf, ci, co).transpose(0, 2, 1, 3, 4).reshape(kt2, kf, 2 * ci, co)
    y = xla_conv(xs, k2, (1, sf))
    # stride-1 phase conv emits Tx//2 - kt2 + 1 steps; the original emits
    # (Tx_orig - kt)//2 + 1 — equal when kt is odd (trailing zero tap), and
    # one extra step when kt is even and Tx_orig even: slice to match
    t_out = (Tx - (1 if Tx % 2 else 0) - kt) // 2 + 1
    return y[:, :t_out]


def chain(conv):
    def f(x, *ws_):
        for w, (ci, co, k, s) in zip(ws_, CH):
            x = conv(x, w, s)
        return x
    return f


y_ref = np.asarray(jax.jit(chain(xla_conv))(x0, *ws), np.float32)
y_s2d = np.asarray(jax.jit(chain(s2d_conv))(x0, *ws), np.float32)
print("s2d-vs-xla max err:", float(np.max(np.abs(y_s2d - y_ref))), y_ref.shape, y_s2d.shape, flush=True)


def loss_of(f):
    return lambda x, *w: jnp.sum(f(x, *w).astype(jnp.float32) ** 2)


g_ref = jax.jit(jax.grad(loss_of(chain(xla_conv)), argnums=(1, 2, 3)))(x0, *ws)
g_s2d = jax.jit(jax.grad(loss_of(chain(s2d_conv)), argnums=(1, 2, 3)))(x0, *ws)
for i, (r, g) in enumerate(zip(g_ref, g_s2d)):
    r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
    print(f"grad dw{i}: rel max err {float(np.max(np.abs(g - r))) / (np.abs(r).max() + 1e-6):.3e}", flush=True)


def timeit(name, f, grad=False):
    fn = jax.jit(jax.value_and_grad(loss_of(f), argnums=(1, 2, 3))) if grad else jax.jit(loss_of(f))
    out = fn(x0, *ws); jax.tree.map(np.asarray, out)
    t0 = time.perf_counter(); out = fn(x0, *ws); jax.tree.map(np.asarray, out); t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn(x0, *ws)
    jax.tree.map(np.asarray, out); t8 = time.perf_counter() - t0
    print(f"{name}: {(t8 - t1) / 7 * 1e3:.2f} ms", flush=True)


timeit("xla fwd     ", chain(xla_conv))
timeit("s2d fwd     ", chain(s2d_conv))
timeit("xla fwd+bwd ", chain(xla_conv), grad=True)
timeit("s2d fwd+bwd ", chain(s2d_conv), grad=True)
