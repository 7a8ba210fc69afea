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


# ---- space-to-depth variant: stride-2 3x3 VALID == stride-1 2x2 VALID over
# 2x2-block channels with the kernel zero-padded 3->4 and regrouped.
def _s2d(x):
    B_, H_, W_, C_ = x.shape
    x = x.reshape(B_, H_ // 2, 2, W_ // 2, 2, C_)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B_, H_ // 2, W_ // 2, 4 * C_)


def _w_s2d(w):
    kh, kw, ci, co = w.shape
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 3->4, zero tail
    wp = wp.reshape(2, 2, 2, 2, ci, co)  # (dp, a0, dq, b0, ci, co)
    return wp.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * ci, co)


def conv_s2d_one(x, w):
    if x.shape[1] % 2 or x.shape[2] % 2:
        x = jnp.pad(x, ((0, 0), (0, x.shape[1] % 2), (0, x.shape[2] % 2), (0, 0)))
    x2 = _s2d(x)
    w2 = _w_s2d(w)
    dn2 = jax.lax.conv_dimension_numbers(x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x2, w2, (1, 1), "VALID", dimension_numbers=dn2)


def conv_s2d(x, w1_, w2_):
    return conv_s2d_one(conv_s2d_one(x, w1_), w2_)


y_s2d = np.asarray(conv_s2d(x0, w1, w2), np.float32)
print("s2d-vs-xla max err:", float(np.max(np.abs(y_s2d - y_ref))), "shape", y_s2d.shape)
time_chain("s2d fwd           ", conv_s2d)
time_chain("s2d fwd+bwd       ", conv_s2d, grad=True)


# ---- hybrid custom-VJP: im2col forward + dW as one patches-matmul + dx via
# XLA's transposed conv (autodiff's own input-grad, which is not the slow
# part; the slow part is XLA's dW correlation with C_in=3).
import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv_hybrid_one(x, w):
    kh = w.shape[0]
    p = _im2col(x, k=kh, s=2)
    wm = w.transpose(2, 0, 1, 3).reshape(-1, w.shape[3])
    return p @ wm


def _conv_hybrid_fwd(x, w):
    return conv_hybrid_one(x, w), (x, w)


def _conv_hybrid_bwd(res, dout):
    x, w = res
    kh = w.shape[0]
    # dx: XLA's own conv input-grad (transposed conv), fast for these shapes
    dnx = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    _, vjp_x = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(xx, w, (2, 2), "VALID", dimension_numbers=dnx), x
    )
    (dx,) = vjp_x(dout)
    # dW: one [K, P] x [P, O] matmul over recomputed patches
    p = _im2col(x, k=kh, s=2)
    pf = p.reshape(-1, p.shape[-1])
    doutf = dout.reshape(-1, dout.shape[-1])
    dwm = pf.T @ doutf  # [C*kh*kw, O]
    dw = dwm.reshape(w.shape[2], kh, kh, w.shape[3]).transpose(1, 2, 0, 3)
    return dx, dw


conv_hybrid_one.defvjp(_conv_hybrid_fwd, _conv_hybrid_bwd)


def conv_hybrid(x, a, b):
    return conv_hybrid_one(conv_hybrid_one(x, a), b)


yh = np.asarray(conv_hybrid(x0, w1, w2), np.float32).reshape(y_ref.shape[0], 255, 19, 32)
print("hybrid-vs-xla max err:", float(np.max(np.abs(yh - y_ref.reshape(yh.shape)))))
time_chain("hybrid fwd        ", conv_hybrid)
time_chain("hybrid fwd+bwd    ", conv_hybrid, grad=True)
