"""Isolated cost of the vocab projection + masked CE (fwd and fwd+bwd).

Sizes the candidate fused Pallas kernel (hidden -> loss without
materializing [N,B,16000] logits).  Data-dependent chaining serializes the
remote dispatches.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.measure import sparse_categorical_crossentropy

N, B, H, V = 127, 128, 256, 16000
bf = jnp.bfloat16
rng = np.random.RandomState(0)
hid0 = jnp.asarray(rng.randn(N, B, H).astype(np.float32) * 0.1, bf)
W = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.05, bf)
bias = jnp.asarray(rng.randn(V).astype(np.float32) * 0.01, bf)
y = jnp.asarray(rng.randint(0, V, (N, B)), jnp.int32)
y = jnp.where(jnp.asarray(rng.rand(N, B) > 0.1), y, 0)


def loss_fn(hid, W, bias):
    logits = hid @ W + bias
    return sparse_categorical_crossentropy(y, logits, 0)


g = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
f = jax.jit(loss_fn)


def time_chain(name, run, reps=16):
    def chain(n):
        x = hid0
        for _ in range(n):
            x = run(x)
        return float(x.ravel()[0].astype(jnp.float32))

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); chain(reps); tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / (reps - 1) * 1e3:.2f} ms")


time_chain("vocab+CE fwd    ", lambda x: x * (1.0 + f(x, W, bias) * 1e-30).astype(bf))
time_chain("vocab+CE fwd+bwd", lambda x: x + g(x, W, bias)[0].astype(bf) * 1e-6)
