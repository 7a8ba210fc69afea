"""Decompose LAS-small train-step time on the real TPU + validate Pallas RNN."""
import time, os, json
import jax, jax.numpy as jnp, numpy as np, optax
from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

B, T, N = 128, 1024, 128
dtype = jnp.bfloat16
model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=dtype)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, N), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
np.asarray(jnp.arange(4.0))

def timeit(fn, fetch, n=8):
    fetch(fn())
    t0 = time.perf_counter(); fetch(fn()); t1 = time.perf_counter()
    outs = None
    t2 = time.perf_counter()
    for _ in range(n): outs = fn()
    fetch(outs); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n - 1)

# 1. listener forward only (training mode, no dropout rng needed? dropout needs rng)
lis_fwd = jax.jit(lambda v, a: model.apply(v, a, method=lambda m, a: m.listener(a, False)))
t_lis = timeit(lambda: lis_fwd(variables, audio), lambda o: np.asarray(o[0][0,0,:1]))
print("listener fwd (eval):", round(t_lis*1e3,2), "ms")

# 2. full forward (eval path, static teacher forcing)
fwd = jax.jit(lambda v, a, tk: model.apply(v, (a, tk)))
t_fwd = timeit(lambda: fwd(variables, audio, tokens[:, :-1]), lambda o: np.asarray(o[0,0,:1]))
print("full fwd (eval):", round(t_fwd*1e3,2), "ms")

# 3. forward + loss + grad (train step minus optimizer)
loss_fn = model.get_loss_fn()
def loss_only(params, a, tk, y, rng):
    rngs = {"dropout": rng, "teacher_forcing": jax.random.fold_in(rng,1)}
    logits, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                            (a, tk), training=True, rngs=rngs, mutable=["batch_stats"])
    return loss_fn(y, logits)
grad_fn = jax.jit(jax.value_and_grad(loss_only))
t_grad = timeit(lambda: grad_fn(variables["params"], audio, tokens[:, :-1], tokens[:,1:], rng),
                lambda o: float(o[0]))
print("fwd+bwd (train):", round(t_grad*1e3,2), "ms")

# 4. full train step
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
state = TrainState.create(dict(variables), tx)
step = make_train_step(model, loss_fn, model.get_metrics(), needs_teacher_forcing_rng=True)
s = {"st": state}
def run():
    s["st"], m = step(s["st"], (audio, tokens[:, :-1]), tokens[:,1:], rng)
    return m
t_step = timeit(run, lambda m: float(m["loss"]))
print("full train step:", round(t_step*1e3,2), "ms")
