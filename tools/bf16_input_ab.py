"""Same-process A/B: train step fed f32 features vs host-pre-cast bf16.

Under mixed precision the model's first op is astype(bfloat16)
(models/las.py:168); the host pipeline now stacks batches directly into
bf16 (run/train.py SRT_HOST_BF16), which (a) halves host->device transfer
bytes and (b) removes the in-step f32->bf16 convert+copy (~0.6 ms at bench
shapes, PERF.md round-4 step budget).  This measures (b) on-device (the
bench feeds device-resident tensors, so (a) is invisible here) plus a
host->device transfer A/B for (a).

    python tools/bf16_input_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

B, T, N = 128, 1024, 128

model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, N), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))

tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
train_step = make_train_step(
    model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
)


def chain_ms(audio_in, n=8):
    # train_step donates the state; copy the shared init variables per chain
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, dict(variables)), tx)
    mi, yt = (audio_in, tokens[:, :-1]), tokens[:, 1:]

    def run(state, k, seed):
        for i in range(k):
            state, metrics = train_step(state, mi, yt, jax.random.fold_in(rng, seed + i))
        float(metrics["loss"])
        return state, metrics

    state, m0 = run(state, 1, 0)  # compile
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        state, _ = run(state, 1, 100 + r)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, _ = run(state, n, 200 + r)
        best = min(best, (time.perf_counter() - t0 - t_short) / (n - 1))
    return best * 1e3, m0


ms32, m32 = chain_ms(audio)
ms16, m16 = chain_ms(audio.astype(jnp.bfloat16))
print(f"f32 input : {ms32:.2f} ms/step  loss {float(m32['loss']):.6f}")
print(f"bf16 input: {ms16:.2f} ms/step  loss {float(m16['loss']):.6f}")
print(f"delta: {ms32 - ms16:+.2f} ms  (loss identical: {float(m32['loss']) == float(m16['loss'])})")

# ---- host->device transfer A/B (the pipeline-visible half of the win)
h32 = np.asarray(audio)
h16 = h32.astype(np.dtype(jnp.bfloat16))
for name, h in (("f32", h32), ("bf16", h16)):
    jax.block_until_ready(jnp.asarray(h))  # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(h))
        best = min(best, time.perf_counter() - t0)
    print(f"host->device {name} batch ({h.nbytes / 2**20:.0f} MB): {best * 1e3:.1f} ms")
