"""Same-process A/B of the fused CE+vocab Pallas pair on the real chip.

Compares the XLA path (time-major logits materialized, measure.py fused CE
loss) against the Pallas pair (ops/pallas/ce_kernel.py: hidden->loss with
no [N,B,V] HBM logits in either direction) on the LAS-small bench workload.
Step time via the N-chain-minus-1-chain method (bench.py); also checks
loss/metric agreement and updated-params agreement after the chains.

Run from the repo root:  python tools/ab_fused_ce.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

B, T, N = 128, 1024, 128
dtype = jnp.bfloat16

model = LAS(
    rnn_type="lstm", vocab_size=16000, encoder_hidden_dim=256,
    decoder_hidden_dim=256, num_encoder_layers=3, num_decoder_layers=2,
    dropout=0.15, teacher_forcing_rate=0.99, dtype=dtype,
)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, N), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
variables_host = jax.tree.map(np.asarray, dict(variables))  # donation-proof master copy
fresh_vars = lambda: jax.tree.map(jnp.asarray, variables_host)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
model_input = (audio, tokens[:, :-1])
y_true = tokens[:, 1:]

np.asarray(jnp.arange(4.0))  # warm the transfer path


def build(flags):
    for k, v in flags.items():
        os.environ[k] = v
    try:
        state = TrainState.create(fresh_vars(), tx)
        step = make_train_step(
            model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
        )
        compiled = step.lower(state, model_input, y_true, rng).compile()
        return state, compiled
    finally:
        for k in flags:
            os.environ.pop(k, None)


def chain(compiled, state, n, seed):
    for i in range(n):
        state, metrics = compiled(state, model_input, y_true, jax.random.fold_in(rng, seed + i))
    loss = float(metrics["loss"])
    return state, loss, metrics


def time_path(name, compiled):
    state = TrainState.create(fresh_vars(), tx)
    state, l0, m0 = chain(compiled, state, 1, 0)  # warmup
    t0 = time.perf_counter(); state, _, _ = chain(compiled, state, 1, 100); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); state, _, m = chain(compiled, state, 8, 200); t8 = time.perf_counter() - t0
    ms = (t8 - t1) / 7 * 1e3
    acc = float(m["accuracy_sum"]) / max(float(m["accuracy_count"]), 1.0)
    print(f"{name}: {ms:.1f} ms/step  ({B/((t8-t1)/7):.0f} utt/s)  loss0={l0:.4f} acc={acc:.4f}")
    return ms, state


paths = [
    ("xla logits + fused-CE loss", {"SRT_FUSED_CE": "0"}),
    ("pallas CE+vocab pair      ", {"SRT_FUSED_CE": "1"}),
]

results = {}
for name, flags in paths:
    state, compiled = build(flags)
    results[name] = time_path(name, compiled)

ref = results[paths[0][0]][1].variables["params"]
got = results[paths[1][0]][1].variables["params"]
worst = max(
    float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got))
)
print(f"params max |delta| after 10 steps, pallas vs xla: {worst:.3e}")
