"""Same-process A/B of the fused CTC pair on the DeepSpeech2 train step.

Shipped deepspeech.yml shape (3 convs + 7x BiGRU(128) + CTC), B=128,
T=1024.  Compares SRT_FUSED_CTC=0 (XLA strided convs) vs =1 (phase-split
stride-1 fast path) with the chain-minus-chain timing method, and checks
loss/updated-params agreement.

Run: python tools/ds2_step_ab.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.models import DeepSpeech2
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

B, T, V = 128, 1024, 16000
model = DeepSpeech2(
    3, (32, 32, 96), ((41, 11), (21, 11), (21, 11)), ((2, 2), (2, 1), (2, 1)),
    "gru", 7, 128, 0.1, 0.0, V, 14, dtype=jnp.bfloat16,
)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 1), jnp.float32)
tokens = jnp.concatenate(
    [jax.random.randint(rng, (B, 40), 1, V), jnp.zeros((B, 24), jnp.int32)], axis=1
)
variables = model.init({"params": rng}, audio)
variables_host = jax.tree.map(np.asarray, dict(variables))
fresh_vars = lambda: jax.tree.map(jnp.asarray, variables_host)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
np.asarray(jnp.arange(4.0))


def build(flag):
    os.environ["SRT_FUSED_CTC"] = flag
    try:
        state = TrainState.create(fresh_vars(), tx)
        step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
        compiled = step.lower(state, audio, tokens, rng).compile()
        return state, compiled
    finally:
        os.environ.pop("SRT_FUSED_CTC", None)


def time_path(name, compiled):
    state = TrainState.create(fresh_vars(), tx)

    def chain(state, n, seed):
        for i in range(n):
            state, metrics = compiled(state, audio, tokens, jax.random.fold_in(rng, seed + i))
        return state, float(metrics["loss"])

    state, l0 = chain(state, 1, 0)
    t0 = time.perf_counter(); state, _ = chain(state, 1, 100); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); state, _ = chain(state, 8, 200); t8 = time.perf_counter() - t0
    ms = (t8 - t1) / 7 * 1e3
    print(f"{name}: {ms:.1f} ms/step  ({B/((t8-t1)/7):.0f} utt/s)  loss0={l0:.4f}", flush=True)
    return state


results = {}
for name, flag in [("xla vocab+emissions", "0"), ("pallas ctc pair  ", "1")]:
    state, compiled = build(flag)
    results[name] = time_path(name, compiled)

ref = results["xla vocab+emissions"].variables["params"]
got = results["pallas ctc pair  "].variables["params"]
worst = max(
    float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got))
)
print(f"params max |delta| after 10 steps, pallas vs xla: {worst:.3e}")
