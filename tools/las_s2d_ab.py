"""Same-process A/B of the s2d conv path on the LAS train step (bench shape).

Run: python tools/las_s2d_ab.py
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
model = LAS(
    rnn_type="lstm", vocab_size=16000, encoder_hidden_dim=256,
    decoder_hidden_dim=256, num_encoder_layers=3, num_decoder_layers=2,
    dropout=0.15, teacher_forcing_rate=0.99, dtype=jnp.bfloat16,
)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, N), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
variables_host = jax.tree.map(np.asarray, dict(variables))
fresh_vars = lambda: jax.tree.map(jnp.asarray, variables_host)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
model_input, y_true = (audio, tokens[:, :-1]), tokens[:, 1:]
np.asarray(jnp.arange(4.0))


def build(flag):
    os.environ["SRT_S2D_CONV"] = flag
    try:
        state = TrainState.create(fresh_vars(), tx)
        step = make_train_step(
            model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
        )
        compiled = step.lower(state, model_input, y_true, rng).compile()
        return state, compiled
    finally:
        os.environ.pop("SRT_S2D_CONV", None)


def time_path(name, compiled):
    state = TrainState.create(fresh_vars(), tx)

    def chain(state, n, seed):
        for i in range(n):
            state, metrics = compiled(state, model_input, y_true, jax.random.fold_in(rng, seed + i))
        return state, float(metrics["loss"])

    state, l0 = chain(state, 1, 0)
    t0 = time.perf_counter(); state, _ = chain(state, 1, 100); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); state, _ = chain(state, 8, 200); t8 = time.perf_counter() - t0
    ms = (t8 - t1) / 7 * 1e3
    print(f"{name}: {ms:.1f} ms/step  ({B/((t8-t1)/7):.0f} utt/s)  loss0={l0:.4f}", flush=True)
    return state


results = {}
for name, flag in [("xla strided convs", "0"), ("s2d phase convs  ", "1")]:
    state, compiled = build(flag)
    results[name] = time_path(name, compiled)

ref = results["xla strided convs"].variables["params"]
got = results["s2d phase convs  "].variables["params"]
worst = max(
    float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got))
)
print(f"params max |delta| after 10 steps, s2d vs xla: {worst:.3e}")
