"""On-chip step timing for the Conformer-CTC family at bench shapes.

Times the jitted bf16 train step of the shipped conformer_small.yml
(16 x 256-dim blocks, 4 heads, kernel 32) at the framework bench shapes
(B=128, T=1024 feature frames, 16K vocab) with the chain-minus-chain
method used by the other step tools.  SRT_FUSED_CTC gates the fused
vocab+emissions Pallas pair exactly as for DS2.

Run: python tools/conformer_step_bench.py  (real TPU; bound >= 3000 s)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.models import Conformer
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

B = int(os.environ.get("CONF_BATCH", 128))
T, V = 1024, 16000
model = Conformer(
    vocab_size=V, encoder_dim=256, num_layers=16, num_attention_heads=4,
    conv_kernel_size=32, ffn_expansion=4,
    dropout=float(os.environ.get("CONF_DROPOUT", 0.1)),
    subsample_channels=(128, 128), blank_index=14, dtype=jnp.bfloat16,
)
print(f"dropout={model.dropout}", flush=True)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 1), jnp.bfloat16)
tokens = jnp.concatenate(
    [jax.random.randint(rng, (B, 40), 1, V), jnp.zeros((B, 24), jnp.int32)], axis=1
)
variables = model.init({"params": rng}, audio)
n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
print(f"conformer_small: {n_params/1e6:.1f} M params, B={B}, T={T}", flush=True)

tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
state = TrainState.create(dict(variables), tx)
step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
t0 = time.perf_counter()
compiled = step.lower(state, audio, tokens, rng).compile()
print(f"compile: {time.perf_counter() - t0:.1f} s", flush=True)


def chain(state, n, seed):
    for i in range(n):
        state, metrics = compiled(state, audio, tokens, jax.random.fold_in(rng, seed + i))
    return state, float(metrics["loss"])


state, l0 = chain(state, 1, 0)
best = np.inf
for rep in range(3):
    t0 = time.perf_counter(); state, _ = chain(state, 1, 100 + rep); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); state, _ = chain(state, 8, 200 + 10 * rep); t8 = time.perf_counter() - t0
    ms = (t8 - t1) / 7 * 1e3
    best = min(best, ms)
    print(f"rep{rep}: {ms:.1f} ms/step  ({B / ((t8 - t1) / 7):.0f} utt/s)", flush=True)
print(f"best: {best:.1f} ms/step  ({B / (best / 1e3):.0f} utt/s)  loss0={l0:.4f}", flush=True)
