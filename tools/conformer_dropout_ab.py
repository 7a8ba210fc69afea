"""On-chip A/B: counter-based hash dropout vs threefry nn.Dropout (Conformer).

Context: the round-11 sweep (tools/conformer_sweep_ab.py) measured dropout
at 122.6 ms of the 210 ms train step.  ops/dropout.py replaces threefry
bit-gen with a fused position hash and regenerates masks in the backward.

Variants (fresh jit object each — module env gates are read at trace time):
  fast      SRT_FAST_DROPOUT=1 (shipped default), dropout 0.1
  threefry  SRT_FAST_DROPOUT=0 (old path), dropout 0.1
  nodrop    dropout 0.0 — the floor

Run: python tools/conformer_dropout_ab.py  (real TPU; bound >= 3600 s)
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

B, T, V = 128, 1024, 16000
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 1), jnp.bfloat16)
tokens = jnp.concatenate(
    [jax.random.randint(rng, (B, 40), 1, V), jnp.zeros((B, 24), jnp.int32)], axis=1
)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))


def make(dropout):
    model = Conformer(
        vocab_size=V, encoder_dim=256, num_layers=16, num_attention_heads=4,
        conv_kernel_size=32, ffn_expansion=4, dropout=dropout,
        subsample_channels=(128, 128), blank_index=14, dtype=jnp.bfloat16,
    )
    variables = jax.device_get(model.init({"params": rng}, audio))
    fresh = lambda: TrainState.create(
        jax.tree_util.tree_map(jnp.asarray, dict(variables)), tx
    )
    return fresh, make_train_step(model, model.get_loss_fn(), model.get_metrics())


def measure(label, step, fresh, key):
    t0 = time.perf_counter()
    compiled = step.lower(fresh(), audio, tokens, key).compile()
    print(f"{label}: compile {time.perf_counter() - t0:.1f} s", flush=True)

    def chain(state, n, seed):
        for i in range(n):
            state, m = compiled(state, audio, tokens, jax.random.fold_in(key, seed + i))
        return state, float(m["loss"])

    state, l0 = chain(fresh(), 1, 0)
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter(); state, _ = chain(state, 1, 100 + rep); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); state, _ = chain(state, 8, 200 + 10 * rep); t8 = time.perf_counter() - t0
        ms = (t8 - t1) / 7 * 1e3
        best = min(best, ms)
        print(f"{label} rep{rep}: {ms:.1f} ms/step", flush=True)
    print(f"{label} best: {best:.1f} ms/step  ({B / (best / 1e3):.0f} utt/s)  loss0={l0:.4f}", flush=True)
    return best


results = {}
os.environ.pop("SRT_FAST_DROPOUT", None)  # default = fast
fresh, step = make(0.1)
results["fast"] = measure("fast", step, fresh, rng)

os.environ["SRT_FAST_DROPOUT"] = "0"
fresh_t, step_t = make(0.1)
results["threefry"] = measure("threefry", step_t, fresh_t, rng)
del os.environ["SRT_FAST_DROPOUT"]

fresh0, step0 = make(0.0)
results["nodrop"] = measure("nodrop", step0, fresh0, rng)

print("RESULT " + "  ".join(f"{k}={v:.1f}" for k, v in results.items())
      + f"  fast_win={results['threefry'] - results['fast']:.1f} ms"
      + f"  fast_overhead_vs_nodrop={results['fast'] - results['nodrop']:.1f} ms", flush=True)
