"""On-chip sweep over Conformer train-step variants, one chip claim.

Variants of the jitted bf16 train step at bench shapes (B=128, T=1024):
  base     dropout 0.1, threefry keys, encoder time pad ON (shipped)
  pad_off  TIME_PAD_GATE pushed above T' — measures the T'=255 ragged-tile
           cost the pad exists to remove
  nodrop   dropout 0.0 — upper bound on all dropout cost (RNG + mask mul
           + the fusion breaks it forces)
  rbg      dropout 0.1 with rbg keys — isolates threefry bit-generation
           cost (rbg rides the TPU hardware RNG).  LAS measured no effect
           (PERF.md round-4 dead ends) but LAS has 2 dropout sites vs the
           Conformer's ~7 per block x 16 blocks on up-to-[B,T,4D] tensors.

Every variant builds its OWN make_train_step jit object: jax.jit.lower()
serves cached traces, so flipping module constants (TIME_PAD_GATE) under a
reused jit silently re-times the old program (measured: 0.7 s "compile" and
identical timing — the first pad A/B attempt was void).

Run: python tools/conformer_sweep_ab.py  (real TPU; bound >= 3600 s)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import speech_recognition_tpu.models.conformer as conf_mod
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
    """Fresh model + state factory + fresh jit object (never reuse a jitted
    step across variants — its lowering cache ignores module constants)."""
    model = Conformer(
        vocab_size=V, encoder_dim=256, num_layers=16, num_attention_heads=4,
        conv_kernel_size=32, ffn_expansion=4, dropout=dropout,
        subsample_channels=(128, 128), blank_index=14, dtype=jnp.bfloat16,
    )
    variables = jax.device_get(model.init({"params": rng}, audio))
    # the train step DONATES the state — rebuild per measurement
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
fresh, step = make(0.1)
results["base"] = measure("base", step, fresh, rng)

# isolate the fused MHSA kernel (base keeps pad ON so the plain XLA
# attention sees the same tile-aligned T'=256)
os.environ["SRT_FUSED_MHSA"] = "0"
fresh_nm, step_nm = make(0.1)
results["mhsa_off"] = measure("mhsa_off", step_nm, fresh_nm, rng)
del os.environ["SRT_FUSED_MHSA"]

# NOTE: pad_off leaves T'=255, which also fails the fused-MHSA gate —
# this variant is pad_off AND mhsa_off (the pre-round-11 program)
assert conf_mod.TIME_PAD_GATE == 128
conf_mod.TIME_PAD_GATE = 10 ** 9
fresh_np, step_np = make(0.1)
results["pad_off"] = measure("pad_off", step_np, fresh_np, rng)
conf_mod.TIME_PAD_GATE = 128

fresh0, step0 = make(0.0)
results["nodrop"] = measure("nodrop", step0, fresh0, rng)

try:
    rbg = jax.random.PRNGKey(0, impl="rbg")
    fresh_r, step_r = make(0.1)
    results["rbg"] = measure("rbg", step_r, fresh_r, rbg)
except Exception as e:  # rbg unavailable on some backends
    print(f"rbg variant failed: {e!r}", flush=True)
    results["rbg"] = float("nan")

print("RESULT " + "  ".join(f"{k}={v:.1f}" for k, v in results.items())
      + f"  mhsa_win={results['mhsa_off'] - results['base']:.1f} ms"
      + f"  pad+mhsa_win={results['pad_off'] - results['base']:.1f} ms"
      + f"  dropout_cost={results['base'] - results['nodrop']:.1f} ms"
      + f"  threefry_cost={results['base'] - results['rbg']:.1f} ms", flush=True)
