"""On-chip A/B: nn.scan over Conformer blocks vs the unrolled block stack.

The 16 blocks are architecturally identical, so the unrolled HLO repeats
the same subgraph 16x — the bench-shape train step costs ~115 s to compile
(PERF.md round-12).  `scan_layers: true` folds them into ONE traced block
under lax.scan with stacked [L, ...] params: the program shrinks ~16x,
compile time should drop proportionally, and step time is the open
question this tool answers (scan can inhibit cross-layer fusion; the
blocks' boundaries are residual adds, so little fusion should be lost).

Variants (identical math — scan params are the unrolled params stacked):
  unrolled    scan_layers=False (shipped default before this A/B)
  scan_remat  scan_layers=True + remat=True, params via stack_block_params

Plain scan (no remat) OOMs at bench shapes: the scan body's residuals are
saved per layer as stacked [16, ...] f32 buffers (the [16,128,256,256]
attention probs alone are 4x512 MB), where the unrolled graph lets XLA
rematerialize across block boundaries.  remat=True inside the scan body
recomputes the block in the backward, so only the [B,T,D] carries are
stored — the viable configuration for scanned layers.

Prints compile seconds and best-of-3 chain-minus-chain ms/step for both,
plus the loss agreement between the two on the same (params, batch, key).

Run: python tools/conformer_scan_ab.py  (real TPU; bound >= 3600 s)
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
from speech_recognition_tpu.models.conformer import stack_block_params
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

B, T, V = 128, 1024, 16000
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 1), jnp.bfloat16)
tokens = jnp.concatenate(
    [jax.random.randint(rng, (B, 40), 1, V), jnp.zeros((B, 24), jnp.int32)], axis=1
)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))

KW = dict(
    vocab_size=V, encoder_dim=256, num_layers=16, num_attention_heads=4,
    conv_kernel_size=32, ffn_expansion=4, dropout=0.1,
    subsample_channels=(128, 128), blank_index=14, dtype=jnp.bfloat16,
)

model_u = Conformer(**KW)
model_s = Conformer(scan_layers=True, remat=True, **KW)
variables_u = jax.device_get(model_u.init({"params": rng}, audio))
variables_s = {"params": stack_block_params(variables_u["params"], KW["num_layers"])}


def measure(label, model, variables, key):
    fresh = lambda: TrainState.create(
        {"params": jax.tree_util.tree_map(jnp.asarray, variables["params"])}, tx
    )
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    t0 = time.perf_counter()
    compiled = step.lower(fresh(), audio, tokens, key).compile()
    compile_s = time.perf_counter() - t0
    print(f"{label}: compile {compile_s:.1f} s", flush=True)

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
    return best, compile_s, l0


bu, cu, lu = measure("unrolled", model_u, variables_u, rng)
bs, cs, ls = measure("scan_remat", model_s, variables_s, rng)
print(
    f"RESULT unrolled={bu:.1f}ms/{cu:.0f}s  scan_remat={bs:.1f}ms/{cs:.0f}s  "
    f"step_delta={bs - bu:+.1f} ms  compile_delta={cs - cu:+.0f} s  "
    f"loss_unrolled={lu:.4f} loss_scan={ls:.4f}",
    flush=True,
)
