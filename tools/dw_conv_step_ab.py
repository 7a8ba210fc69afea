"""On-chip A/B: depthwise-conv dkernel backward route on the FULL Conformer
train step (advisor round-2 medium finding).

ops/dw_conv.py works around the XLA SPMD grouped-grad mis-partitioning with
a K-unrolled tap-sum dkernel (K=32: 32 [B,T,C] multiply-reduces).  On a
single device XLA's own grouped-grad conv is exact and stays on the MXU,
so depthwise_conv1d now auto-selects it there (SRT_SPMD_SAFE_DWCONV
overrides).  This measures both routes on the full conformer_small step at
bench shapes and checks loss/param agreement (they should agree to bf16
tolerance; the tap-sum accumulates dkernel in f32 either way).

Run: python tools/dw_conv_step_ab.py   (real TPU; bound >= 3000 s)
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
model = Conformer(
    vocab_size=V, encoder_dim=256, num_layers=16, num_attention_heads=4,
    conv_kernel_size=32, ffn_expansion=4, dropout=0.1,
    subsample_channels=(128, 128), blank_index=14, dtype=jnp.bfloat16,
)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 1), jnp.bfloat16)
tokens = jnp.concatenate(
    [jax.random.randint(rng, (B, 40), 1, V), jnp.zeros((B, 24), jnp.int32)], axis=1
)
variables = model.init({"params": rng}, audio)
variables_host = jax.tree.map(np.asarray, dict(variables))
fresh_vars = lambda: jax.tree.map(jnp.asarray, variables_host)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
np.asarray(jnp.arange(4.0))  # warm the transfer path


def build(flag):
    os.environ["SRT_SPMD_SAFE_DWCONV"] = flag
    try:
        state = TrainState.create(fresh_vars(), tx)
        step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
        t0 = time.perf_counter()
        compiled = step.lower(state, audio, tokens, rng).compile()
        print(f"flag={flag}: compile {time.perf_counter() - t0:.1f} s", flush=True)
        return compiled
    finally:
        os.environ.pop("SRT_SPMD_SAFE_DWCONV", None)


def time_path(name, compiled):
    state = TrainState.create(fresh_vars(), tx)

    def chain(state, n, seed):
        for i in range(n):
            state, metrics = compiled(state, audio, tokens, jax.random.fold_in(rng, seed + i))
        return state, float(metrics["loss"])

    state, l0 = chain(state, 1, 0)
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter(); state, _ = chain(state, 1, 100 + rep); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); state, _ = chain(state, 8, 200 + 10 * rep); t8 = time.perf_counter() - t0
        best = min(best, (t8 - t1) / 7 * 1e3)
    print(f"{name}: {best:.1f} ms/step  ({B / (best / 1e3):.0f} utt/s)  loss0={l0:.4f}", flush=True)
    return state


states = {}
for name, flag in [("tap-sum dkernel (spmd-safe)", "1"), ("xla grouped-grad (fast)   ", "0")]:
    states[name] = time_path(name, build(flag))

a, b = states.values()
diffs = jax.tree_util.tree_map(
    lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))),
    a.params, b.params,
)
print(f"max param diff after 26 steps: {max(jax.tree_util.tree_leaves(diffs)):.3e}", flush=True)
