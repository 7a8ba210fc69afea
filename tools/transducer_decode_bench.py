"""On-chip Transducer decode RTF: greedy + TSD beam at bench shapes.

transducer_small (16x256 Conformer encoder, LSTM-320 pred net, joint 320,
V=16K) on a B=128 x 1024-frame (10.23 s/utt) synthetic batch, random
weights — decode cost is shape-bound, not weight-bound.  Chained-call
methodology from bench.py: (best chain(n) - best chain(1)) / (n-1) cancels
the constant result-fetch latency and reports the steady-state pipelined
rate the evaluate/inference CLIs deliver (run/common.py pipelined_decode).

Run: python tools/transducer_decode_bench.py   (real TPU; bound >= 3000 s)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models import Transducer
from speech_recognition_tpu.search import TransducerSearcher

B, T, V = 128, 1024, 16000
L = 128  # max_token_length
model = Transducer(
    vocab_size=V, encoder_dim=256, num_encoder_layers=16, num_attention_heads=4,
    conv_kernel_size=32, ffn_expansion=4, subsample_channels=(128, 128),
    pred_dim=320, num_pred_layers=1, joint_dim=320, dropout=0.1, dtype=jnp.bfloat16,
)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.bfloat16)
tokens = jnp.zeros((B, 8), jnp.int32)
variables = model.init({"params": rng}, (audio, tokens))
searcher = TransducerSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
audio_seconds = B * ((T - 1) * 160 + 320) / 16000.0
np.asarray(jnp.arange(4.0))
reps, n_calls = 3, 4


def best_rtf(name, dispatch):
    t0 = time.perf_counter()
    np.asarray(dispatch())  # compile + warmup
    print(f"{name}: compile+1st {time.perf_counter() - t0:.1f} s", flush=True)

    def chain(k):
        t0 = time.perf_counter()
        outs = [dispatch() for _ in range(k)]
        np.asarray(outs[-1])
        return time.perf_counter() - t0

    best_n = min(chain(n_calls) for _ in range(reps))
    best_1 = min(chain(1) for _ in range(reps))
    per_call = max(best_n - best_1, 0.0) / (n_calls - 1)
    rtf = per_call / audio_seconds
    print(f"{name}: {per_call * 1e3:.1f} ms/call  RTF {rtf:.2e}", flush=True)
    return rtf


best_rtf("greedy      ", lambda: searcher.greedy_search(audio)[0])
best_rtf("beam4 (TSD) ", lambda: searcher.beam_search(audio, 4)[0])
best_rtf("beam8 (TSD) ", lambda: searcher.beam_search(audio, 8)[0])

# ---- fused-vs-XLA beam parity (SRT_FUSED_TSD gate).  Random-init logits
# are near-uniform (ties everywhere), so sharpen the joint first: with
# separated logits the two paths must pick identical hypotheses; the
# fused kernel's bf16-rounded logits only flip exact near-ties.
if os.environ.get("SRT_FUSED_TSD", "1") == "1":
    sharp = jax.tree_util.tree_map(lambda x: x, dict(variables))
    sharp["params"] = dict(sharp["params"])
    sharp["params"]["joint_kernel"] = variables["params"]["joint_kernel"] * 4.0
    s_fast = TransducerSearcher(model, sharp, max_token_length=L, bos_id=1, eos_id=2)
    tok_f, p_f = s_fast.beam_search(audio[:32], 8)
    os.environ["SRT_FUSED_TSD"] = "0"
    try:
        s_slow = TransducerSearcher(model, sharp, max_token_length=L, bos_id=1, eos_id=2)
        tok_s, p_s = s_slow.beam_search(audio[:32], 8)
    finally:
        os.environ.pop("SRT_FUSED_TSD", None)
    tok_f, tok_s = np.asarray(tok_f), np.asarray(tok_s)
    top1 = np.mean(np.all(tok_f[:, 0] == tok_s[:, 0], axis=-1))
    dlp = np.max(np.abs(np.log(np.asarray(p_f, np.float64) + 1e-30)
                        - np.log(np.asarray(p_s, np.float64) + 1e-30)))
    print(f"parity: top-1 agreement {top1:.3f}, max |dlogp| {dlp:.3e}", flush=True)
