"""Diagnose the real-chip token mismatches between XLA and Pallas greedy search.

Hypothesis: a random-init model emits near-tied bf16 logits; any accumulation
-order difference flips one argmax and the divergence cascades.  If true,
mismatched sequences should agree perfectly up to a first flip point, and the
flip point's top-2 logit gap should be ~0 (a genuine tie at bf16 resolution).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.search import LASSearcher

B, T, L = 128, 1024, 128

model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, L), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))

os.environ["SRT_PALLAS_SEARCH"] = "0"
s0 = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
ref = np.asarray(s0.greedy_search(audio)[0])
os.environ["SRT_PALLAS_SEARCH"] = "1"
s1 = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
fused = np.asarray(s1.greedy_search(audio)[0])

diff = ref != fused
n_seq = int(diff.any(axis=1).sum())
firsts = [int(np.argmax(d)) for d in diff if d.any()]
print(f"sequences diverging: {n_seq}/{B}; first-mismatch positions: {sorted(firsts)[:20]} ...")

# After the first mismatch, feedback differs, so downstream disagreement is
# expected.  The question is only whether the FIRST flip is a bf16 tie.
# Recompute step logits for a few diverging rows with the XLA step fn at the
# flip point and report the top-2 gap.
enc_out, keys, mask, states = s0._encode(audio)
rows = [i for i in range(B) if diff[i].any()][:8]
for i in rows:
    t = int(np.argmax(diff[i]))  # position in [B, L] token buffer
    # replay the XLA decode to step t-1 feeding ref tokens
    st = tuple(s[i:i + 1] for s in states)
    eo, ky, mk = enc_out[i:i + 1], keys[i:i + 1], mask[i:i + 1]
    for step in range(t - 1):
        tok = jnp.asarray([ref[i, step]], jnp.int32)
        logits, st = s0._step(eo, ky, tok, mk, st)
    tok = jnp.asarray([ref[i, t - 1]], jnp.int32)
    logits, _ = s0._step(eo, ky, tok, mk, st)
    lg = np.asarray(logits[0], np.float32).ravel()
    top2 = np.sort(lg)[-2:]
    print(f"row {i:3d} first flip at t={t:3d}: xla tok {ref[i, t]} vs pallas {fused[i, t]}; "
          f"top-2 logits {top2[1]:.6f}, {top2[0]:.6f} (gap {top2[1] - top2[0]:.2e})")
