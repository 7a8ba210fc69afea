"""Same-process A/B of LAS greedy search: XLA while_loop vs fused Pallas kernel.

Bench shapes (B=128, T=1024, L=128 tokens, LAS-small bf16).  Reports decode
wall time (best of 5), the implied RTF, and cross-checks the decoded tokens
between the two paths.  Run on the real TPU from the repo root:
    PYTHONPATH=.:$PYTHONPATH python tools/search_ab.py
"""

import os
import sys
import time

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

audio_seconds = B * ((T - 1) * 160 + 320) / 16000.0


def run(label):
    searcher = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
    out = np.asarray(searcher.greedy_search(audio)[0])  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        toks = np.asarray(searcher.greedy_search(audio)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: decode {best*1e3:.1f} ms  rtf {best/audio_seconds:.2e}")
    return out


os.environ["SRT_PALLAS_SEARCH"] = "0"
ref = run("xla while_loop")
os.environ["SRT_PALLAS_SEARCH"] = "1"
fused = run("pallas fused   ")

# On a random-init model the 16K-vocab logits are near-uniform (top-2
# relative gap below bf16 resolution), so one-ULP Mosaic-vs-XLA accumulation
# differences flip argmaxes and the feedback cascades.  Audit every
# diverging row: replay the XLA decode along its own tokens and assert the
# logits that produced the FIRST diverging token were a tie at bf16
# resolution.  Each path rounds its own f32 accumulation to bf16, so every
# logit carries +-1 ULP of path dependence and two competitors moving
# oppositely can flip a gap of up to 2 ULP; anything wider is a real
# divergence and fails loudly.  Trained models have peaked logits (top-2
# relative gap >> bf16 eps) and decode identically.
mism = int((ref != fused).sum())
print(f"token mismatches (random init): {mism} / {ref.size} ({100.0*mism/ref.size:.3f}%)")

diff = ref != fused
diverging = np.where(diff.any(axis=1))[0]
if diverging.size:
    searcher = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
    enc_out, keys, mask, states = searcher._encode(audio)
    step_fn = jax.jit(searcher._step)
    firsts = {int(i): int(np.argmax(diff[i])) for i in diverging}
    gap_at_flip = {}
    st = states
    for t in range(1, max(firsts.values()) + 1):
        logits, st = step_fn(enc_out, keys, jnp.asarray(ref[:, t - 1]), mask, st)
        rows = [i for i, ft in firsts.items() if ft == t]
        if rows:
            lg = np.asarray(logits[np.asarray(rows)], np.float32)
            top2 = np.sort(lg, axis=-1)[:, -2:]
            for r, (lo, hi) in zip(rows, top2):
                gap_at_flip[r] = (hi - lo, 2.0 ** (np.floor(np.log2(abs(hi))) - 7))
    bad = {r: g for r, (g, ulp) in gap_at_flip.items() if g > 2 * ulp}
    worst = max(g / ulp for g, ulp in gap_at_flip.values())
    print(f"tie-flip audit: {len(gap_at_flip)} diverging rows, worst gap = {worst:.2f} ULP, "
          f"non-tie flips: {len(bad)} {bad if bad else ''}")
    assert not bad, "real (non-tie) argmax divergence between XLA and Pallas greedy decode"
