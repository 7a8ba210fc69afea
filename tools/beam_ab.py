"""Same-process A/B of LAS beam search: tiled (reference layout) vs untiled.

The reference beam loop tiles encoder output / projected keys / mask to
B*beam rows before the decode loop (search.py:141-153), so every while-loop
step re-streams beam-many copies of the two large attention operands from
HBM (~400 MB/step at B=128, beam=8, S=256).  SRT_BEAM_UNTILED=1 (default)
keeps one copy and attends all beams of a batch element with a K-query
attention axis (models/las.py step_beam).  Run on the real TPU:
    PYTHONPATH=.:$PYTHONPATH python tools/beam_ab.py
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

B, T, L, K = 128, 1024, 128, 8

model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, L), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))

audio_seconds = B * ((T - 1) * 160 + 320) / 16000.0


def run(label):
    searcher = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
    out = np.asarray(searcher.beam_search(audio, K)[0])  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(searcher.beam_search(audio, K)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: decode {best*1e3:.1f} ms  rtf {best/audio_seconds:.2e}")
    return out


os.environ["SRT_PALLAS_BEAM"] = "0"
os.environ["SRT_PALLAS_BEAM_TOPK"] = "0"
os.environ["SRT_BEAM_UNTILED"] = "0"
ref = run("tiled (reference layout)")
os.environ["SRT_BEAM_UNTILED"] = "1"
new = run("untiled beam attention  ")
os.environ["SRT_PALLAS_BEAM_TOPK"] = "1"
fused = run("+ pallas vocab topk     ")
mismf = int((new != fused).sum())
print(f"fused-vs-untiled mismatches (random init): {mismf} / {new.size} ({100.0*mismf/new.size:.3f}%)")
os.environ["SRT_PALLAS_BEAM"] = "1"
mega = run("whole-loop mega-kernel  ")
mismm = int((mega != fused).sum())
print(f"mega-vs-fused mismatches (random init): {mismm} / {mega.size} ({100.0*mismm/mega.size:.3f}%)")

# Both paths are XLA with identical per-row arithmetic; on a random-init
# model a one-ULP bf16 regrouping difference can still flip near-tie
# argmaxes, so report mismatches rather than asserting exact equality
# (trained peaked logits decode identically — the real-checkpoint pin is
# tests/test_model_parity.py::test_las_beam_decode_parity, which runs both
# layouts via the SRT_BEAM_UNTILED default).
mism = int((ref != new).sum())
print(f"token mismatches (random init): {mism} / {ref.size} ({100.0*mism/ref.size:.3f}%)")
