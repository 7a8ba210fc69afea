"""Compile-cost probe for the beam mega-kernel at bench shapes.

Run FIRST after any tunnel outage / before tools/beam_ab.py: it lowers and
compiles ONLY the mega-kernel jit (no warm-up decode, no A/B), printing
stage timings, then runs one decode to validate execution.  Run it
foreground with a bound far above worst-case compile (>= 30 min) — never
kill it mid-compile (CLAUDE.md: a SIGTERM during an active claim/compile
wedges the remote device grant for hours).

    timeout 3000 python -u tools/beam_mega_compile_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SRT_PALLAS_BEAM"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.search import LASSearcher

B, T, L, K = 128, 1024, 128, 8

t0 = time.time()
model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, L), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
print(f"init (training fwd compile incl.): {time.time() - t0:.1f}s", flush=True)

searcher = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)

t0 = time.time()
lowered = searcher._beam.lower(audio, K, 1.0, 32)
print(f"lower: {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
compiled = lowered.compile()
print(f"compile: {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
tok, ppl = compiled(audio)
np.asarray(tok)
print(f"first run: {time.time() - t0:.1f}s", flush=True)

best = float("inf")
for _ in range(5):
    t0 = time.time()
    np.asarray(compiled(audio)[0])
    best = min(best, time.time() - t0)
audio_seconds = B * ((T - 1) * 160 + 320) / 16000.0
print(f"mega beam-8 decode: {best * 1e3:.1f} ms  rtf {best / audio_seconds:.2e}", flush=True)
