"""Compile-cost probe for the beam mega-kernel — STAGED, small shapes first.

History: the first on-chip attempt compiled the bench-shape mega kernel
for >=8 minutes and was then SIGTERMed by a `timeout` wrapper — the kill
mid-remote-compile wedged the axon terminal for hours (every later
jax.devices() blocked).  Hence this probe:

  * compiles at small shapes first (same V-chunk program structure, so it
    reveals most of the Mosaic compile cost) and prints stage timings;
  * only then compiles bench shapes;
  * MUST be run WITHOUT any kill-capable wrapper (`timeout`, Ctrl-C, task
    stops).  Let it finish.  If it is still compiling after an hour, the
    kernel is impractical — leave it running and plan around it.

    python -u tools/beam_mega_compile_probe.py 2>&1 | tee /tmp/mega_probe.log
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


def probe(tag, B, T, L, K, enc, dec, vocab):
    t0 = time.time()
    model = LAS("lstm", vocab, enc, dec, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
    tokens = jax.random.randint(rng, (B, L), 1, vocab)
    variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
    print(f"[{tag}] init: {time.time() - t0:.1f}s", flush=True)

    searcher = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
    t0 = time.time()
    lowered = searcher._beam.lower(audio, K, 1.0, 32)
    print(f"[{tag}] lower: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[{tag}] compile: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    tok = np.asarray(compiled(audio)[0])
    print(f"[{tag}] first run: {time.time() - t0:.1f}s shape={tok.shape}", flush=True)

    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        np.asarray(compiled(audio)[0])
        best = min(best, time.time() - t0)
    audio_seconds = B * ((T - 1) * 160 + 320) / 16000.0
    print(f"[{tag}] beam-{K} decode: {best * 1e3:.1f} ms  rtf {best / audio_seconds:.2e}", flush=True)


# small: full 16K-vocab chunk structure (the dominant program size), tiny rows
probe("small", B=16, T=128, L=16, K=8, enc=256, dec=256, vocab=16000)
# bench shapes — only reached if the small compile was tolerable
probe("bench", B=128, T=1024, L=128, K=8, enc=256, dec=256, vocab=16000)
