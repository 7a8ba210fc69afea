"""Profile the LAS-small beam-8 batch decode and print the top ops.

Usage: python tools/profile_beam.py   (real TPU; ~2 min incl. compile)
Writes a perfetto trace under /tmp/srt_trace/beam and prints per-decode
op totals so the remaining while-body cost can be attributed (the fused
vocab top-k kernel landed; what's left: attention/cell fusions, score
top-k, state/token re-gathers, while-loop overhead).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.search import LASSearcher

tag = os.environ.get("SRT_PROFILE_TAG", "beam")
outdir = f"/tmp/srt_trace/{tag}"

B, T, L, K = 128, 1024, 128, 8
model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
tokens = jax.random.randint(rng, (B, L), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))

searcher = LASSearcher(model, variables, max_token_length=L, bos_id=1, eos_id=2)
np.asarray(searcher.beam_search(audio, K)[0])  # compile + warm

REPS = 3
with jax.profiler.trace(outdir):
    for _ in range(REPS):
        np.asarray(searcher.beam_search(audio, K)[0])

paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
if not paths:
    print("no trace found under", outdir)
    sys.exit(1)
with gzip.open(sorted(paths)[-1], "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
pid_name = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_name[e["pid"]] = e["args"].get("name", "")
tpu_pids = {p for p, n in pid_name.items() if "TPU" in n or "tpu" in n}

agg = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)

total = sum(agg.values())
print(f"tag={tag}  tpu-slice total {total/REPS/1e3:.2f} ms/decode over {REPS} decodes")
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
    print(f"  {dur/REPS/1e3:8.3f} ms/decode  {name[:110]}")

groups = {}
for name, dur in agg.items():
    key = name.split(".")[0].split("(")[0]
    groups[key] = groups.get(key, 0.0) + dur
print("--- grouped")
for name, dur in sorted(groups.items(), key=lambda kv: -kv[1])[:20]:
    print(f"  {dur/REPS/1e3:8.3f} ms/decode  {name}")
