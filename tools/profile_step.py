"""Profile the LAS-small train step and print the top ops by self-time.

Usage: run from the repo root with the decoder-path env flags set, e.g.
  SRT_PALLAS_DECODER=1 python - < tools/profile_step.py
Writes the trace under /tmp/srt_trace/<tag> and prints a duration summary
parsed from the perfetto trace (no TensorBoard needed).
"""

import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

tag = os.environ.get("SRT_PROFILE_TAG", "default")
outdir = f"/tmp/srt_trace/{tag}"

B, T, N = 128, 1024, 128
model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
# bf16 features, matching the real host pipeline (SRT_HOST_BF16) and bench.py
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.bfloat16)
tokens = jax.random.randint(rng, (B, N), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
state = TrainState.create(dict(variables), tx)
step = make_train_step(model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True)

mi, y = (audio, tokens[:, :-1]), tokens[:, 1:]
state, m = step(state, mi, y, rng)
float(m["loss"])  # compile + warm

with jax.profiler.trace(outdir):
    for i in range(3):
        state, m = step(state, mi, y, jax.random.fold_in(rng, i))
    float(m["loss"])

# ---- parse the perfetto trace: sum slice durations by name on TPU tracks
paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
if not paths:
    print("no trace found under", outdir)
    sys.exit(1)
with gzip.open(sorted(paths)[-1], "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
# find TPU device pids (process names containing "TPU" / "/device:")
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
print(f"tag={tag}  tpu-slice total {total/3/1e3:.2f} ms/step over 3 steps")
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {dur/3/1e3:8.3f} ms/step  {name[:110]}")

# grouped summary
groups = {}
for name, dur in agg.items():
    key = name.split(".")[0].split("(")[0]
    groups[key] = groups.get(key, 0.0) + dur
print("--- grouped")
for name, dur in sorted(groups.items(), key=lambda kv: -kv[1])[:18]:
    print(f"  {dur/3/1e3:8.3f} ms/step  {name}")
