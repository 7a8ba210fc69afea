"""Profile the DeepSpeech2 train step and print top ops by self-time.

Same trace-parsing approach as tools/profile_step.py, on the shipped
deepspeech.yml shape: 3 convs + 7x BiGRU(128) + CTC, B=128, T=1024.
Run: python tools/profile_ds2.py
"""

import collections
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.models import DeepSpeech2
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

tag = os.environ.get("SRT_PROFILE_TAG", "ds2")
outdir = f"/tmp/srt_trace/{tag}"

B, T, V = 128, 1024, 16000
# shipped resources/configs/deepspeech.yml shape
model = DeepSpeech2(
    3,
    (32, 32, 96),
    ((41, 11), (21, 11), (21, 11)),
    ((2, 2), (2, 1), (2, 1)),
    "gru",
    7,
    128,
    0.1,
    0.0,
    V,
    14,
    dtype=jnp.bfloat16,
)
rng = jax.random.PRNGKey(0)
# bf16 features, matching the real host pipeline (SRT_HOST_BF16) and bench.py
audio = jax.random.normal(rng, (B, T, 80, 1), jnp.bfloat16)
tokens = jnp.concatenate(
    [jax.random.randint(rng, (B, 40), 1, V), jnp.zeros((B, 24), jnp.int32)], axis=1
)
variables = model.init({"params": rng}, audio)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
state = TrainState.create(dict(variables), tx)
step = make_train_step(model, model.get_loss_fn(), model.get_metrics())

state, m = step(state, audio, tokens, rng)
float(m["loss"])  # compile + warm

with jax.profiler.trace(outdir):
    for i in range(3):
        state, m = step(state, audio, tokens, jax.random.fold_in(rng, i))
    float(m["loss"])

paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
if not paths:
    print("no trace under", outdir)
    sys.exit(1)
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
pid_name = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_name[e["pid"]] = e["args"].get("name", "")
tpu = {p for p, n in pid_name.items() if "TPU" in n or "tpu" in n}
agg = collections.defaultdict(float)
meta = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu:
        n = e["name"]
        agg[n] += e.get("dur", 0.0)
        if n not in meta:
            a = e.get("args", {})
            meta[n] = (a.get("source", "").split("/")[-1][:24], a.get("tf_op", "")[-66:])
print(f"tag={tag}  total {sum(agg.values())/3/1e3:.2f} ms/step (3 steps, incl. hierarchy double-count)")
for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
    s, t = meta[n]
    print(f"  {d/3/1e3:7.3f} ms  {n[:30]:30s} {s:24s} {t}")
groups = collections.defaultdict(float)
for n, d in agg.items():
    groups[n.split(".")[0].split("(")[0]] += d
print("--- grouped")
for n, d in sorted(groups.items(), key=lambda kv: -kv[1])[:16]:
    print(f"  {d/3/1e3:7.3f} ms  {n}")
