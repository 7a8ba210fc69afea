"""Profile the Conformer-CTC train step and print top ops by self-time.

Same trace-parsing approach as tools/profile_ds2.py, on the shipped
conformer_small.yml shape (16 x 256-dim blocks, 4 heads, kernel 32),
B=128, T=1024.  Run: python tools/profile_conformer.py  (real TPU)
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from speech_recognition_tpu.models import Conformer
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

tag = os.environ.get("SRT_PROFILE_TAG", "conformer")
outdir = f"/tmp/srt_trace/{tag}"

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

# --- attribute leaf op time to (phase, normalized module path) and source line.
# Only events carrying a tf_op arg are leaf HLO ops (parent trace regions like
# jit_train_step have no args), so this view has no hierarchy double-count.
import re

by_mod = collections.defaultdict(float)
by_src = collections.defaultdict(float)
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in tpu:
        continue
    a = e.get("args", {})
    t = a.get("tf_op", "")
    if not t:
        continue
    d = e.get("dur", 0.0)
    by_src[a.get("source", "?").split("/")[-1]] += d
    phase = "bwd" if "transpose(jvp" in t else "fwd"
    m = re.search(r"block\d+/(.*)", t)
    parts = t.rsplit("/", 2)
    path = m.group(1) if m else "/".join(parts[-2:])
    path = re.sub(r"ff[12]", "ff", path).rstrip(":")
    by_mod[(phase, path)] += d
print("--- by module path (leaf ops only)")
for (ph, p), d in sorted(by_mod.items(), key=lambda kv: -kv[1])[:40]:
    print(f"  {d/3/1e3:7.3f} ms  {ph}  {p[:80]}")
print(f"  leaf total: {sum(by_mod.values())/3/1e3:.3f} ms/step")
print("--- by source line (leaf ops only)")
for s, d in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {d/3/1e3:7.3f} ms  {s}")
