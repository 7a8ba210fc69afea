"""Same-process A/B: host-features train step vs raw-PCM + fused on-device
frontend step, LAS-small at bench shapes (B=128, T=1024 frames).

The on-device frontend is the DEFAULT for TPU tsv runs
(configs/train_config.py): the host ships padded raw audio [B, S] f32 and
the jitted train step computes framing -> STFT -> log-mel -> delta inside
the same XLA program (ops/frontend.py).  This tool measures what that
frontend costs ON TOP of the feature-mode step so the default is a recorded
decision (PERF.md round-7).

Run from the repo root: python - < tools/frontend_ab.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.configs import DataConfig
from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.ops.frontend import make_batch_frontend
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

import os

B, T, N = 128, 1024, 128
cfg = DataConfig.from_yaml(os.path.join("resources", "configs", "libri_config.yml"))
S = (T - 1) * cfg.frame_step + cfg.frame_length  # samples for exactly T frames

model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
feats = jax.random.normal(rng, (B, T, 80, 3), jnp.bfloat16)
tokens = jax.random.randint(rng, (B, N), 1, 16000)
raw = jax.random.normal(rng, (B, S), jnp.float32) * 0.1
lengths = jnp.full((B,), S, jnp.int32)

variables = model.init({"params": rng}, (feats, tokens[:, :-1]))
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))


def bench(step, state, model_input, y, tag, steps=20, reps=3):
    # train_step DONATES state: never reuse a consumed reference — chain it
    state, m = step(state, model_input, y, rng)
    float(m["loss"])  # compile + warm
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, model_input, y, jax.random.fold_in(rng, r * 100 + i))
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{tag:28s} {best * 1e3:7.3f} ms/step")
    return best


# A: feature-mode (the bench.py workload).  The step donates state buffers,
# so each variant gets its own COPY of the init variables.
state = TrainState.create(jax.tree.map(jnp.copy, dict(variables)), tx)
step_a = make_train_step(model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True)
a = bench(step_a, state, (feats, tokens[:, :-1]), tokens[:, 1:], "host features (bench mode)")

# B: raw-mode with the fused frontend (the TPU tsv default)
frontend = make_batch_frontend(cfg, spec_augment=True)


def preprocess(model_input, rng):
    (audio, lens), dec_in = model_input
    return frontend(audio, lens, rng), dec_in


state = TrainState.create(jax.tree.map(jnp.copy, dict(variables)), tx)
step_b = make_train_step(
    model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True, preprocess=preprocess
)
b = bench(step_b, state, ((raw, lengths), tokens[:, :-1]), tokens[:, 1:], "raw PCM + on-device frontend")

print(f"frontend adds {(b - a) * 1e3:+.3f} ms/step ({(b / a - 1) * 100:+.1f}%)")
