"""Same-process A/B: per-step metric fetch vs depth-bounded async folding.

The old train loop did ``running[k] += float(v)`` after every step — a host
round-trip on the step's OWN metrics, which blocks dispatch of step N+1
until step N has fully executed and its scalars have crossed the tunnel.
``AsyncMetricAccumulator`` (train/metrics.py) folds metrics 8 steps late,
so every fetch lands on long-completed data and the step chain stays
asynchronous.  This measures both loop styles at bench shapes, steady-state
(30 steps after warmup), on whatever device is default.

    python tools/metrics_sync_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step
from speech_recognition_tpu.train.metrics import AsyncMetricAccumulator

B, T, N = 128, 1024, 128

model = LAS("lstm", 16000, 256, 256, 3, 2, 0.15, 0.99, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (B, T, 80, 3), jnp.bfloat16)
tokens = jax.random.randint(rng, (B, N), 1, 16000)
variables = model.init({"params": rng}, (audio, tokens[:, :-1]))

tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
train_step = make_train_step(
    model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
)
mi, yt = (audio, tokens[:, :-1]), tokens[:, 1:]


def fresh_state():
    return TrainState.create(jax.tree_util.tree_map(jnp.copy, dict(variables)), tx)


def loop_ms(consume, n=30, warmup=3):
    """ms/step of `n` steady-state steps with `consume(metrics)` per step."""
    state = fresh_state()
    for i in range(warmup):
        state, metrics = train_step(state, mi, yt, jax.random.fold_in(rng, i))
    float(metrics["loss"])  # end of warmup
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = train_step(state, mi, yt, jax.random.fold_in(rng, 100 + i))
        consume(metrics)
    float(metrics["loss"])  # force the tail of the chain
    return (time.perf_counter() - t0) / n * 1e3


def sync_consume(running):
    def consume(metrics):
        for k, v in metrics.items():
            running[k] = running.get(k, 0.0) + float(v)

    return consume


results = {}
for name, make in (
    ("sync float(v) per step", lambda: sync_consume({})),
    ("async accumulator d=8", lambda: AsyncMetricAccumulator(depth=8).push),
    ("no metric consumption", lambda: (lambda m: None)),
):
    best = float("inf")
    for _ in range(3):
        best = min(best, loop_ms(make()))
    results[name] = best
    print(f"{name:26}: {best:.2f} ms/step")

print(
    f"async saves {results['sync float(v) per step'] - results['async accumulator d=8']:+.2f} ms/step "
    f"(overhead vs free-running: {results['async accumulator d=8'] - results['no metric consumption']:+.2f} ms)"
)
