"""Train-step-only batch-size sweep on the real chip (no RTF decode).

Usage: python tools/batch_sweep.py 192 [256 ...]
Prints per-B step time via the N-chain-minus-1-chain method (bench.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

T, N = 1024, 128
dtype = jnp.bfloat16
model = LAS(
    rnn_type="lstm", vocab_size=16000, encoder_hidden_dim=256,
    decoder_hidden_dim=256, num_encoder_layers=3, num_decoder_layers=2,
    dropout=0.15, teacher_forcing_rate=0.99, dtype=dtype,
)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
np.asarray(jnp.arange(4.0))  # warm the transfer path

for B in [int(a) for a in sys.argv[1:]] or [128]:
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
    tokens = jax.random.randint(rng, (B, N), 1, 16000)
    variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
    state = TrainState.create(dict(variables), tx)
    step = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )
    model_input, y_true = (audio, tokens[:, :-1]), tokens[:, 1:]

    def chain(state, n, seed):
        for i in range(n):
            state, metrics = step(state, model_input, y_true, jax.random.fold_in(rng, seed + i))
        float(metrics["loss"])
        return state

    t0 = time.perf_counter()
    state = chain(state, 1, 0)
    print(f"B={B}: compile+warmup {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter(); state = chain(state, 1, 100); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); state = chain(state, 8, 200); t8 = time.perf_counter() - t0
    ms = (t8 - t1) / 7 * 1e3
    print(f"B={B}: {ms:.1f} ms/step  {B/ms*1e3:.0f} utt/s", flush=True)
