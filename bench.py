"""Benchmark harness: LAS-small training throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: utterances/sec/chip on a LibriSpeech-shaped synthetic batch
(bf16 mixed precision, static max shapes: 1024 audio frames x 80 mel x 3,
127 decoder positions — the reference's TPU static-shape contract).
The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
reports the ratio against the driver-recorded first-round value when
present in BENCH_r1.json, else null.
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from speech_recognition_tpu.models import LAS
    from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

    platform = jax.default_backend()
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32

    model = LAS(
        rnn_type="lstm",
        vocab_size=16000,
        encoder_hidden_dim=256,
        decoder_hidden_dim=256,
        num_encoder_layers=3,
        num_decoder_layers=2,
        dropout=0.15,
        teacher_forcing_rate=0.99,
        dtype=dtype,
    )

    B = 32 if platform == "tpu" else 2
    T = 1024 if platform == "tpu" else 64
    N = 128 if platform == "tpu" else 8

    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
    tokens = jax.random.randint(rng, (B, N), 1, 16000)
    variables = model.init({"params": rng}, (audio, tokens[:, :-1]))

    tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
    state = TrainState.create(dict(variables), tx)
    train_step = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )

    model_input = (audio, tokens[:, :-1])
    y_true = tokens[:, 1:]

    # warmup / compile
    for i in range(2):
        state, metrics = train_step(state, model_input, y_true, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss"])

    iters = 10 if platform == "tpu" else 3
    start = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(state, model_input, y_true, jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - start

    utt_per_sec = B * iters / elapsed

    vs_baseline = None
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r1.json")
    if os.path.exists(ref_path):
        try:
            with open(ref_path) as f:
                vs_baseline = utt_per_sec / float(json.load(f)["value"])
        except Exception:
            vs_baseline = None

    print(
        json.dumps(
            {
                "metric": "train_utterances_per_sec_per_chip",
                "value": round(utt_per_sec, 3),
                "unit": "utt/s/chip",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
