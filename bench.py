"""Benchmark harness: LAS-small training throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: utterances/sec/chip on a LibriSpeech-shaped synthetic batch
(bf16 mixed precision, static max shapes: 1024 audio frames x 80 mel x 3,
127 decoder positions — the reference's TPU static-shape discipline).

Timing methodology: on this environment block_until_ready can be a no-op
(remote PJRT tunnel), so completion is forced by fetching the final step's
scalar loss, and the per-step time is the difference between an N-step chain
and a 1-step chain (cancels the constant fetch latency).  The reference
publishes no throughput numbers (BASELINE.md); vs_baseline is the ratio
against BENCH_r1.json when present.
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from speech_recognition_tpu.models import LAS
    from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

    platform = jax.default_backend()
    on_tpu = platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

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

    B = 64 if on_tpu else 2
    T = 1024 if on_tpu else 64
    N = 128 if on_tpu else 8

    # warm the transfer path first (first host<->device fetch pays a large
    # one-time setup cost on the tunnel)
    np.asarray(jnp.arange(4.0))

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

    def run_chain(state, n, seed):
        for i in range(n):
            state, metrics = train_step(state, model_input, y_true, jax.random.fold_in(rng, seed + i))
        float(metrics["loss"])  # forces completion of the whole chain
        return state

    # compile + warmup
    state = run_chain(state, 1, 0)

    n_long = 8 if on_tpu else 3
    t0 = time.perf_counter()
    state = run_chain(state, 1, 100)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = run_chain(state, n_long, 200)
    t_long = time.perf_counter() - t0

    per_step = max((t_long - t_short) / (n_long - 1), 1e-9)
    utt_per_sec = B / per_step

    vs_baseline = None
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r1.json")
    if os.path.exists(ref_path):
        try:
            with open(ref_path) as f:
                vs_baseline = round(utt_per_sec / float(json.load(f)["value"]), 3)
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
