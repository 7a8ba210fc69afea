"""Loss-curve impact of the bf16 Pallas decoder backward (ADVICE round-1 #1).

The Pallas decoder backward emits its per-step gradient streams (dz, demb,
dctx, dscores, dq, dh0/dc0) in bf16 where the XLA backward scan keeps f32
(ops/pallas/decoder_kernel.py).  This measures the END-TO-END consequence:
identical models trained for N Adam steps on identical data/rng with
(a) the full Pallas path and (b) the XLA custom-VJP scan, comparing the
loss trajectories and final parameter drift.  The result is recorded in
PERF.md as the accepted precision tradeoff (or grounds to f32 the streams).

Run on the real chip: python tools/loss_curve_ab.py [--steps 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(flags, steps, batch=128):
    for k, v in flags.items():
        os.environ[k] = v
    import jax
    import jax.numpy as jnp
    import optax

    from speech_recognition_tpu.models import LAS
    from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = LAS(
        rnn_type="lstm", vocab_size=16000, encoder_hidden_dim=256,
        decoder_hidden_dim=256, num_encoder_layers=3, num_decoder_layers=2,
        dropout=0.15, teacher_forcing_rate=0.99, dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    B, T, N = batch, 1024, 128
    audio = jax.random.normal(rng, (B, T, 80, 3), jnp.float32)
    tokens = jax.random.randint(rng, (B, N), 1, 16000)
    variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
    state = TrainState.create(dict(variables), optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5)))
    step = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )
    losses = []
    for i in range(steps):
        state, metrics = step(state, (audio, tokens[:, :-1]), tokens[:, 1:], jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    params = jax.tree.map(np.asarray, state.params)
    return np.asarray(losses), params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    base = {"SRT_PALLAS_DECODER": "1", "SRT_PALLAS_DECODER_BWD": "1", "SRT_FUSED_CE": "1"}
    xla = {"SRT_PALLAS_DECODER": "0", "SRT_PALLAS_DECODER_BWD": "0", "SRT_FUSED_CE": "1"}

    loss_p, params_p = run(base, args.steps)
    loss_x, params_x = run(xla, args.steps)

    diff = np.abs(loss_p - loss_x)
    rel = diff / np.maximum(np.abs(loss_x), 1e-6)
    leaves_p = [v for _, v in sorted_tree(params_p)]
    leaves_x = [v for _, v in sorted_tree(params_x)]
    drift = max(
        float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))
              / (np.max(np.abs(b.astype(np.float64))) + 1e-9))
        for a, b in zip(leaves_p, leaves_x)
    )
    print(f"steps={args.steps}")
    print(f"loss pallas  first/last: {loss_p[0]:.5f} / {loss_p[-1]:.5f}")
    print(f"loss xla     first/last: {loss_x[0]:.5f} / {loss_x[-1]:.5f}")
    print(f"max |dloss|: {diff.max():.2e}  max rel: {rel.max():.2e} (at step {int(rel.argmax())})")
    print(f"final rel loss delta: {rel[-1]:.2e}")
    print(f"max per-leaf param rel drift: {drift:.2e}")


def sorted_tree(tree):
    import jax

    return sorted(
        ("/".join(str(getattr(k, "key", k)) for k in p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    )


if __name__ == "__main__":
    main()
