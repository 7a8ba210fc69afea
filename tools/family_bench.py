"""Per-family train-step bench: LAS / DS2 / Conformer / Transducer in ONE
bounded run, written to BENCH_FAMILIES.json at the repo root.

Purpose (VERDICT round-2 #3/#4): make non-LAS perf driver-visible round
over round, and replace hand FLOP estimates with the rigorous method
bench.py uses — ``lower().compile().cost_analysis()`` flops -> MFU against
the chip's peak bf16 FLOP/s.  Caveat inherited from bench.py:107-117:
cost_analysis counts a lax.scan body ONCE, so families with in-scan
matmuls (LAS/DS2 recurrences, transducer joint planes) report a LOWER
BOUND on flops and therefore on MFU.

Shapes: the framework bench shapes (B=128, T=1024 audio frames, 16K
vocab), each family at its shipped small config (resources/configs/
{las_small,deepspeech,conformer_small,transducer_small}.yml sizes).

Every measurement also records which fused fast paths FIRED vs DECLINED
(ops/pallas/fallback.py events captured across trace+steps) — the
round-14/15 lesson ("verify a new fast path actually fires") applied
systematically.

Run: python tools/family_bench.py            (real TPU; bound >= 3000 s)
     FAMILIES=conformer,transducer python tools/family_bench.py  (subset)
     python tools/family_bench.py --shapes   (off-bench shape matrix ->
         BENCH_SHAPES.json; VERDICT r4 #5.  CELLS=base,B32 filters.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import _flops_per_step, _peak_flops
from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_train_step

B, T, V = 128, 1024, 16000
rng = jax.random.PRNGKey(0)
tx = optax.adam(linear_warmup_decay(10000, 2e-4, 1e-5))
on_tpu = jax.default_backend() == "tpu"
dtype = jnp.bfloat16 if on_tpu else jnp.float32
REPS = int(os.environ.get("FAMILY_REPS", 3))

# train-step fast paths each family is EXPECTED to fire at bench shapes —
# "fired" below is expected minus declined, so a silent no-op shows up as
# a missing entry in the cell's fired list
TRAIN_PATHS = {
    "las": ("ce_vocab",),
    "deepspeech2": ("ctc_vocab_emissions",),
    "conformer": ("fused_mhsa", "ctc_vocab_emissions"),
    "transducer": ("transducer_joint",),
    "transducer_pruned": ("banded_joint",),
    "transducer_pruned8": ("banded_joint",),
}


def _ctc_tokens(b=None):
    b = b or B
    return jnp.concatenate(
        [jax.random.randint(rng, (b, 40), 1, V), jnp.zeros((b, 24), jnp.int32)], axis=1
    )


def build_las(b=None, t=None, v=None):
    from speech_recognition_tpu.models import LAS

    b, t, v = b or B, t or T, v or V
    model = LAS(
        rnn_type="lstm", vocab_size=v, encoder_hidden_dim=256, decoder_hidden_dim=256,
        num_encoder_layers=3, num_decoder_layers=2, dropout=0.15,
        teacher_forcing_rate=0.99, dtype=dtype,
    )
    audio = jax.random.normal(rng, (b, t, 80, 3), jnp.float32)
    tokens = jax.random.randint(rng, (b, 128), 1, v)
    variables = model.init({"params": rng}, (audio, tokens[:, :-1]))
    audio = audio.astype(dtype)
    step = make_train_step(
        model, model.get_loss_fn(), model.get_metrics(), needs_teacher_forcing_rng=True
    )
    return model, variables, step, (audio, tokens[:, :-1]), tokens[:, 1:]


def build_deepspeech2(b=None, t=None, v=None):
    from speech_recognition_tpu.models import DeepSpeech2

    b, t, v = b or B, t or T, v or V
    model = DeepSpeech2(
        3, (32, 32, 96), ((41, 11), (21, 11), (21, 11)), ((2, 2), (2, 1), (2, 1)),
        "gru", 7, 128, 0.1, 0.0, v, 14, dtype=dtype,
    )
    audio = jax.random.normal(rng, (b, t, 80, 1), jnp.float32)
    tokens = _ctc_tokens(b)
    variables = model.init({"params": rng}, audio)
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    return model, variables, step, audio, tokens


def build_conformer(b=None, t=None, v=None):
    from speech_recognition_tpu.models import Conformer

    b, t, v = b or B, t or T, v or V
    model = Conformer(
        vocab_size=v, encoder_dim=256, num_layers=16, num_attention_heads=4,
        conv_kernel_size=32, ffn_expansion=4, dropout=0.1,
        subsample_channels=(128, 128), blank_index=14, dtype=dtype,
    )
    audio = jax.random.normal(rng, (b, t, 80, 1), dtype)
    tokens = _ctc_tokens(b)
    variables = model.init({"params": rng}, audio)
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    return model, variables, step, audio, tokens


def build_transducer(pruned_range=0, b=None, t=None, v=None):
    from speech_recognition_tpu.models import Transducer

    b, t, v = b or B, t or T, v or V
    model = Transducer(
        vocab_size=v, encoder_dim=256, num_encoder_layers=16, num_attention_heads=4,
        conv_kernel_size=32, ffn_expansion=4, subsample_channels=(128, 128),
        pred_dim=320, num_pred_layers=1, joint_dim=320, dropout=0.1, dtype=dtype,
        pruned_range=pruned_range,
    )
    audio = jax.random.normal(rng, (b, t, 80, 3), dtype)
    # libri-shaped labels: ~40 real sentencepiece tokens + pad to 64
    tokens = _ctc_tokens(b)
    model_input, y_true = (audio, tokens[:, :-1]), tokens[:, 1:]
    variables = model.init({"params": rng}, model_input)
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    return model, variables, step, model_input, y_true


BUILDERS = {
    "las": build_las,
    "deepspeech2": build_deepspeech2,
    "conformer": build_conformer,
    "transducer": build_transducer,
    # pruned (banded) lattice, s_range=4 — the SHIPPED transducer training
    # objective (resources/configs/transducer_small.yml pruned_range: 4;
    # same model/checkpoints as dense, quality A/B in
    # tools/pruned_quality_ab.json)
    "transducer_pruned": lambda **kw: build_transducer(pruned_range=4, **kw),
    # wider-band sweep row (transducer_small_pruned.yml): on demand via
    # FAMILIES=transducer_pruned8, not part of the default sweep
    "transducer_pruned8": lambda **kw: build_transducer(pruned_range=8, **kw),
}

# the default sweep: every shipped family objective (the wider-band pruned8
# sweep row is measured on demand via FAMILIES=transducer_pruned8)
DEFAULT_FAMILIES = [n for n in BUILDERS if n != "transducer_pruned8"]


def measure(name, builder, reps=None, n_long=8):
    from speech_recognition_tpu.ops.pallas.fallback import fallback_events, reset_fallbacks

    reset_fallbacks()
    model, variables, step, model_input, y_true = builder()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    state = TrainState.create(dict(variables), tx)
    t0 = time.perf_counter()
    compiled = step.lower(state, model_input, y_true, rng).compile()
    compile_s = time.perf_counter() - t0
    flops = _flops_per_step(compiled)
    batch = jax.tree_util.tree_leaves(model_input)[0].shape[0]
    print(f"[{name}] {n_params/1e6:.1f} M params, compile {compile_s:.1f} s", flush=True)

    def chain(state, n, seed):
        for i in range(n):
            state, metrics = compiled(state, model_input, y_true, jax.random.fold_in(rng, seed + i))
        return state, float(metrics["loss"])

    state, l0 = chain(state, 1, 0)
    best = np.inf
    for rep in range(reps or REPS):
        t0 = time.perf_counter(); state, _ = chain(state, 1, 100 + rep); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); state, _ = chain(state, n_long, 200 + 10 * rep); tn = time.perf_counter() - t0
        ms = (tn - t1) / (n_long - 1) * 1e3
        best = min(best, ms)
        print(f"[{name}] rep{rep}: {ms:.1f} ms/step ({batch / ((tn - t1) / (n_long - 1)):.0f} utt/s)", flush=True)

    declined = sorted({k for k, _ in fallback_events()})
    reasons = sorted({f"{k}: {r}" for k, r in fallback_events()})
    fired = [k for k in TRAIN_PATHS.get(name, ()) if k not in declined]
    peak = _peak_flops(jax.devices()[0])
    mfu = round(flops / (best / 1e3) / peak, 4) if flops and peak else None
    out = {
        "step_ms": round(best, 2),
        "utt_per_s": round(batch / (best / 1e3), 1),
        "params_m": round(n_params / 1e6, 2),
        "flops_per_step": flops,
        "mfu_lower_bound": mfu,
        "loss0": round(l0, 4),
        "compile_s": round(compile_s, 1),
        "fastpaths_fired": fired,
        "fastpaths_declined": reasons,
    }
    print(f"[{name}] best {best:.1f} ms/step, MFU>= {mfu}, fired={fired}", flush=True)
    return out


def _snapshot(path):
    """Per-round snapshot (VERDICT r3 #6): regressions in any family must be
    a one-line diff, not git archaeology.  Round number comes from ROUND
    or the highest driver-written BENCH_r*.json + 1 (the upcoming round)."""
    import glob
    import re
    import shutil

    root = os.path.dirname(path)
    round_no = os.environ.get("ROUND")
    if not round_no:
        seen = [
            int(m.group(1))
            for f in glob.glob(os.path.join(root, "BENCH_r*.json"))
            for m in [re.search(r"BENCH_r(\d+)\.json$", f)]
            if m
        ]
        round_no = f"{max(seen, default=0) + 1:02d}"
    base = os.path.basename(path).rsplit(".", 1)[0]
    snap = os.path.join(root, f"{base}_r{round_no}.json")
    shutil.copy(path, snap)
    return snap


def main():
    which = os.environ.get("FAMILIES", ",".join(DEFAULT_FAMILIES)).split(",")
    device = jax.devices()[0]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_FAMILIES.json")
    results = {
        "device": getattr(device, "device_kind", str(device)),
        "batch": B,
        "audio_frames": T,
        "families": {},
    }
    if os.path.exists(path):  # subset runs update the committed artifact
        with open(path) as f:
            prev = json.load(f)
        if prev.get("batch") == B and prev.get("audio_frames") == T:
            results["families"].update(prev.get("families", {}))
    for name in which:
        results["families"][name] = measure(name, BUILDERS[name])
        with open(path, "w") as f:  # checkpoint after every family
            json.dump(results, f, indent=1)
    snap = _snapshot(path)
    print(json.dumps(results))
    print(f"wrote {path} (+ snapshot {os.path.basename(snap)})", flush=True)


# --------------------------------------------------- off-bench shape matrix

# one-dimension-at-a-time variants around the bench point: plausible user
# shapes (small batch, short/long audio, kspon 8K vocab).  VERDICT r4 #5.
CELLS = {
    "base": dict(b=128, t=1024, v=16000),
    "B32": dict(b=32, t=1024, v=16000),
    "T512": dict(b=128, t=512, v=16000),
    "T2048": dict(b=128, t=2048, v=16000),
    "V8k": dict(b=128, t=1024, v=8000),
}


def main_shapes():
    which = os.environ.get("FAMILIES", ",".join(DEFAULT_FAMILIES)).split(",")
    cells = os.environ.get("CELLS", ",".join(CELLS)).split(",")
    device = jax.devices()[0]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SHAPES.json"
    )
    results = {"device": getattr(device, "device_kind", str(device)), "cells": {}}
    if os.path.exists(path):  # subset runs update the committed artifact
        with open(path) as f:
            results["cells"].update(json.load(f).get("cells", {}))
    for name in which:
        for cell in cells:
            kw = CELLS[cell]
            key = f"{name}/{cell}"
            print(f"=== {key}: {kw}", flush=True)
            r = measure(name, lambda: BUILDERS[name](**kw), reps=1, n_long=4)
            r["shape"] = kw
            results["cells"][key] = r
            with open(path, "w") as f:  # checkpoint after every cell
                json.dump(results, f, indent=1)
    snap = _snapshot(path)
    print(f"wrote {path} (+ snapshot {os.path.basename(snap)})", flush=True)


if __name__ == "__main__":
    if "--shapes" in sys.argv:
        main_shapes()
    else:
        main()
