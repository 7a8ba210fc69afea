"""Host input-pipeline throughput bench (VERDICT round-1 item 2).

Measures the REAL host pipeline — audio decode -> tokenize -> feature
extraction -> (delta) -> padded batching — in utterances/sec on this
machine, over the fixture audio looped to N examples, with the LibriSpeech
data config (log-mel 80, delta/accel on).  The number to beat is the
device step rate from bench.py (~3,500-4,000 utt/s/chip): the host must
produce batches at least that fast or the chip starves.

Stages reported:
  decode        get_dataset only (thread-pool wav decode + tokenize)
  decode+feat   feature extraction fused into the decode pool (map_fn)
  full          + delta_accelerate + padded_batch(B=128, static shapes)
  full+prefetch same, consumed through prefetch_stream (the train-loop setup)

A worker-count sweep (--sweep-workers "1,2,4,8,16") runs the
decode+features stage at each pool size and prints the utt/s curve —
the scaling evidence for the "scales with cores" claim (on a 1-core host
the curve shows where threading stops paying: IO overlap keeps helping
past 1 worker, then GIL/CPU contention flattens it).

Usage: python tools/pipeline_bench.py [--examples 10000] [--workers 16]
       python tools/pipeline_bench.py --examples 4000 --sweep-workers 1,2,4,8,16
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=10000)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--sweep-workers", default=None,
                    help="comma list of pool sizes; sweeps the decode+features stage")
    args = ap.parse_args()

    from speech_recognition_tpu.configs import DataConfig
    from speech_recognition_tpu.configs.data_config import SpecAugmentConfig
    from speech_recognition_tpu.data import SentencePieceTokenizer
    from speech_recognition_tpu.data.dataset import (
        get_dataset,
        padded_batch,
        prefetch_stream,
    )
    from speech_recognition_tpu.ops.features import delta_accelerate

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wav = os.path.join(root, "tests/data/audio_files/test.wav")
    cfg = DataConfig(
        file_format="wav", audio_feature_type="log-mel-spectrogram",
        sample_rate=16000, frame_length=320, frame_step=160, fft_length=320,
        num_mel_bins=80, num_mfcc=40, lower_edge_hertz=80.0,
        upper_edge_hertz=7600.0, max_audio_length=2048, max_token_length=128,
        use_delta_accelerate=True, spec_augment=SpecAugmentConfig(enable=False),
    )
    feature_fn = cfg.make_audio_feature_fn("numpy")

    with open(os.path.join(root, "resources/sp-models/sp_model_unigram_16K_libri.model"), "rb") as f:
        tokenizer = SentencePieceTokenizer(f.read(), add_bos=True, add_eos=True)

    with tempfile.NamedTemporaryFile(
        "w", suffix=".tsv", dir=os.path.dirname(wav), delete=False
    ) as tsv:
        tsv.write("FilePath\tText\n")
        for i in range(args.examples):
            tsv.write(f"{os.path.basename(wav)}\tthe quick brown fox jumps over the lazy dog {i}\n")
        tsv_path = tsv.name

    # utterance duration for RTF-style context
    first = next(iter(get_dataset(tsv_path, "wav", 16000, tokenizer)))
    utt_seconds = len(first[0]) / 16000.0

    results = {}
    try:
        def run(name, stream, unit_batches=False):
            t0 = time.time()
            n = 0
            for _ in stream:
                n += 1
            dt = time.time() - t0
            utts = n * args.batch_size if unit_batches else n
            results[name] = utts / dt
            print(f"{name:14} {utts:6d} utts in {dt:6.2f}s = {utts / dt:8.0f} utt/s")

        feat_map = lambda a, t: (feature_fn(a), t)

        if args.sweep_workers:
            sweep = {}
            for w in [int(x) for x in args.sweep_workers.split(",")]:
                t0 = time.time()
                n = sum(
                    1
                    for _ in get_dataset(
                        tsv_path, "wav", 16000, tokenizer, num_workers=w, map_fn=feat_map
                    )
                )
                rate = n / (time.time() - t0)
                sweep[w] = round(rate, 1)
                print(f"decode+feat workers={w:3d}: {rate:8.0f} utt/s", flush=True)
            print(json.dumps({"examples": args.examples, "sweep_decode_feat": sweep}))
            return

        run("decode", get_dataset(tsv_path, "wav", 16000, tokenizer, num_workers=args.workers))
        run(
            "decode+feat",
            get_dataset(tsv_path, "wav", 16000, tokenizer, num_workers=args.workers, map_fn=feat_map),
        )

        def full_stream():
            raw = get_dataset(
                tsv_path, "wav", 16000, tokenizer, num_workers=args.workers, map_fn=feat_map
            )
            stream = ((delta_accelerate(a), t) for a, t in raw)
            return padded_batch(stream, args.batch_size, 2048, 128, pad_to_batch=True, with_lengths=True)

        run("full", full_stream(), unit_batches=True)
        run("full+prefetch", prefetch_stream(full_stream(), size=2), unit_batches=True)

        # raw-PCM mode (the TPU tsv default): the host only decodes,
        # tokenizes and stacks raw samples — features move on device
        from speech_recognition_tpu.data.dataset import quantized_padded_raw_batch

        def raw_stream():
            raw = get_dataset(tsv_path, "wav", 16000, tokenizer, num_workers=args.workers)
            return quantized_padded_raw_batch(
                raw, args.batch_size, cfg.frame_length, cfg.frame_step, max_frames=2048
            )

        run("raw (frontend on device)", prefetch_stream(raw_stream(), size=2), unit_batches=True)
    finally:
        os.unlink(tsv_path)

    print(json.dumps({
        "examples": args.examples,
        "workers": args.workers,
        "utt_seconds": round(utt_seconds, 2),
        **{k: round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
