"""Shared plumbing for the CLI entry points."""

import jax
import jax.numpy as jnp
import numpy as np


def select_device(device: str) -> None:
    """Pin JAX to the requested platform (CLI surface parity with the
    reference's get_device_strategy, utils.py:130-156)."""
    device = device.upper()
    platform = {"CPU": "cpu", "GPU": "gpu", "TPU": "tpu"}.get(device)
    if platform is None:
        raise ValueError(f"device {device} is invalid (CPU | GPU | TPU)")
    previous = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", platform)
        jax.devices()
    except RuntimeError as e:
        jax.config.update("jax_platforms", previous)
        # TPU PJRT plugins can register under a vendor platform name (e.g.
        # a tunneled chip); accept the default backend when its devices ARE
        # TPUs by device_kind
        if platform == "tpu" and _default_devices_are_tpu():
            return
        raise RuntimeError(f"Cannot find {device}!") from e


def _default_devices_are_tpu() -> bool:
    try:
        devices = jax.devices()
    except RuntimeError:
        return False
    return bool(devices) and all(
        "tpu" in (getattr(d, "device_kind", "") or "").lower() for d in devices
    )


def compute_dtype(mixed_precision: bool, device: str):
    """bfloat16 everywhere under mixed precision (TPU-native policy; the
    reference used fp16 off-TPU, run/train.py:63-67)."""
    return jnp.bfloat16 if mixed_precision else jnp.float32


def create_model(model_config, dtype):
    """Instantiate the Flax model definition with the compute dtype."""
    model = model_config.create_model()
    if dtype != jnp.float32:
        model = model.clone(dtype=dtype)
    return model


def build_variables(model, model_config, data_config, rng, audio_len=64, token_len=8):
    """Initialize model variables with tiny static shapes."""
    from ..models import LAS

    audio = jnp.zeros((1, audio_len, data_config.frequency_dim, data_config.feature_dim), jnp.float32)
    if isinstance(model, LAS):
        tokens = jnp.zeros((1, token_len), jnp.int32)
        return model.init({"params": rng}, (audio, tokens))
    return model.init({"params": rng}, audio)


def pipelined_decode(batches, decode_fn, depth=2):
    """Software-pipeline device decode against host materialization.

    JAX dispatch is asynchronous: keeping ``depth`` decode calls in flight
    overlaps each call's ~21 ms host dispatch work with the device execution
    of the previous call (measured on-chip: 85.6 ms/call synchronous vs
    64.8 ms/call chained for beam-8, PERF.md round-5). The reference got the
    same overlap from Keras ``predict``'s internal prefetch queue
    (reference run/evaluate.py:79-84).

    ``batches`` yields ``(audio, *rest)``; ``decode_fn(audio)`` must return a
    device array. Yields ``(np_output, *rest)`` in input order.
    """
    from collections import deque

    inflight = deque()
    for audio, *rest in batches:
        inflight.append((decode_fn(audio), rest))
        if len(inflight) >= depth:
            out, r = inflight.popleft()
            yield (np.asarray(out), *r)
    while inflight:
        out, r = inflight.popleft()
        yield (np.asarray(out), *r)


def use_raw_frontend(on_device_frontend, device: str, use_tfrecord: bool) -> bool:
    """Resolve the on-device-frontend tri-state for the decode CLIs: None =
    auto (ON for TPU tsv runs — same TPU-first default as TrainConfig);
    explicit True/False from the flag always wins.  TFRecords hold
    pre-computed features, so raw mode never applies there."""
    if use_tfrecord:
        return False
    if on_device_frontend is None:
        return device == "TPU"
    return bool(on_device_frontend)


def frontend_decode_fn(data_config, decode_fn):
    """Wrap a feature-domain ``decode_fn`` for raw ``(audio, lengths)``
    batches: the fused on-device frontend (ops/frontend.py) runs as its own
    jit feeding the decode call — both dispatches are asynchronous, so the
    pipelining in ``pipelined_decode`` is preserved.  Pad frames come out
    exactly zero (frontend contract), which is what the models' masks key
    on; SpecAugment is off at decode time so zero-detection is exact."""
    from ..ops.frontend import make_batch_frontend

    frontend = make_batch_frontend(data_config, spec_augment=False)

    def _fn(batch):
        audio, lengths = batch
        feats, _ = frontend(audio, lengths)
        return decode_fn(feats)

    return _fn


def round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def count_params(variables) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables.get("params", {})))
