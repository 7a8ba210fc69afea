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
        if jax.devices()[0].platform.lower() != platform and not (
            # vendor-named TPU plugins (device_kind says TPU) are already the
            # right backend; clearing them can drop a tunnel client that
            # cannot be re-initialized
            platform == "tpu"
            and _default_devices_are_tpu()
        ):
            # a different backend was already initialized before this CLI ran
            # (e.g. jax preloaded by the embedding process): config updates
            # alone don't re-resolve it — drop the live backends and let the
            # next devices() call honor the requested platform
            from jax.extend import backend as jax_backend

            jax_backend.clear_backends()
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
    """Initialize model variables with tiny static shapes.

    Keeps only the persistent collections ({'params', 'batch_stats'}) —
    init also materializes transient sown collections (e.g. the MoE
    'aux_loss', models/moe.py) that checkpoints never contain, and the
    restore template must match the checkpoint structure."""
    from ..models import LAS, Transducer

    audio = jnp.zeros((1, audio_len, data_config.frequency_dim, data_config.feature_dim), jnp.float32)
    if isinstance(model, (LAS, Transducer)):
        tokens = jnp.zeros((1, token_len), jnp.int32)
        variables = model.init({"params": rng}, (audio, tokens))
    else:
        variables = model.init({"params": rng}, audio)
    return {k: variables[k] for k in ("params", "batch_stats") if k in variables}


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


def sharded_decode_fn(decode_fn, batch_size: int):
    """SPMD decode for the evaluate/inference CLIs: shard each batch's rows
    over a ('data',) mesh when more than one device is visible and the batch
    divides.  Returns ``(wrapped_fn, mesh_or_None)``.

    The jitted search loops are batch-parallel, so XLA partitions them over
    the batch axis exactly like the train step; the fused Pallas search
    kernels ride their shard_map port (ops/pallas/sharding.py) through the
    registered active mesh.  Replaces what Keras ``predict`` under a
    distribution strategy did for the reference (reference
    run/evaluate.py:79-84 with utils.py:130-156).
    """
    from ..parallel import get_device_mesh, shard_batch

    n = len(jax.devices())
    dp = 1
    for d in range(min(n, batch_size), 0, -1):
        if batch_size % d == 0:
            dp = d
            break
    if dp <= 1:
        return decode_fn, None
    mesh = get_device_mesh(data_parallel=dp, model_parallel=1)

    def _fn(batch):
        return decode_fn(shard_batch(batch, mesh))

    return _fn, mesh


def round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def count_params(variables) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables.get("params", {})))
