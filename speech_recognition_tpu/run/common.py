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
    try:
        jax.config.update("jax_platforms", platform)
        jax.devices()
    except RuntimeError as e:
        raise RuntimeError(f"Cannot find {device}!") from e


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


def round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def count_params(variables) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables.get("params", {})))
