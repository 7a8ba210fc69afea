"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding is exercised on a simulated mesh
(xla_force_host_platform_device_count=8) per the framework's test strategy;
the real-TPU path is exercised by bench.py / __graft_entry__.py.

The environment registers an `axon` TPU PJRT plugin via sitecustomize before
pytest starts, so JAX_PLATFORMS from the env is not enough — the config must
be updated post-import as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
