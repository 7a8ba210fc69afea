"""shard_map plumbing so the Pallas fast paths run on multi-device meshes.

``pallas_call`` is not partition-aware: under a multi-device mesh a bare call
forces its operands to replicate, so round 1 hard-disabled every fused kernel
whenever ``jax.device_count() != 1`` and multi-chip runs silently regressed
to the XLA fallbacks.  The kernels here are pure maps over the batch axis
(the grid iterates over steps/examples; no cross-batch math) except for the
CE/CTC weight gradients, which are per-shard partial sums.  That makes the
port mechanical: wrap each ``pallas_call`` in ``jax.shard_map`` over the
active mesh's ``data`` axis — batch-sharded operands arrive shard-local,
weights replicate, and the weight-grad outputs get one ``psum``.

Mirrors how the reference runs its full compute graph on every replica under
TPUStrategy (reference speech_recognition/utils.py:130-156, run/train.py:62).
"""

import os

import jax
from jax.sharding import PartitionSpec as P

from ...parallel.mesh import data_axis_size, get_active_mesh


def pallas_backend_ok() -> bool:
    """True on a real TPU backend, or when SRT_PALLAS_FORCE=1 (tests drive
    the TPU kernels on the CPU mesh inside pltpu.force_tpu_interpret_mode)."""
    return jax.default_backend() == "tpu" or os.environ.get("SRT_PALLAS_FORCE") == "1"


def batch_shards(batch: int):
    """(n_data_shards, local_batch) when the batch axis can be laid over the
    active mesh's 'data' axis; None when the kernel must fall back to XLA
    (multi-device run without a registered mesh, or indivisible batch)."""
    if len(jax.devices()) > 1 and get_active_mesh() is None:
        return None
    d = data_axis_size()
    if batch % d:
        return None
    return d, batch // d


def bspec(dim, ndim) -> P:
    """PartitionSpec sharding axis ``dim`` over 'data' (None = replicated)."""
    parts = [None] * ndim
    if dim is not None:
        parts[dim] = "data"
    return P(*parts)


def shard_over_batch(fn, operands, in_dims, out_specs, psum_out=()):
    """Run ``fn(*operands) -> tuple`` once per data-shard via shard_map.

    in_dims: per-operand batch-axis index (None = replicated weight).
    out_specs: PartitionSpec per output (build with ``bspec``).
    psum_out: output indices holding per-shard partial sums (weight grads);
        reduced with a psum over 'data' inside the mapped region.

    With a single data shard, calls ``fn`` directly (zero overhead — the
    single-chip bench path is byte-identical to round 1).
    """
    d = data_axis_size()
    if d == 1 or any(
        dim is not None and x.shape[dim] % d
        for dim, x in zip(in_dims, operands)
    ):
        # single data shard, or a direct call whose batch doesn't divide the
        # registered mesh (the dispatch gates never allow the latter)
        return fn(*operands)
    mesh = get_active_mesh()
    in_specs = tuple(bspec(d, x.ndim) for d, x in zip(in_dims, operands))

    def mapped(*ops):
        outs = list(fn(*ops))
        for i in psum_out:
            outs[i] = jax.lax.psum(outs[i], "data")
        return tuple(outs)

    return jax.shard_map(
        mapped, mesh=mesh, in_specs=in_specs, out_specs=tuple(out_specs),
        check_vma=False,
    )(*operands)
