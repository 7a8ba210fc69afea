"""Fused vocab-projection + CTC emission log-probs as a Pallas kernel pair.

DeepSpeech2's CTC path only ever needs, per (batch, time) position, the
logsumexp over the vocabulary and the K = N_labels+1 gathered logits
(measure.py `_emission_logprobs`, reference speech_recognition/measure.py:
24-42 via tf.nn.ctc_loss).  Under XLA the [B,T,V] logits (0.4 GB bf16 at
DS2 bench shapes, V=16000) are materialized by the Dense layer and then
re-read by the lse reduction, the gather matmul, the bias-grad reduction
and the backward dW/dhid matmuls — ~8 ms of the 36.6 ms step trace
(tools/profile_ds2.py).  These kernels keep each example's logits tile in
VMEM:

forward  (grid over B): logits_b = hid_b @ W + bias -> emits lse [T] and
    vals [T,K] (gather as an f32 one-hot matmul, exact); the emission
    log-probs (vals - lse) and the whole CTC DP are tiny XLA ops on those.
backward (grid over B): recomputes the logits tile, forms
    dlogits = demission @ onehot^T + softmax * dlse in VMEM, emits dhid_b
    and accumulates dW / dbias in f32 VMEM scratch written on the last
    step.  Full logits never touch HBM in either direction.

Equivalence with the XLA projection + `_emission_logprobs` path (values
and all three gradients) is tested in tests/test_pallas_ctc.py
(interpret mode) and at train-step level.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch


def _pad_k(K: int) -> int:
    return ((K + 127) // 128) * 128


def vocab_emissions_supported(hid, W, ids) -> bool:
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("ctc_vocab_emissions", reason, **kw)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    if hid.dtype != jnp.bfloat16:
        return decline(f"hidden dtype {hid.dtype} != bfloat16")
    B, T, H = hid.shape
    V = W.shape[-1]
    Kp = _pad_k(ids.shape[-1])
    if H % 128 or V % 128:
        return decline(f"unaligned dims (H {H} % 128, V {V} % 128)")
    if batch_shards(B) is None:  # multi-device: kernels run per data-shard
        return decline(f"batch {B} not shardable over the data mesh axis")
    # backward budget per kernel instance (grid over B, so the tiles are
    # per-example and batch-independent): logits + dlogits f32 tiles,
    # resident W bf16, onehot f32, dW/db f32 scratch, per-step blocks
    vmem = 2 * T * V * 4 + W.size * 2 + V * Kp * 4 + (H + 1) * V * 4 + 2 * T * H * 2 + 3 * T * 128 * 4
    if vmem > 72 * 2**20:
        return decline(f"backward VMEM estimate {vmem >> 20} MB > 72 MB budget")
    return True


def _fwd_kernel(refs):
    hid_ref, ids_ref, w_ref, b_ref, lse_ref, vals_ref = refs
    logits = (
        jnp.dot(hid_ref[0], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )  # [T, V] f32, VMEM only
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)) + m
    T = logits.shape[0]
    lse_ref[0] = jnp.broadcast_to(lse, (T, 128))
    V = logits.shape[1]
    Kp = vals_ref.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (V, Kp), 0)
    idrow = jax.lax.slice_in_dim(ids_ref[0], 0, 1, axis=0)  # [1, Kp]
    onehot = (cols == idrow).astype(jnp.float32)  # exact 0/1 gather matrix
    vals_ref[0] = jnp.dot(logits, onehot, preferred_element_type=jnp.float32)


def _bwd_kernel(n_steps, refs):
    (hid_ref, ids_ref, lse_ref, dvals_ref, dlse_ref, w_ref, b_ref,
     dhid_ref, dw_ref, db_ref, dw_scr, db_scr) = refs
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    hid_t = hid_ref[0]
    logits = (
        jnp.dot(hid_t, w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )
    lse_col = jax.lax.slice_in_dim(lse_ref[0], 0, 1, axis=1)  # [T,1]
    sm = jnp.exp(logits - lse_col)
    V = logits.shape[1]
    Kp = dvals_ref.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (V, Kp), 0)
    idrow = jax.lax.slice_in_dim(ids_ref[0], 0, 1, axis=0)
    onehot = (cols == idrow).astype(jnp.float32)
    dlse_col = jax.lax.slice_in_dim(dlse_ref[0], 0, 1, axis=1)
    # dlogits = demission @ onehot^T + softmax * dlse  (both [T,V] f32)
    dlog = jax.lax.dot_general(
        dvals_ref[0], onehot, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + sm * dlse_col
    dlog_bf = dlog.astype(jnp.bfloat16)
    dhid_ref[0] = jax.lax.dot_general(
        dlog_bf, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        hid_t, dlog_bf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_scr[:] = db_scr[:] + jnp.sum(dlog, axis=0, keepdims=True)

    @pl.when(n == n_steps - 1)
    def _():
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


def _prep_ids(ids, V, Kp):
    B, K = ids.shape
    pad = jnp.full((B, Kp - K), V, jnp.int32)  # V never matches a vocab col
    idp = jnp.concatenate([ids.astype(jnp.int32), pad], axis=1)
    return jnp.broadcast_to(idp[:, None, :], (B, 8, Kp))


def _fwd_invoke(hid, ids_rep, W, b2):
    # B here is the per-shard local batch under a multi-device mesh
    B, T, H = hid.shape
    V = W.shape[-1]
    Kp = ids_rep.shape[-1]
    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    step = lambda *bs: pl.BlockSpec((1,) + bs, lambda n: (n,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda *refs: _fwd_kernel(refs),
        grid=(B,),
        in_specs=[step(T, H), step(8, Kp), const(H, V), const(1, V)],
        out_specs=[step(T, 128), step(T, Kp)],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, T, Kp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=112 * 2**20
        ),
    )(hid, ids_rep, W, b2)


def _call_fwd(hid, ids_rep, W, b):
    V = W.shape[-1]
    lse, vals = shard_over_batch(
        _fwd_invoke,
        (hid, ids_rep, W, b.reshape(1, V)),
        in_dims=(0, 0, None, None),
        out_specs=(bspec(0, 3), bspec(0, 3)),
    )
    return lse[..., 0], vals


def _bwd_invoke(hid, ids_rep, lse_rep, dvals, dlse_rep, W, b2):
    B, T, H = hid.shape
    V = W.shape[-1]
    Kp = ids_rep.shape[-1]
    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    step = lambda *bs: pl.BlockSpec((1,) + bs, lambda n: (n,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda *refs: _bwd_kernel(B, refs),
        grid=(B,),
        in_specs=[step(T, H), step(8, Kp), step(T, 128), step(T, Kp), step(T, 128),
                  const(H, V), const(1, V)],
        out_specs=[step(T, H), const(H, V), const(1, V)],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), hid.dtype),
            jax.ShapeDtypeStruct((H, V), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, V), jnp.float32),
            pltpu.VMEM((1, V), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=112 * 2**20
        ),
    )(hid, ids_rep, lse_rep, dvals, dlse_rep, W, b2)


def _call_bwd(hid, ids_rep, lse, dvals, dlse, W, b):
    B, T, H = hid.shape
    V = W.shape[-1]
    lse_rep = jnp.broadcast_to(lse[:, :, None], (B, T, 128))
    dlse_rep = jnp.broadcast_to(dlse[:, :, None], (B, T, 128))
    # each shard contributes a partial dW/db over its local batch -> psum
    return shard_over_batch(
        _bwd_invoke,
        (hid, ids_rep, lse_rep, dvals, dlse_rep, W, b.reshape(1, V)),
        in_dims=(0, 0, 0, 0, 0, None, None),
        out_specs=(bspec(0, 3), bspec(None, 2), bspec(None, 2)),
        psum_out=(1, 2),
    )


@jax.custom_vjp
def fused_vocab_emissions(hid, W, b, ids):
    """log softmax(hid @ W + b) gathered at ``ids`` -> [B, T, K] f32.

    hid [B,T,H] bf16, W [H,V], b [V], ids [B,K] int.  Drop-in for
    measure._emission_logprobs composed with the vocab Dense; ids carry
    no gradient.
    """
    emission, _res = _fused_fwd_impl(hid, W, b, ids)
    return emission


def _fused_fwd_impl(hid, W, b, ids):
    K = ids.shape[-1]
    ids_rep = _prep_ids(ids, W.shape[-1], _pad_k(K))
    lse, vals = _call_fwd(hid, ids_rep, W.astype(hid.dtype), b.astype(hid.dtype))
    emission = vals[..., :K] - lse[..., None]
    return emission, (lse, ids_rep)


def _fused_fwd(hid, W, b, ids):
    emission, (lse, ids_rep) = _fused_fwd_impl(hid, W, b, ids)
    return emission, (hid, W, b, ids, lse, ids_rep)


def _fused_bwd(residuals, demission):
    import numpy as np

    hid, W, b, ids, lse, ids_rep = residuals
    K = ids.shape[-1]
    Kp = ids_rep.shape[-1]
    B, T, _ = demission.shape
    dvals = jnp.pad(demission.astype(jnp.float32), ((0, 0), (0, 0), (0, Kp - K)))
    dlse = -jnp.sum(demission.astype(jnp.float32), axis=-1)
    dhid, dW, db = _call_bwd(
        hid, ids_rep, lse, dvals, dlse, W.astype(hid.dtype), b.astype(hid.dtype)
    )
    dids = np.zeros(ids.shape, jax.dtypes.float0)
    return dhid, dW.astype(W.dtype), db[0].astype(b.dtype), dids


fused_vocab_emissions.defvjp(_fused_fwd, _fused_bwd)
