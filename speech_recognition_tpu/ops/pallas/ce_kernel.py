"""Fused vocab-projection + masked sparse CE as a Pallas kernel pair.

Under XLA, the LAS train step materializes [N,B,V] logits (0.5 GB bf16 at
bench shapes), reads them for the CE logsumexp, writes [N,B,V] dlogits in
the backward and reads them twice more (dW einsum, dhidden matmul), plus a
separate full-vocab argmax pass for the accuracy metric — ~5.6 ms of the
trace at V=16000.  These kernels keep each position's logits tile entirely
in VMEM:

forward  (grid over N): logits_t = hid_t @ W + b  ->  emits per-step
    lse [B], label logit [B] (one-hot reduce, no gather) and argmax pred
    [B]; the masked-mean NLL and the accuracy are tiny [N,B] XLA ops on
    those streams.
backward (grid over N): recomputes the logits tile, forms
    dlogits = (softmax - onehot) * dnll in VMEM, emits dhid_t and
    accumulates dW / dbias in f32 VMEM scratch written out on the last
    step.  Full logits never touch HBM in either direction.

Math identical to measure.sparse_categorical_crossentropy (reference
speech_recognition/measure.py:4-21) composed with the feedforward Dense
(reference models/las.py:291); equivalence of loss, preds, and all three
gradients is tested in tests/test_pallas_decoder.py (interpret mode).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch


def ce_vocab_pallas_supported(hid, W) -> bool:
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("ce_vocab", reason, **kw)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    if hid.dtype != jnp.bfloat16:
        return decline(f"hidden dtype {hid.dtype} != bfloat16")
    N, B, H = hid.shape
    V = W.shape[-1]
    shards = batch_shards(B)  # multi-device: kernels run per data-shard
    if shards is None:
        return decline(f"batch {B} not shardable over the data mesh axis")
    Bl = shards[1]
    if Bl % 8 or H % 128 or V % 128:
        return decline(f"unaligned dims (local B {Bl} % 8, H {H} % 128, V {V} % 128)")
    # backward budget per kernel instance (the heavier direction): logits +
    # dlogits f32 tiles, resident W bf16, dW/db f32 scratch, per-step
    # hid/dhid blocks and the [B,128] stream blocks
    vmem = 2 * Bl * V * 4 + W.size * 2 + (H + 1) * V * 4 + 2 * Bl * H * 2 + 4 * Bl * 128 * 4
    if vmem > 72 * 2**20:
        return decline(f"backward VMEM estimate {vmem >> 20} MB > 72 MB budget")
    return True


def _fwd_kernel(refs):
    # per-step [B] vectors travel lane-replicated as [.,B,128] blocks
    # (lane-1 / sublane-1 blocks are not lowerable on TPU)
    hid_ref, y_ref, w_ref, b_ref, lse_ref, lab_ref, pred_ref = refs
    logits = (
        jnp.dot(hid_ref[0], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )  # [B, V] f32, VMEM only
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)) + m
    B, V = logits.shape
    lse_ref[0] = jnp.broadcast_to(lse, (B, 128))
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    y_col = jax.lax.slice_in_dim(y_ref[0], 0, 1, axis=1)  # [B,1] int32
    onehot = cols == y_col
    lab = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1, keepdims=True)
    lab_ref[0] = jnp.broadcast_to(lab, (B, 128))
    # first-argmax via min-index-at-max (jnp.argmax semantics; robust lowering)
    pred = jnp.min(jnp.where(logits == m, cols, V), axis=-1, keepdims=True).astype(jnp.int32)
    pred_ref[0] = jnp.broadcast_to(pred, (B, 128))


def _bwd_kernel(n_steps, refs):
    hid_ref, y_ref, lse_ref, dnll_ref, w_ref, b_ref, dhid_ref, dw_ref, db_ref, dw_scr, db_scr = refs
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
    lse_col = jax.lax.slice_in_dim(lse_ref[0], 0, 1, axis=1)  # [B,1]
    sm = jnp.exp(logits - lse_col)
    B, V = logits.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    y_col = jax.lax.slice_in_dim(y_ref[0], 0, 1, axis=1)
    onehot = (cols == y_col).astype(jnp.float32)
    dnll_col = jax.lax.slice_in_dim(dnll_ref[0], 0, 1, axis=1)
    dlog = (sm - onehot) * dnll_col  # [B, V] f32
    dlog_bf = dlog.astype(jnp.bfloat16)
    # dhid = dlog @ W^T  (contract the lane dim of both)
    dhid_ref[0] = jax.lax.dot_general(
        dlog_bf, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    # dW += hid^T @ dlog (contract the batch dim of both)
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        hid_t, dlog_bf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_scr[:] = db_scr[:] + jnp.sum(dlog, axis=0, keepdims=True)

    @pl.when(n == n_steps - 1)
    def _():
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


def _fwd_invoke(hid, y_rep, W, b2):
    # shapes derived INSIDE the (possibly shard_mapped) region: B is the
    # per-shard local batch under a multi-device mesh
    N, B, H = hid.shape
    V = W.shape[-1]
    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    step = lambda *bs: pl.BlockSpec((1,) + bs, lambda n: (n,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda *refs: _fwd_kernel(refs),
        grid=(N,),
        in_specs=[step(B, H), step(B, 128), const(H, V), const(1, V)],
        out_specs=[step(B, 128), step(B, 128), step(B, 128)],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, 128), jnp.float32),   # lse
            jax.ShapeDtypeStruct((N, B, 128), jnp.float32),   # label logit
            jax.ShapeDtypeStruct((N, B, 128), jnp.int32),     # argmax pred
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 2**20
        ),
    )(hid, y_rep, W, b2)


def _call_fwd(hid, y, W, b):
    N, B, H = hid.shape
    V = W.shape[-1]
    y_rep = jnp.broadcast_to(y[:, :, None], (N, B, 128))
    lse, lab, pred = shard_over_batch(
        _fwd_invoke,
        (hid, y_rep, W, b.reshape(1, V)),
        in_dims=(1, 1, None, None),
        out_specs=(bspec(1, 3), bspec(1, 3), bspec(1, 3)),
    )
    return lse[..., 0], lab[..., 0], pred[..., 0]


def _bwd_invoke(hid, y_rep, lse_rep, dnll_rep, W, b2):
    N, B, H = hid.shape
    V = W.shape[-1]
    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    step = lambda *bs: pl.BlockSpec((1,) + bs, lambda n: (n,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda *refs: _bwd_kernel(N, refs),
        grid=(N,),
        in_specs=[step(B, H), step(B, 128), step(B, 128), step(B, 128), const(H, V), const(1, V)],
        out_specs=[step(B, H), const(H, V), const(1, V)],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, H), hid.dtype),  # dhid
            jax.ShapeDtypeStruct((H, V), jnp.float32),   # dW
            jax.ShapeDtypeStruct((1, V), jnp.float32),   # dbias
        ],
        scratch_shapes=[
            pltpu.VMEM((H, V), jnp.float32),
            pltpu.VMEM((1, V), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 2**20
        ),
    )(hid, y_rep, lse_rep, dnll_rep, W, b2)


def _call_bwd(hid, y, lse, dnll, W, b):
    N, B, H = hid.shape
    V = W.shape[-1]
    y_rep = jnp.broadcast_to(y[:, :, None], (N, B, 128))
    lse_rep = jnp.broadcast_to(lse[:, :, None], (N, B, 128))
    dnll_rep = jnp.broadcast_to(dnll[:, :, None], (N, B, 128))
    # each shard contributes a partial dW/db over its local batch -> psum
    return shard_over_batch(
        _bwd_invoke,
        (hid, y_rep, lse_rep, dnll_rep, W, b.reshape(1, V)),
        in_dims=(1, 1, 1, 1, None, None),
        out_specs=(bspec(1, 3), bspec(None, 2), bspec(None, 2)),
        psum_out=(1, 2),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_ce_vocab(hid, W, b, y_true, ignore_index: int = 0):
    """Masked-mean CE of (hid @ W + b) against y_true, plus argmax preds.

    hid [N,B,H] bf16, W [H,V], b [V], y_true [N,B] int.
    Returns (loss scalar f32, preds [N,B] int32).  preds carry no gradient.
    """
    loss, preds, _res = _fused_fwd_impl(hid, W, b, y_true, ignore_index)
    return loss, preds


def _fused_fwd_impl(hid, W, b, y_true, ignore_index):
    y = y_true.astype(jnp.int32)
    lse, lab, preds = _call_fwd(hid, y, W.astype(hid.dtype), b.astype(hid.dtype))
    mask = (y != ignore_index).astype(jnp.float32)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum((lse - lab) * mask) / count
    return loss, preds, (lse, mask, count)


def _fused_fwd(hid, W, b, y_true, ignore_index):
    loss, preds, (lse, mask, count) = _fused_fwd_impl(hid, W, b, y_true, ignore_index)
    return (loss, preds), (hid, W, b, y_true, lse, mask, count)


def _fused_bwd(ignore_index, residuals, cotangents):
    dloss, _dpreds = cotangents
    hid, W, b, y_true, lse, mask, count = residuals
    dnll = (dloss * mask / count).astype(jnp.float32)  # [N,B]
    dhid, dW, db = _call_bwd(
        hid, y_true.astype(jnp.int32), lse, dnll, W.astype(hid.dtype), b.astype(hid.dtype)
    )
    import numpy as np

    dy = np.zeros(y_true.shape, jax.dtypes.float0)
    return dhid, dW.astype(W.dtype), db[0].astype(b.dtype), dy


fused_ce_vocab.defvjp(_fused_fwd, _fused_bwd)
