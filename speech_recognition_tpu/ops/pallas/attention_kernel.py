"""Fused multi-head self-attention as a Pallas kernel pair (Conformer MHSA).

Under XLA, each Conformer block's attention materializes the [B, H, T, T]
f32 score tensor in HBM and walks it repeatedly: scale+mask write, softmax
max/exp/sum passes, the bf16 cast, a threefry bit-stream the size of the
probs for dropout, and the same again (transposed) in the backward.  At
bench shapes that is ~134 MB of f32 scores per layer per direction — pure
HBM bandwidth with almost no MXU work attached.

These kernels keep one example's entire attention resident in VMEM
(T<=512, so scores for all H heads are a few hundred KB):

forward  (grid over B): per head h, scores = (q_h @ k_h^T) * scale + bias,
    f32 softmax, optional in-kernel dropout from a counter-based position
    hash (see _keep_mask; seeded per (example, head) so the backward
    regenerates the identical mask), then ctx_h = probs @ v_h — all in
    VMEM; only q/k/v stream in and ctx streams out.
backward (grid over B): recomputes scores/probs per head (flash-attention
    style — nothing but the fwd inputs is saved), regenerates the dropout
    mask from the same seeds, and emits dq/dk/dv via the standard softmax
    VJP.  The [T, T] intermediates never touch HBM in either direction.

Heads are packed on the lane axis (operands are [B, T, H*d]); per-head
slices are static 64-lane-aligned windows, so no transpose of the
[B, T, 3, H, d] QKV projection output is ever materialized.

Math identical to models/conformer.py MHSA (scores/sqrt(d), key-mask bias,
f32 softmax, bf16 probs @ v) — equivalence of outputs and all gradients vs
the XLA path is pinned in tests/test_pallas_attention.py (interpret mode).
Dropout deviation, by design: the plain path draws a threefry mask via
nn.Dropout while the kernel draws from the counter-based hash — identical
Bernoulli(1-p)/(1-p) semantics, different streams (same situation as the
fused-frontend SpecAugment masks).  Dropout is applied to the f32 probs
before the bf16 cast (the plain path casts first); at p=0 the paths agree
to bf16 rounding.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch

NEG_INF = -1e9


def fused_mhsa_supported(B, T, D, num_heads, dtype) -> bool:
    """Shapes the kernel pair handles well: tile-aligned T/D, 64-lane-aligned
    head width, batch layable over the data mesh axis, VMEM headroom for the
    per-example blocks plus the [T, T] f32 intermediates."""
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("fused_mhsa", reason, **kw)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    if dtype not in (jnp.bfloat16, jnp.float32):
        return decline(f"dtype {dtype} not in (bfloat16, float32)")
    if D % num_heads:
        return decline(f"model dim {D} % heads {num_heads}")
    d = D // num_heads
    if T % 128 or D % 128 or d % 64:
        return decline(f"unaligned dims (T {T} % 128, D {D} % 128, head dim {d} % 64)")
    shards = batch_shards(B)
    if shards is None:
        return decline(f"batch {B} not shardable over the data mesh axis")
    itemsize = jnp.dtype(dtype).itemsize
    # 5 [T, D] operand blocks (x2 buffering), bias, ~6 [T, T] f32 live values
    vmem = 5 * 2 * T * D * itemsize + 8 * T * 4 + 6 * T * T * 4
    if vmem > 72 * 2**20:
        return decline(f"VMEM estimate {vmem >> 20} MB > 72 MB budget")
    return True


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _keep_mask(seed, h, shape, p_drop):
    """Bernoulli(1-p) keep mask, a pure function of (seed, head, position).

    Counter-based (murmur3-fmix32-style avalanche of the element's (row,
    col) iota coordinates): the value at each position is layout- and
    kernel-independent, so the backward kernel regenerates the forward's
    mask *by construction*.  The TPU hardware PRNG (pltpu.prng_random_bits)
    explicitly does NOT give that guarantee — measured on-chip: seeded
    identically, the fwd and bwd kernels received differently-placed bit
    streams (their [T, T] tilings differ), which broke the FD-vs-VJP check
    in tools/attention_onchip_check.py.  All ops are plain int32 (wrapping)
    arithmetic, so the same masks fall out under CPU interpret mode too.
    Shifts are ARITHMETIC on int32 — every shift is &-masked back to the
    intended logical bits."""
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    c = lambda v: jnp.int32(v - (1 << 32) if v >= (1 << 31) else v)  # two's complement
    x = seed * c(0x9E3779B1) + h * c(0x85EBCA6B) + i * c(0xC2B2AE35) + j * c(0x27D4EB2F)
    x = x ^ ((x >> 16) & 0xFFFF)
    x = x * c(0x85EBCA6B)
    x = x ^ ((x >> 13) & 0x7FFFF)
    x = x * c(0xC2B2AE35)
    x = x ^ ((x >> 16) & 0xFFFF)
    # low 24 bits -> uniform [0, 1) at f32 precision
    u = (x & 0x00FFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    return u >= p_drop


def _fwd_kernel(num_heads, scale, p_drop, *refs):
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref = refs
    q, k, v = q_ref[0], k_ref[0], v_ref[0]  # [T, D]
    bias = bias_ref[0][0:1, :]  # [1, T] f32, broadcasts over query rows
    seed = seed_ref[pl.program_id(0)]
    T, D = q.shape
    d = D // num_heads
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = _softmax_rows(s)
        if p_drop > 0.0:
            keep = _keep_mask(seed, h, (T, T), p_drop)
            p = jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0)
        o_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(num_heads, scale, p_drop, *refs):
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    bias = bias_ref[0][0:1, :]
    seed = seed_ref[pl.program_id(0)]
    T, D = q.shape
    d = D // num_heads
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        doh = do[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = _softmax_rows(s)  # pre-dropout probs, f32
        if p_drop > 0.0:
            keep = _keep_mask(seed, h, (T, T), p_drop)
            inv = 1.0 / (1.0 - p_drop)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p
        # dv = pd^T @ do  (contract query rows)
        dv_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            pd.astype(do.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # dp = do @ v^T, back through dropout, then the softmax VJP
        dpd = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jnp.where(keep, dpd * inv, 0.0) if p_drop > 0.0 else dpd
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(q.dtype)
        dq_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


def _specs(T, D):
    blk = lambda *bs: pl.BlockSpec((1,) + bs, lambda b: (b,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    # the whole (local) seeds vector rides along in SMEM; rank-1 blocks of
    # size 1 are not lowerable, so each grid step indexes by program_id
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return seed, blk(T, D), blk(8, T)


def _fwd_invoke(num_heads, scale, p_drop, seeds, q, k, v, bias_rep):
    B, T, D = q.shape
    seed_spec, op_spec, bias_spec = _specs(T, D)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads, scale, p_drop),
        grid=(B,),
        in_specs=[seed_spec, op_spec, op_spec, op_spec, bias_spec],
        out_specs=op_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 2**20
        ),
    )(seeds, q, k, v, bias_rep)
    return (out,)  # shard_over_batch expects a tuple of outputs


def _bwd_invoke(num_heads, scale, p_drop, seeds, q, k, v, bias_rep, do):
    B, T, D = q.shape
    seed_spec, op_spec, bias_spec = _specs(T, D)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, scale, p_drop),
        grid=(B,),
        in_specs=[seed_spec, op_spec, op_spec, op_spec, bias_spec, op_spec],
        out_specs=[op_spec, op_spec, op_spec],
        out_shape=[jax.ShapeDtypeStruct((B, T, D), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 2**20
        ),
    )(seeds, q, k, v, bias_rep, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_mhsa(q, k, v, bias, seeds, num_heads, scale, dropout_p=0.0):
    """ctx = dropout(softmax(q @ k^T * scale + bias)) @ v, per packed head.

    q/k/v/ctx [B, T, H*d] (heads on lanes), bias [B, T] f32 additive key
    bias (0 valid / -1e9 pad; treated as a non-differentiable constant),
    seeds [B] int32 per-example dropout seeds (ignored when dropout_p=0).
    """
    return _fused_fwd(q, k, v, bias, seeds, num_heads, scale, dropout_p)[0]


def _call(invoke, num_heads, scale, p_drop, seeds, q, k, v, bias, extra=()):
    B, T, D = q.shape
    bias_rep = jnp.broadcast_to(bias.astype(jnp.float32)[:, None, :], (B, 8, T))
    fn = functools.partial(invoke, num_heads, scale, p_drop)
    n_out = 3 if extra else 1
    return shard_over_batch(
        fn,
        (seeds.astype(jnp.int32), q, k, v, bias_rep) + tuple(extra),
        in_dims=(0,) * (5 + len(extra)),
        out_specs=(bspec(0, 3),) * n_out,
    )


def _fused_fwd(q, k, v, bias, seeds, num_heads, scale, dropout_p):
    (ctx,) = _call(_fwd_invoke, num_heads, scale, dropout_p, seeds, q, k, v, bias)
    return ctx, (q, k, v, bias, seeds)


def _fused_bwd(num_heads, scale, dropout_p, residuals, dctx):
    q, k, v, bias, seeds = residuals
    dq, dk, dv = _call(
        _bwd_invoke, num_heads, scale, dropout_p, seeds, q, k, v, bias,
        extra=(dctx.astype(q.dtype),),
    )
    dseeds = np.zeros(seeds.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseeds


fused_mhsa.defvjp(_fused_fwd, _fused_bwd)
