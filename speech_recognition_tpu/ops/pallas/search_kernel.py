"""Pallas TPU mega-kernel for LAS greedy search (the serving hot path).

Motivation: the XLA greedy decoder (search.py ``_greedy_impl``) is a
``lax.while_loop`` whose every step re-streams the attention operands from
HBM — projected keys pk [B,S,H] (~17 MB bf16), listener values [B,S,Dv]
(~33 MB), the vocab projection [H,V] (~8 MB) and the embedding table
[V,He] (~8 MB) — ~65 MB x 127 steps ≈ 8 GB of HBM traffic per decoded
batch, plus per-step while-loop latency.  This kernel runs the WHOLE
greedy decode as one pallas_call with a grid over steps: all of those
operands live in VMEM blocks with constant index maps (Mosaic loads them
once and keeps them resident — ~55 MB of the v5e's 128 MB VMEM at bench
shapes), and the argmax feedback happens in-kernel, so per-step HBM
traffic drops to two tiny [B,128] output streams.

Decode semantics are exactly search.py ``_greedy_impl`` (reference
speech_recognition/search.py:23-81): embed previous token, dot-product
attention over the listener output, the threaded LSTM cell stack with
pad-token state gating (reference models/las.py:285-288), vocab
projection, log-softmax top-1, pad-after-EOS feedback, and per-step
top-logP accumulation gated on not-yet-ended.  The vocab logits are
rounded to bf16 before the argmax to mirror the XLA path's bf16 Dense
output; both paths then break ties by first index.  Individual logits can
still differ by one bf16 ULP from Mosaic-vs-XLA accumulation order, so
tokens whose top-2 gap is at the bf16 resolution limit may flip (measured:
random-init model, near-uniform 16K-vocab logits → ~9% token flips, every
one an exact-tie flip; a peaked-logits model decodes identically —
tools/search_ab.py checks both).  The only behavioral
difference: the while_loop exits early once every sequence hit EOS; the
kernel always runs max_token_length-1 steps (a Pallas grid cannot
early-exit).  Outputs are identical because post-EOS steps feed the pad
token, which freezes states and emits pads.

The grid cannot early-exit, and finished-batch steps still pay the full
attention+vocab math — for short utterances in small batches the XLA
while_loop can win; the gate is shape-based only, and SRT_PALLAS_SEARCH=0
reverts to the XLA path.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_kernel import DEFAULT_CHUNK
from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch


def greedy_pallas_supported(pk, value, emb_table, vocab_w, kernels, rnn_type: str) -> bool:
    """Shape/dtype gate mirroring decoder_pallas_supported, plus the
    resident embedding table / vocab projection and the [B,V] logits and
    one-hot temporaries this kernel additionally keeps in VMEM."""
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("greedy_search", reason, **kw)
    if os.environ.get("SRT_PALLAS_SEARCH", "1") != "1":
        return decline("disabled via SRT_PALLAS_SEARCH=0", loud=False)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    if rnn_type != "lstm":
        return decline(f"rnn type {rnn_type!r} != lstm")
    if pk.dtype != jnp.bfloat16:
        return decline(f"projected-key dtype {pk.dtype} != bfloat16")
    B, S, H = pk.shape
    Dv = value.shape[-1]
    V, He = emb_table.shape
    shards = batch_shards(B)
    if shards is None:
        return decline(f"batch {B} not shardable over the data mesh axis")
    d, Bl = shards
    if Bl % 16 or H % 128 or He % 128 or Dv % 128 or V % 128:
        return decline(
            f"unaligned dims (local B {Bl} % 16, H {H} / emb {He} / value {Dv} / V {V} % 128)"
        )
    resident = (pk.size + value.size) * 2 // d + pk.size * 4 // (d * H)  # pk/value + f32 bias
    resident += (V * He + H * V) * 2 + V * 4  # embedding + vocab W (bf16) + vocab bias f32
    in_dim = He + Dv
    for k in kernels:
        resident += (k.size + k.shape[-1] * (H + 1)) * 2
        in_dim = H
    resident += H * H * 2 + 2 * Bl * H * 4  # qw + f32 h/c scratch
    resident += Bl * V * 2 + Bl * 128 * 4  # one-hot scratch + ended scratch
    resident += 2 * Bl * V * 4  # logits f32 + iota temporaries
    if resident > 100 * 2**20:
        return decline(f"VMEM estimate {resident >> 20} MB > 100 MB budget")
    return True


def _greedy_kernel(n_cells, chunk, bos_id, eos_id, pad_id, refs):
    n_in = 10 + 3 * n_cells
    (
        pk_ref, value_ref, bias_ref, qw_ref, qb_ref, emb_ref, vw_ref, vb_ref,
        *rest,
    ) = refs[:n_in]
    cell_refs = rest[: 3 * n_cells]
    k_refs = cell_refs[0::3]
    r_refs = cell_refs[1::3]
    b_refs = cell_refs[2::3]
    h0_ref, c0_ref = rest[3 * n_cells:]
    tok_ref, logp_ref = refs[n_in:n_in + 2]
    h_scr, c_scr, oh_scr, end_scr = refs[n_in + 2:]

    n = pl.program_id(0)
    B, H = h0_ref.shape
    S = value_ref.shape[1]
    Dv = value_ref.shape[2]
    V = emb_ref.shape[0]

    @pl.when(n == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        end_scr[:] = jnp.zeros_like(end_scr)
        cols0 = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        oh_scr[:] = (cols0 == bos_id).astype(jnp.bfloat16)

    h = h_scr[:]
    c = c_scr[:]
    onehot = oh_scr[:]
    ended = jax.lax.slice_in_dim(end_scr[:], 0, 1, axis=1)  # [B,1] f32

    # ---- embed previous token (one-hot matmul — Mosaic has no vector gather)
    emb = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # pad-token state gating (reference models/las.py:279): m = prev != pad
    m = 1.0 - jax.lax.slice_in_dim(onehot, pad_id, pad_id + 1, axis=1).astype(jnp.float32)

    # ---- attention (identical to decoder_kernel._fwd_kernel)
    h_bf = h.astype(jnp.bfloat16)
    q = jnp.dot(h_bf, qw_ref[:], preferred_element_type=jnp.float32) + qb_ref[:].astype(jnp.float32)
    q3 = jnp.expand_dims(q, 1)
    scores = jnp.concatenate(
        [jnp.sum(q3 * pk_ref[:, sc:sc + chunk, :], axis=2) for sc in range(0, S, chunk)],
        axis=1,
    )
    scores = scores + bias_ref[:]
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.zeros((B, Dv), jnp.float32)
    for sc in range(0, S, chunk):
        p_chunk = jnp.expand_dims(jax.lax.slice_in_dim(probs, sc, sc + chunk, axis=1), 2)
        ctx = ctx + jnp.sum(p_chunk * value_ref[:, sc:sc + chunk, :], axis=1)

    # ---- threaded cell stack (reference models/las.py:285-288, no dropout)
    x = jnp.concatenate([emb, ctx.astype(jnp.bfloat16)], axis=-1)
    for i in range(n_cells):
        z = (
            jnp.dot(x, k_refs[i][:], preferred_element_type=jnp.float32)
            + b_refs[i][:].astype(jnp.float32)
            + jnp.dot(h.astype(jnp.bfloat16), r_refs[i][:], preferred_element_type=jnp.float32)
        )
        gi = jax.nn.sigmoid(z[:, :H])
        gf = jax.nn.sigmoid(z[:, H:2 * H])
        gg = jnp.tanh(z[:, 2 * H:3 * H])
        go = jax.nn.sigmoid(z[:, 3 * H:])
        c_p = gf * c + gi * gg
        h_p = go * jnp.tanh(c_p)
        h = m * h_p + (1.0 - m) * h
        c = m * c_p + (1.0 - m) * c
        x = (h_p * m).astype(jnp.bfloat16)

    # ---- vocab projection + log-softmax top-1.  Round to bf16 first: the
    # XLA path's Dense emits bf16 logits, so both paths argmax over
    # identical values (ties then break identically by first index).
    logits = (
        jnp.dot(x, vw_ref[:], preferred_element_type=jnp.float32)
        + vb_ref[:].astype(jnp.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True)) + mx
    top_logp = mx - lse  # [B,1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    pred = jnp.min(jnp.where(logits == mx, cols, V), axis=-1, keepdims=True).astype(jnp.int32)

    # ---- EOS bookkeeping (search.py:77-82): pad after EOS, logp frozen
    new_tok = jnp.where(ended > 0.0, pad_id, pred)
    step_logp = jnp.where(ended > 0.0, 0.0, top_logp)
    ended_new = jnp.maximum(ended, (new_tok == eos_id).astype(jnp.float32))

    tok_ref[0] = jnp.broadcast_to(new_tok, (B, 128))
    logp_ref[0] = jnp.broadcast_to(step_logp, (B, 128))
    oh_scr[:] = (cols == new_tok).astype(jnp.bfloat16)
    end_scr[:] = jnp.broadcast_to(ended_new, (B, 128))
    h_scr[:] = h
    c_scr[:] = c


def _greedy_invoke(n_cells, n_steps, chunk, bos_id, eos_id, pad_id, *operands):
    pk = operands[0]
    B, S, H = pk.shape
    Dv = operands[1].shape[-1]
    V, He = operands[5].shape

    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    step3 = lambda d: pl.BlockSpec((1, B, d), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [
        const(B, S, H),   # pk
        const(B, S, Dv),  # value
        const(B, S),      # attn bias (f32)
        const(H, H),      # qw
        const(1, H),      # qb
        const(V, He),     # embedding table
        const(H, V),      # vocab W
        const(1, V),      # vocab b
    ]
    for _ in range(n_cells):
        in_specs += [const(operands[len(in_specs)].shape[0], 4 * H), const(H, 4 * H), const(1, 4 * H)]
    in_specs += [const(B, H), const(B, H)]  # h0, c0

    out_shape = [
        jax.ShapeDtypeStruct((n_steps, B, 128), jnp.int32),    # tokens
        jax.ShapeDtypeStruct((n_steps, B, 128), jnp.float32),  # gated top-logp
    ]
    out_specs = [step3(128), step3(128)]

    kernel = functools.partial(_greedy_kernel, n_cells, chunk, bos_id, eos_id, pad_id)
    return pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),   # h carry
            pltpu.VMEM((B, H), jnp.float32),   # c carry
            pltpu.VMEM((B, V), jnp.bfloat16),  # prev-token one-hot
            pltpu.VMEM((B, 128), jnp.float32),  # ended flag
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 2**20,
        ),
    )(*operands)


def greedy_search_pallas(
    pk, value, attn_mask, qw, qb, emb_table, vocab_w, vocab_b,
    kernels, rkernels, biases, h0, c0,
    max_token_length: int, bos_id: int, eos_id: int, pad_id: int = 0,
    chunk: int = DEFAULT_CHUNK,
):
    """Full greedy decode in one Pallas kernel.

    :param pk: [B,S,H] bf16 projected keys; value: [B,S,Dv] listener output
    :param attn_mask: [B,S] bool attention mask
    :param emb_table: [V,He] embedding table (bf16)
    :param vocab_w/vocab_b: [H,V]/[V] vocab projection (bf16)
    :param kernels/rkernels/biases: per-cell LSTM params (bf16)
    :return: (tokens [B, max_token_length] int32, perplexity [B] f32) —
        identical to search.LASSearcher._greedy_impl.
    """
    B, S, H = pk.shape
    L = max_token_length
    n_cells = len(kernels)
    n_steps = L - 1

    attn_bias = -1e9 * (1.0 - attn_mask.astype(jnp.float32))
    S_pad = -(-S // chunk) * chunk
    if S_pad != S:
        pk = jnp.pad(pk, ((0, 0), (0, S_pad - S), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, S_pad - S), (0, 0)))
        attn_bias = jnp.pad(attn_bias, ((0, 0), (0, S_pad - S)), constant_values=-1e9)

    operands = [pk, value, attn_bias, qw, qb.reshape(1, H), emb_table,
                vocab_w, vocab_b.reshape(1, -1)]
    in_dims = [0, 0, 0, None, None, None, None, None]
    for i in range(n_cells):
        operands += [kernels[i], rkernels[i], biases[i].reshape(1, 4 * H)]
        in_dims += [None, None, None]
    operands += [h0, c0]
    in_dims += [0, 0]

    toks, logps = shard_over_batch(
        functools.partial(_greedy_invoke, n_cells, n_steps, chunk, bos_id, eos_id, pad_id),
        tuple(operands), in_dims, (bspec(1, 3), bspec(1, 3)),
    )
    tok_stream = toks[:, :, 0]   # [n_steps, B]
    logp = jnp.sum(logps[:, :, 0], axis=0)  # [B]

    tokens = jnp.concatenate(
        [jnp.full((B, 1), bos_id, jnp.int32), jnp.swapaxes(tok_stream, 0, 1)], axis=1
    )  # [B, L]
    is_eos = tokens == eos_id
    seq_lens = jnp.where(
        jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1).astype(jnp.int32) + 1, L
    )
    perplexity = jnp.exp(logp) ** (-1.0 / seq_lens.astype(jnp.float32))
    return tokens, perplexity
