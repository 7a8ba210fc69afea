"""Pallas TPU mega-kernel for LAS beam search (the serving hot path).

The XLA beam decoder (search.py ``_beam_impl``) is a ``lax.while_loop``
whose body — even with the untiled attention layout and the fused vocab
top-k pallas_call — still splits each step into ~15 small XLA fusions plus
a kernel dispatch.  At bench shapes (B=128, beam=8, S=256, L=128) the loop
costs ~0.42 ms/step of device busy time plus a comparable amount of
inter-fusion stall, ~53 ms of the ~65 ms device decode (measured,
tools/profile_beam.py).  This kernel runs the WHOLE beam loop as one
pallas_call with a grid over decode steps: projected keys, listener
values, embedding table, vocab projection and cell weights stay
VMEM-resident (constant index maps), and every per-step stage — embedding
one-hot matmul, K-query attention, the threaded LSTM stack, the
bf16-rounded vocab projection + streaming top-K + logsumexp
(topk_kernel.streaming_vocab_topk), the length-penalty score top-K over
the K*K candidates, and the beam re-gather of token histories / log-probs
— happens in-kernel with no HBM traffic beyond the tiny final outputs.

Semantics are exactly search.py ``_beam_impl`` (reference
speech_recognition/search.py:83-209):

- the first decode step from BOS (beam initialization) stays in XLA; the
  kernel starts at step 2 from the given per-beam tokens/log-probs/states;
- score = cumulative logP x length_penalty ((1+len)/(1+beta))**alpha with
  len = first-EOS position + 1 for finished beams else current length
  (reference search.py:106-116, 161-164);
- finished parents contribute step_lp = 0 and extend with the pad token;
- candidate selection = topk_inloop tie order (max, then MINIMUM flat
  index among equals) over the [B, K*K] score matrix;
- token histories and log-probs are re-gathered by the selected parent
  beam; decoder states are NOT re-gathered — the reference's while_loop
  re-gathers only decoder_input and log_perplexity (reference
  search.py:166-180), so each slot's state evolves from its own previous
  hypothesis.  Beam-decode parity vs the reference checkpoints is pinned
  in tests/test_model_parity.py::test_las_beam_decode_parity.

Internally rows are K-MAJOR (row = k*B + b) so each beam's [B, H] slab is
a contiguous sublane block: attention loops K slabs over ONE copy of
pk/value, and the score stage's [B, K] blocks are static slab slices.
The public API takes the XLA path's beam-major [B*K, ...] layout and
converts per shard.

The grid cannot early-exit; once every beam of every row has ended, extra
steps are exact no-ops (scores freeze, selection is stable-identity, pads
are rewritten), matching the XLA loop's early exit — see
tests/test_pallas_beam.py.  The bf16/ULP caveats of the greedy kernel
apply unchanged (search_kernel.py docstring): random-init near-tie logits
may flip vs the XLA path; the kernel matches the FUSED top-k path's
arithmetic (round_bf16) and is pinned exactly against it in interpret
mode.  SRT_PALLAS_BEAM=0 reverts to the XLA loop.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_kernel import DEFAULT_CHUNK
from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch
from .topk_kernel import _NEG, _vocab_chunk, streaming_vocab_topk


def beam_pallas_supported(pk, value, emb_table, vocab_w, kernels, rnn_type: str,
                          beam_size: int, max_token_length: int) -> bool:
    """Shape/dtype gate mirroring greedy_pallas_supported plus the beam
    constraints (K*K candidate lanes, VMEM for the K-fold row count).

    Default OFF until the on-chip A/B (tools/beam_ab.py) validates the
    Mosaic lowering on the real chip — flip with SRT_PALLAS_BEAM=1."""
    if os.environ.get("SRT_PALLAS_BEAM", "0") != "1":
        return False  # default-off experiment: silence is the contract
    # opted in explicitly — any decline below is loud
    from .fallback import report_fallback

    decline = lambda reason: report_fallback("beam_mega_kernel", reason)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)")
    if rnn_type != "lstm":
        return decline(f"rnn type {rnn_type!r} != lstm")
    if pk.dtype != jnp.bfloat16:
        return decline(f"projected-key dtype {pk.dtype} != bfloat16")
    B, S, H = pk.shape
    Dv = value.shape[-1]
    V, He = emb_table.shape
    K = beam_size
    shards = batch_shards(B)
    if shards is None:
        return decline(f"batch {B} not shardable over the data mesh axis")
    d, Bl = shards
    if Bl % 16 or H % 128 or He % 128 or Dv % 128 or V % 128:
        return decline(
            f"unaligned dims (local B {Bl} % 16, H {H} / emb {He} / value {Dv} / V {V} % 128)"
        )
    Vc = _vocab_chunk(V)
    if Vc == 0 or not 2 <= K <= 11 or K * K > 128 or max_token_length < 3:
        return decline(
            f"beam constraints (V chunk {Vc}, K {K} in [2,11], K*K <= 128, max len {max_token_length} >= 3)"
        )
    R = K * Bl
    Lp = -(-max_token_length // 128) * 128
    resident = (
        (Bl * S * (H + Dv)) * 2          # pk + value
        + Bl * S * 4                      # attention bias f32
        + (V * (He + H)) * 2              # embedding table + vocab projection
        + sum(k.size + H * 4 * H + 4 * H for k in kernels) * 2  # cells
        + H * H * 2                       # qw
        + 2 * R * H * 4                   # h/c f32 scratch
        + 2 * K * Bl * Lp * 4             # history scratch + out
        + R * 128 * 4                     # last-token scratch
        + 2 * R * Vc * 4 + R * Vc * 2     # logits tile (+phaseB cands) + one-hot
        + (2 * K + 4) * R * 128 * 4       # top-k register planes
        + R * Dv * 4 + K * Bl * S * 4     # ctx + probs transients
    )
    if resident > 110 * 2**20:
        return decline(f"VMEM estimate {resident >> 20} MB > 110 MB budget")
    return True


def _beam_step_math(n_cells, K, V, Vc, chunk, eos_id, pad_id, alpha, beta,
                    pk_ref, value_ref, bias_ref, qw_ref, qb_ref, emb_ref,
                    vw_ref, vb_ref, k_refs, r_refs, b_refs,
                    h, c, hist, last, logp, ended, eoslen, step):
    """One beam step as pure array math, shared between the Pallas kernel
    (args are VMEM refs — indexing yields arrays) and the plain-jnp
    ``beam_loop_reference`` oracle the interpret-mode tests pin against.

    :param h/c: [K*B, H] f32 k-major decoder states
    :param hist: [K, B, Lp] f32 token histories
    :param last: [K*B, 1] f32 previous tokens; logp/ended/eoslen [B, K] f32
    :param step: i32 scalar decode position being written
    :return: (h, c, new_hist [K,B,Lp], new_last [K*B,1],
        new_logp/new_ended/new_eoslen [B, K])
    """
    B = pk_ref.shape[0]
    S = value_ref.shape[1]
    Dv = value_ref.shape[2]
    He = emb_ref.shape[1]
    R = K * B
    Lp = hist.shape[2]
    K2 = K * K
    m = (last != float(pad_id)).astype(jnp.float32)  # pad-token state gate

    # ---- embed previous token: chunked one-hot matmul over the vocab
    cols_c = jax.lax.broadcasted_iota(jnp.int32, (R, Vc), 1).astype(jnp.float32)
    emb_acc = jnp.zeros((R, He), jnp.float32)
    for ci in range(V // Vc):
        onehot = (cols_c + float(ci * Vc) == last).astype(jnp.bfloat16)
        emb_acc = emb_acc + jnp.dot(
            onehot, emb_ref[ci * Vc:(ci + 1) * Vc, :], preferred_element_type=jnp.float32
        )
    emb = emb_acc.astype(jnp.bfloat16)  # exact table rows

    # ---- K-query attention over ONE copy of pk/value (models/las.py
    # step_beam); per-slab math identical to search_kernel._greedy_kernel
    h_bf = h.astype(jnp.bfloat16)
    q = jnp.dot(h_bf, qw_ref[:], preferred_element_type=jnp.float32) + qb_ref[:].astype(jnp.float32)
    ctx_slabs = []
    for k in range(K):
        q3 = jnp.expand_dims(jax.lax.slice_in_dim(q, k * B, (k + 1) * B, axis=0), 1)
        scores = jnp.concatenate(
            [jnp.sum(q3 * pk_ref[:, sc:sc + chunk, :], axis=2) for sc in range(0, S, chunk)],
            axis=1,
        )
        probs = jax.nn.softmax(scores + bias_ref[:], axis=-1)
        ctx_k = jnp.zeros((B, Dv), jnp.float32)
        for sc in range(0, S, chunk):
            p_chunk = jnp.expand_dims(jax.lax.slice_in_dim(probs, sc, sc + chunk, axis=1), 2)
            ctx_k = ctx_k + jnp.sum(p_chunk * value_ref[:, sc:sc + chunk, :], axis=1)
        ctx_slabs.append(ctx_k)
    ctx = jnp.concatenate(ctx_slabs, axis=0)  # [R, Dv]

    # ---- threaded cell stack (reference las.py:285-288, no dropout)
    x = jnp.concatenate([emb, ctx.astype(jnp.bfloat16)], axis=-1)
    H = h.shape[-1]
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

    # ---- vocab projection + top-K + logsumexp (shared streaming body)
    top_raw, cand_idx, lse = streaming_vocab_topk(x, vw_ref, vb_ref, V, Vc, K)
    step_lp_rows = top_raw - lse  # [R, K]

    # ---- score the K*K candidates per batch row (search.py body)
    step_f = step.astype(jnp.float32)
    # first-EOS+1 for finished beams, current length (step+1) otherwise
    eos_len = jnp.where(ended > 0.0, eoslen, step_f + 1.0)
    penalty = ((1.0 + eos_len) / (1.0 + float(beta))) ** alpha  # [B, K]

    lp_blocks, score_blocks, tok_blocks = [], [], []
    for k in range(K):
        lp_k = jax.lax.slice_in_dim(step_lp_rows, k * B, (k + 1) * B, axis=0)  # [B, K]
        lp_k = jnp.where(
            jax.lax.slice_in_dim(ended, k, k + 1, axis=1) > 0.0, 0.0, lp_k
        )
        cand_lp_k = jax.lax.slice_in_dim(logp, k, k + 1, axis=1) + lp_k
        pen_k = jax.lax.slice_in_dim(penalty, k, k + 1, axis=1)
        lp_blocks.append(cand_lp_k)
        score_blocks.append(cand_lp_k * pen_k)
        tok_blocks.append(
            jax.lax.slice_in_dim(cand_idx, k * B, (k + 1) * B, axis=0).astype(jnp.float32)
        )
    cand_logp = jnp.concatenate(lp_blocks, axis=1)   # [B, K*K] parent-major
    scores = jnp.concatenate(score_blocks, axis=1)   # [B, K*K]
    cand_tok = jnp.concatenate(tok_blocks, axis=1)   # [B, K*K] f32 token ids

    # ---- top-K selection, topk_inloop tie order (min flat index)
    flat_iota = jax.lax.broadcasted_iota(jnp.int32, (B, K2), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    sels = []
    sc = scores
    for _ in range(K):
        mx = jnp.max(sc, axis=-1, keepdims=True)
        sel = jnp.min(jnp.where(sc == mx, flat_iota, K2), axis=-1, keepdims=True)
        sels.append(sel)
        sc = jnp.where(flat_iota == sel, _NEG, sc)

    # ---- re-gather histories/log-probs by selected parent; write new token
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)
    new_hist, new_tok, new_logp, new_ended, new_eoslen = [], [], [], [], []
    for j in range(K):
        sel_j = sels[j]                                   # [B,1] flat index
        oh_flat = (flat_iota == sel_j).astype(jnp.float32)  # [B, K2]
        p_j = sel_j // K
        oh_parent = (k_iota == p_j).astype(jnp.float32)     # [B, K]
        tok_j = jnp.sum(oh_flat * cand_tok, axis=-1, keepdims=True)
        logp_j = jnp.sum(oh_flat * cand_logp, axis=-1, keepdims=True)
        ended_j = jnp.sum(oh_parent * ended, axis=-1, keepdims=True)
        eoslen_j = jnp.sum(oh_parent * eoslen, axis=-1, keepdims=True)
        tok_j = jnp.where(ended_j > 0.0, float(pad_id), tok_j)

        hist_j = jnp.zeros((B, Lp), jnp.float32)
        for k in range(K):
            hist_j = hist_j + jax.lax.slice_in_dim(oh_parent, k, k + 1, axis=1) * hist[k]
        hist_j = jnp.where(col_iota == step, tok_j, hist_j)

        new_hist.append(hist_j)
        new_tok.append(tok_j)
        new_logp.append(logp_j)
        new_ended.append(jnp.maximum(ended_j, (tok_j == float(eos_id)).astype(jnp.float32)))
        # first-EOS+1: a token written at position `step` has length step+1
        new_eoslen.append(jnp.where(ended_j > 0.0, eoslen_j, step_f + 1.0))

    return (
        h, c,
        jnp.stack(new_hist, axis=0),                 # [K, B, Lp]
        jnp.concatenate(new_tok, axis=0),            # [K*B, 1] k-major
        jnp.concatenate(new_logp, axis=-1),          # [B, K]
        jnp.concatenate(new_ended, axis=-1),
        jnp.concatenate(new_eoslen, axis=-1),
    )


def _beam_kernel(n_cells, K, V, Vc, chunk, step0, eos_id, pad_id, alpha, beta, refs):
    n_in = 8 + 3 * n_cells + 7
    (
        pk_ref, value_ref, bias_ref, qw_ref, qb_ref, emb_ref, vw_ref, vb_ref,
        *rest,
    ) = refs[:n_in]
    cell_refs = rest[: 3 * n_cells]
    k_refs = cell_refs[0::3]
    r_refs = cell_refs[1::3]
    b_refs = cell_refs[2::3]
    h0_ref, c0_ref, hist0_ref, last0_ref, logp0_ref, ended0_ref, eoslen0_ref = rest[3 * n_cells:]
    hist_out, logp_out = refs[n_in:n_in + 2]
    h_scr, c_scr, hist_scr, last_scr, logp_scr, ended_scr, eoslen_scr = refs[n_in + 2:]

    n = pl.program_id(0)
    B = pk_ref.shape[0]

    @pl.when(n == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        hist_scr[:] = hist0_ref[:]
        last_scr[:] = last0_ref[:]
        logp_scr[:] = logp0_ref[:]
        ended_scr[:] = ended0_ref[:]
        eoslen_scr[:] = eoslen0_ref[:]

    h, c, new_hist, new_last, new_logp, new_ended, new_eoslen = _beam_step_math(
        n_cells, K, V, Vc, chunk, eos_id, pad_id, alpha, beta,
        pk_ref, value_ref, bias_ref, qw_ref, qb_ref, emb_ref, vw_ref, vb_ref,
        k_refs, r_refs, b_refs,
        h_scr[:], c_scr[:],
        hist_scr[:],
        jax.lax.slice_in_dim(last_scr[:], 0, 1, axis=1),
        jax.lax.slice_in_dim(logp_scr[:], 0, K, axis=1),
        jax.lax.slice_in_dim(ended_scr[:], 0, K, axis=1),
        jax.lax.slice_in_dim(eoslen_scr[:], 0, K, axis=1),
        step0 + n,
    )

    hist_scr[:] = new_hist
    hist_out[:] = new_hist
    last_scr[:] = jnp.broadcast_to(new_last, last_scr.shape)
    padf = jnp.zeros((B, 128 - K), jnp.float32)
    logp_scr[:] = jnp.concatenate([new_logp, padf], axis=-1)
    logp_out[:] = logp_scr[:]
    ended_scr[:] = jnp.concatenate([new_ended, padf], axis=-1)
    eoslen_scr[:] = jnp.concatenate([new_eoslen, padf], axis=-1)
    h_scr[:] = h
    c_scr[:] = c


def beam_loop_reference(n_cells, n_steps, K, chunk, step0, eos_id, pad_id, alpha, beta, *operands):
    """Plain-jnp oracle: the exact `_beam_step_math` loop without Pallas.

    Same operand list as `_beam_invoke` (post layout conversion happens
    here too); the interpret-mode tests pin the kernel's ref/scratch/grid
    mechanics against this bit-for-bit."""
    ops = _to_kmajor(list(operands), n_cells, K)
    (pk, value, bias, qw, qb, emb, vw, vb), rest = ops[:8], ops[8:]
    cells = rest[: 3 * n_cells]
    h, c, hist, last, logp, ended, eoslen = rest[3 * n_cells:]
    h = h.astype(jnp.float32)
    c = c.astype(jnp.float32)
    last = last[:, :1]
    logp, ended, eoslen = logp[:, :K], ended[:, :K], eoslen[:, :K]
    V = vw.shape[-1]
    for n in range(n_steps):
        h, c, hist, last, logp, ended, eoslen = _beam_step_math(
            n_cells, K, V, _vocab_chunk(V), chunk, eos_id, pad_id, alpha, beta,
            pk, value, bias, qw, qb, emb, vw, vb,
            cells[0::3], cells[1::3], cells[2::3],
            h, c, hist, last, logp, ended, eoslen, jnp.int32(step0 + n),
        )
    return hist, logp


def _to_kmajor(ops, n_cells, K):
    """Shared operand layout conversion (beam-major rows -> k-major)."""
    pk = ops[0]
    B = pk.shape[0]
    R = K * B

    def kmajor(x):
        return x.reshape(B, K, -1).swapaxes(0, 1).reshape(K * B, -1)

    i0 = 8 + 3 * n_cells
    ops[i0] = kmajor(ops[i0])          # h0
    ops[i0 + 1] = kmajor(ops[i0 + 1])  # c0
    ops[i0 + 2] = ops[i0 + 2].swapaxes(0, 1)  # tokens [B,K,Lp] -> [K,B,Lp]
    ops[i0 + 3] = jnp.broadcast_to(kmajor(ops[i0 + 3]), (R, 128))  # last token
    return ops


def _beam_invoke(n_cells, n_steps, K, chunk, step0, eos_id, pad_id, alpha, beta, *operands):
    pk = operands[0]
    B, S, H = pk.shape
    Dv = operands[1].shape[-1]
    V, He = operands[5].shape
    Vc = _vocab_chunk(V)
    R = K * B
    Lp = operands[8 + 3 * n_cells + 2].shape[-1]
    ops = _to_kmajor(list(operands), n_cells, K)

    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    in_specs = [
        const(B, S, H), const(B, S, Dv), const(B, S),
        const(H, H), const(1, H), const(V, He), const(H, V), const(1, V),
    ]
    for i in range(n_cells):
        in_specs += [const(ops[len(in_specs)].shape[0], 4 * H), const(H, 4 * H), const(1, 4 * H)]
    in_specs += [
        const(R, H), const(R, H), const(K, B, Lp), const(R, 128),
        const(B, 128), const(B, 128), const(B, 128),
    ]

    out_shape = [
        jax.ShapeDtypeStruct((K, B, Lp), jnp.float32),  # final histories
        jax.ShapeDtypeStruct((B, 128), jnp.float32),    # final log-probs
    ]
    out_specs = [const(K, B, Lp), const(B, 128)]

    kernel = functools.partial(
        _beam_kernel, n_cells, K, V, Vc, chunk, step0, eos_id, pad_id, alpha, beta
    )
    return pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((R, H), jnp.float32),      # h carry
            pltpu.VMEM((R, H), jnp.float32),      # c carry
            pltpu.VMEM((K, B, Lp), jnp.float32),  # token histories
            pltpu.VMEM((R, 128), jnp.float32),    # last tokens
            pltpu.VMEM((B, 128), jnp.float32),    # cumulative log-probs
            pltpu.VMEM((B, 128), jnp.float32),    # ended flags
            pltpu.VMEM((B, 128), jnp.float32),    # first-EOS+1 lengths
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 2**20,
        ),
    )(*ops)


def beam_search_pallas(
    pk, value, attn_mask, qw, qb, emb_table, vocab_w, vocab_b,
    kernels, rkernels, biases, h0, c0, init_tokens, init_logp,
    max_token_length: int, bos_id: int, eos_id: int, pad_id: int = 0,
    alpha: float = 1.0, beta: float = 32.0, chunk: int = DEFAULT_CHUNK,
    oracle: bool = False,
):
    """Beam-search decode loop (steps 2..L-1) in one Pallas kernel.

    ``oracle=True`` runs the identical step math as a plain-jnp python
    loop instead of the pallas_call (beam_loop_reference) — the tests pin
    the kernel's ref/scratch/grid mechanics against it bit-for-bit.

    :param pk: [B,S,H] bf16 projected keys; value: [B,S,Dv] listener output
    :param h0/c0: [B*K, H] beam-major decoder states AFTER the first step
    :param init_tokens: [B,K,L] i32 histories with BOS + the first-step
        top-K tokens in columns 0/1 (search.py:182-187)
    :param init_logp: [B,K] f32 first-step log-probs
    :return: (tokens [B,K,L] i32, logp [B,K] f32) — the while_loop's final
        carry; pad-masking and perplexity happen in the caller.
    """
    B, K, L = init_tokens.shape
    H = pk.shape[-1]
    n_cells = len(kernels)
    n_steps = L - 2
    Lp = -(-L // 128) * 128

    attn_bias = -1e9 * (1.0 - attn_mask.astype(jnp.float32))
    S = pk.shape[1]
    S_pad = -(-S // chunk) * chunk
    if S_pad != S:
        pk = jnp.pad(pk, ((0, 0), (0, S_pad - S), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, S_pad - S), (0, 0)))
        attn_bias = jnp.pad(attn_bias, ((0, 0), (0, S_pad - S)), constant_values=-1e9)

    hist0 = init_tokens.astype(jnp.float32)
    if Lp != L:
        hist0 = jnp.pad(hist0, ((0, 0), (0, 0), (0, Lp - L)), constant_values=float(pad_id))
    last0 = init_tokens[:, :, 1].reshape(B * K, 1).astype(jnp.float32)
    ended0 = jnp.any(init_tokens == eos_id, axis=-1).astype(jnp.float32)  # [B, K]
    is_eos = init_tokens == eos_id
    first = jnp.argmax(is_eos, axis=-1).astype(jnp.float32) + 1.0
    eoslen0 = jnp.where(ended0 > 0.0, first, 0.0)
    pad128 = lambda x: jnp.pad(x, ((0, 0), (0, 128 - K)))
    logp0 = pad128(init_logp.astype(jnp.float32))
    ended0 = pad128(ended0)
    eoslen0 = pad128(eoslen0)

    operands = [pk, value, attn_bias, qw, qb.reshape(1, H), emb_table,
                vocab_w, vocab_b.reshape(1, -1)]
    in_dims = [0, 0, 0, None, None, None, None, None]
    for i in range(n_cells):
        operands += [kernels[i], rkernels[i], biases[i].reshape(1, 4 * H)]
        in_dims += [None, None, None]
    operands += [h0, c0, hist0, last0, logp0, ended0, eoslen0]
    in_dims += [0, 0, 0, 0, 0, 0, 0]

    if oracle:
        hist, logp = beam_loop_reference(
            n_cells, n_steps, K, chunk, 2, eos_id, pad_id, alpha, beta, *operands
        )
    else:
        hist, logp = shard_over_batch(
            functools.partial(
                _beam_invoke, n_cells, n_steps, K, chunk, 2, eos_id, pad_id, alpha, beta
            ),
            tuple(operands), in_dims, (bspec(1, 3), bspec(0, 2)),
        )
    tokens = hist.swapaxes(0, 1)[:, :, :L].astype(jnp.int32)  # [B, K, L]
    return tokens, logp[:, :K]
