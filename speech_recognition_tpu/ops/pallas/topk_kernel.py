"""Fused vocab-projection + top-k + logsumexp Pallas kernel (beam search).

Each LAS beam-search step needs, per decoder row: the top-K token
extensions of ``logits = hid @ W + b`` and the row logsumexp (to convert
the K winners to log-probs).  Under XLA the in-loop options are both bad:
``jax.lax.top_k`` lowers to a TopK custom call that is pathological inside
compiled loop bodies (0.8-12 ms/iter at [1024,16000], see
search.topk_inloop), and the iterative masked-argmax fallback re-reads the
logits k times (~0.46 ms/iter).

This kernel runs one invocation per decode step with everything in VMEM:

- W stays VMEM-resident; logits are computed tile-by-tile on the MXU
  ([R,H] x [H,Vc] per chunk) and rounded to bf16 to mirror the XLA path's
  bf16 Dense output (so selections agree with the XLA decoder).
- Top-k is a SINGLE streaming pass: per 128-lane column group, a sorted
  insertion into k register planes [R,128] (16 select ops per group).
  A value belongs to the global row top-k only if it is within the top-k
  of its own lane column, so the k*128 register candidates always contain
  the true top-k; a final k-round masked-argmax over the [R, k*128]
  candidates (tiny) extracts them.  Tie order matches jax.lax.top_k:
  strict-greater insertion keeps earlier (lower-index) equals above later
  ones, and the final rounds break value ties by minimum flat index.
- The logsumexp accumulates streaming (running max + rescaled sum) over
  the same tiles; logits never exist in HBM in any form.

Used by search.LASSearcher._beam_impl via models.las.step_beam_hidden
(the decode step split before the vocab projection).  Equivalence with
(lax.top_k . bf16-round . (hid @ W + b), logsumexp) is pinned in
tests/test_pallas_topk.py (interpret mode); on-chip, 1-ULP accumulation
differences can flip exact bf16 ties, same as the other Pallas kernels
(tools/beam_ab.py audits).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch

_NEG = float(jnp.finfo(jnp.float32).min)


def round_bf16(x):
    """Round f32 to the bf16 grid (round-to-nearest-even), staying f32.

    Bit arithmetic, because the two obvious spellings both fail: Mosaic has
    no ``reduce_precision`` lowering, and a convert(bf16)->convert(f32)
    chain gets its rounding elided by XLA's bf16 pass (observed under
    interpret mode).  Matches ``x.astype(bf16).astype(f32)`` exactly, inf
    and nan included (nan payloads may differ; values compare equal)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(r, jnp.float32)


def _vocab_chunk(V: int) -> int:
    """Largest multiple of 128 that divides V, capped at 4096 (f32 logits
    tile stays <= R*Vc*4 = 16 MB at R=1024)."""
    for c in range(4096, 0, -128):
        if V % c == 0:
            return c
    return 0


def vocab_topk_pallas_supported(hid, W, k: int) -> bool:
    """Gate: bf16 operands, lane/sublane-aligned dims, VMEM budget."""
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("vocab_topk", reason, **kw)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    if hid.dtype != jnp.bfloat16:
        return decline(f"hidden dtype {hid.dtype} != bfloat16")
    R, H = hid.shape
    V = W.shape[-1]
    Vc = _vocab_chunk(V)
    shards = batch_shards(R)  # rows are independent: shard over 'data'
    if shards is None:
        return decline(f"row count {R} not shardable over the data mesh axis")
    Rl = shards[1]
    if Vc == 0 or Rl % 16 or H % 128 or not 0 < k <= 16:
        return decline(
            f"unaligned dims or k (local rows {Rl} % 16, H {H} % 128 — pad H "
            f"to a 128 multiple at the call site — V {V} chunk {Vc}, k {k} <= 16)"
        )
    # resident: W bf16 + hid + f32 logits tile + 2k register planes + outs
    vmem = W.size * 2 + Rl * H * 2 + Rl * Vc * 4 + (2 * k + 4) * Rl * 128 * 4
    if vmem > 96 * 2**20:
        return decline(f"VMEM estimate {vmem >> 20} MB > 96 MB budget")
    return True


def streaming_vocab_topk(hid, w_ref, b_ref, V: int, Vc: int, k: int):
    """Shared in-kernel body: top-k + logsumexp of the bf16-rounded vocab
    projection ``hid @ W + b``, streaming over Vc-wide chunks.

    Usable inside any Pallas kernel (also the beam mega-kernel,
    beam_kernel.py).  ``hid`` is a [R, H] bf16 VALUE; ``w_ref``/``b_ref``
    are [H, V] / [1, V] refs (bf16).

    :return: (vals [R, k] f32 — bf16-rounded logits, idx [R, k] i32 with
        lax.top_k tie order, lse [R, 1] f32)
    """
    R = hid.shape[0]
    n_chunks = V // Vc
    n_groups = Vc // 128

    vregs = [jnp.full((R, 128), _NEG, jnp.float32) for _ in range(k)]
    iregs = [jnp.zeros((R, 128), jnp.int32) for _ in range(k)]
    run_max = jnp.full((R, 1), _NEG, jnp.float32)
    run_sum = jnp.zeros((R, 1), jnp.float32)

    for ci in range(n_chunks):
        # mirror nn.Dense(dtype=bf16) exactly: f32-accumulated dot rounded
        # to bf16, bias added in bf16 — so selections match the XLA path
        dot = jnp.dot(
            hid, w_ref[:, ci * Vc:(ci + 1) * Vc], preferred_element_type=jnp.float32
        )
        bias = b_ref[:, ci * Vc:(ci + 1) * Vc].astype(jnp.float32)  # exact
        logits = round_bf16(round_bf16(dot) + bias)  # [R, Vc] f32, bf16 grid

        # streaming logsumexp over the chunk
        cm = jnp.max(logits, axis=-1, keepdims=True)
        new_max = jnp.maximum(run_max, cm)
        chunk_sum = jnp.sum(jnp.exp(logits - cm), axis=-1, keepdims=True)
        run_sum = run_sum * jnp.exp(run_max - new_max) + chunk_sum * jnp.exp(cm - new_max)
        run_max = new_max

        # sorted insertion of each 128-lane column group into the k planes
        for g in range(n_groups):
            cur_v = jax.lax.slice_in_dim(logits, g * 128, (g + 1) * 128, axis=1)
            cur_i = jnp.full((R, 128), ci * n_groups + g, jnp.int32)
            for r in range(k):
                gt = cur_v > vregs[r]
                vregs[r], cur_v = (
                    jnp.where(gt, cur_v, vregs[r]),
                    jnp.where(gt, vregs[r], cur_v),
                )
                iregs[r], cur_i = (
                    jnp.where(gt, cur_i, iregs[r]),
                    jnp.where(gt, iregs[r], cur_i),
                )

    # phase B: exact top-k over the k*128 candidates per row
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    cand_v = jnp.concatenate(vregs, axis=-1)  # [R, k*128]
    cand_i = jnp.concatenate([ir * 128 + lane for ir in iregs], axis=-1)
    out_v, out_i = [], []
    for _ in range(k):
        m = jnp.max(cand_v, axis=-1, keepdims=True)
        sel = jnp.min(jnp.where(cand_v == m, cand_i, V), axis=-1, keepdims=True)
        out_v.append(m)
        out_i.append(sel)
        cand_v = jnp.where((cand_v == m) & (cand_i == sel), _NEG, cand_v)

    vals = jnp.concatenate(out_v, axis=-1)
    idx = jnp.concatenate(out_i, axis=-1)
    lse = jnp.log(run_sum) + run_max
    return vals, idx, lse


def _kernel(k, V, Vc, refs):
    hid_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref = refs
    R = hid_ref.shape[0]
    vals, idx, lse = streaming_vocab_topk(hid_ref[:], w_ref, b_ref, V, Vc, k)
    padf = [jnp.zeros((R, 1), jnp.float32)] * (128 - k)
    vals_ref[:] = jnp.concatenate([vals] + padf, axis=-1)
    idx_ref[:] = jnp.concatenate([idx] + [jnp.zeros((R, 1), jnp.int32)] * (128 - k), axis=-1)
    lse_ref[:] = jnp.broadcast_to(lse, (R, 128))


def vocab_topk_pallas(hid, W, b, k: int):
    """(top-k values, top-k indices, logsumexp) of ``hid @ W + b``.

    :param hid: [R, H] bf16 decoder hidden rows
    :param W: [H, V] vocab projection (bf16)
    :param b: [V] bias
    :param k: static top-k size (1..16)
    :return: (vals [R,k] f32 — bf16-rounded logits, idx [R,k] i32,
        lse [R] f32 over the bf16-rounded logits)
    """
    V = W.shape[-1]
    Vc = _vocab_chunk(V)
    const = lambda *bs: pl.BlockSpec(bs, lambda: (0,) * len(bs), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, k, V, Vc)

    def call(hid, W, b2):
        # row-sharded under shard_over_batch: shapes here are per-shard
        R, H = hid.shape
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            in_specs=[const(R, H), const(H, V), const(1, V)],
            out_specs=[const(R, 128), const(R, 128), const(R, 128)],
            out_shape=[
                jax.ShapeDtypeStruct((R, 128), jnp.float32),
                jax.ShapeDtypeStruct((R, 128), jnp.int32),
                jax.ShapeDtypeStruct((R, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        )(hid, W, b2)

    vals, idx, lse = shard_over_batch(
        call,
        (hid, W.astype(hid.dtype), b.astype(hid.dtype).reshape(1, V)),
        (0, None, None),
        (bspec(0, 2), bspec(0, 2), bspec(0, 2)),
    )
    return vals[:, :k], idx[:, :k], lse[:, 0]
