"""Fused RNN-T joint -> log-softmax planes as a Pallas kernel pair.

The transducer loss only needs, per lattice node (b, t, u), the logsumexp
over the vocabulary plus TWO gathered logits (blank and the target label)
— ops/transducer.joint_log_planes.  The XLA scan implementation streams
one encoder frame at a time but still materializes each frame's
[B, U+1, V] f32 logits (and, in the backward, its softmax and dlogits) in
HBM: ~0.5 GB per frame at bench shapes, ~1.4 TB of HBM traffic per train
step — measured 2657 ms/step / 1.2% MFU (PERF.md round-14), 10x off the
joint's matmul floor.

These kernels keep every logits tile in VMEM.  Layout: the joint runs
TRANSPOSED — ``logits^T = W_aug^T @ h_aug`` with shape [V, L] where the
L = TF * U1p lanes enumerate (frame, u) pairs — so the logsumexp is a
sublane (V-axis) reduction landing directly in the [1, L] output row, and
the blank/target gathers are iota-mask reductions.  The bias folds into
the matmul via an augmented all-ones row of h (W_aug carries b as an
extra column), and the same trick makes the backward's dW tile carry db
in that column for free.

forward  (grid B x S): recompute-free single pass; emits a packed
    [8, L] row block per (b, frame-pair): rows = (lse, z_blank, z_target).
backward (grid B x S, sequential): recomputes h and logits^T in VMEM,
    forms dz^T = -softmax * (dlpb+dlpe) + one-hot adds, and produces
    d_enc per step, d_pred in a per-b VMEM accumulator, and dW_aug (dW
    and db together) in a whole-grid f32 VMEM accumulator written once.

Equivalence with joint_log_planes (values and all gradients) is pinned in
tests/test_pallas_transducer.py (interpret mode); the on-chip step-level
A/B lives in tools/family_bench.py (FAMILIES=transducer).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _layout(T: int, U1: int, J: int):
    """(U1p, TF, L, Tp, S, JA_base, JA) for the transposed tiling.  Tp pads
    T up to a TF multiple (the encoder's T' is odd at bench shapes — 255);
    pad frames carry zero enc rows and zero cotangents, so they cost one
    wasted matmul column group and contribute nothing to any gradient.

    SRT_JOINT_LANES (default 128) sets the lane target: 256 packs FOUR
    frames per grid step (U1p=64), halving grid count at ~111 MB backward
    VMEM — the experimental lever bounded in PERF round-14."""
    import os

    L_target = int(os.environ.get("SRT_JOINT_LANES", "128"))
    U1p = 64 if U1 <= 64 else _round_up(U1, 128)
    TF = max(L_target // U1p, 1)
    L = TF * U1p
    Tp = _round_up(T, TF)
    S = Tp // TF
    JA_base = _round_up(J, 8)
    JA = JA_base + 8  # aug block: ones row at JA_base, 7 zero rows
    return U1p, TF, L, Tp, S, JA_base, JA


def _bwd_vmem_bytes(V: int, J: int, L: int, JA: int) -> int:
    """Backward VMEM footprint from the actual (V, J, lanes, JA): logits/
    softmax/dz f32 + dz bf16 + W_aug bf16 + dW_aug f32 scratch + row iota;
    lanes pad to 128-multiples."""
    lanes = _round_up(L, 128)
    ja_lanes = _round_up(JA, 128)
    return V * lanes * (4 + 4 + 4 + 2 + 4) + V * ja_lanes * (2 + 4) + 4 * J * lanes


def joint_planes_supported(enc_proj, pred_proj, wo, ids) -> bool:
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("transducer_joint", reason, **kw)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    if enc_proj.dtype != jnp.bfloat16 or pred_proj.dtype != jnp.bfloat16:
        return decline(
            f"joint-input dtypes ({enc_proj.dtype}, {pred_proj.dtype}) != bfloat16"
        )
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    V = wo.shape[-1]
    if V % 128 or J % 8:
        return decline(f"unaligned dims (V {V} % 128, J {J} % 8)")
    U1p, TF, L, Tp, S, JA_base, JA = _layout(T, U1, J)
    if U1 > 512:
        return decline(f"label width U+1 = {U1} > 512")
    if batch_shards(B) is None:
        return decline(f"batch {B} not shardable over the data mesh axis")
    # The wide-lane experiment (SRT_JOINT_LANES=256) opts into a tighter
    # ceiling and relies on Mosaic liveness overlap.
    lanes = _round_up(L, 128)
    vmem = _bwd_vmem_bytes(V, J, L, JA)
    cap = 96 if lanes <= 128 else 114
    if vmem > cap * 2**20:
        reason = f"backward VMEM estimate {vmem >> 20} MB > {cap} MB budget"
        if lanes > 128:
            # the lane width is the one knob that shrinks the footprint:
            # compute the widest SRT_JOINT_LANES whose layout fits
            for lt in (256, 128):
                if lt >= lanes:
                    continue
                U1p2 = 64 if U1 <= 64 else _round_up(U1, 128)
                L2 = max(lt // U1p2, 1) * U1p2
                cap2 = 96 if _round_up(L2, 128) <= 128 else 114
                if _bwd_vmem_bytes(V, J, L2, JA) <= cap2 * 2**20:
                    reason += f"; SRT_JOINT_LANES={lt} would fit"
                    break
        return decline(reason)
    return True


# --------------------------------------------------------------------- fwd


def _build_h(encT, predT, J, U1p, TF, L, JA_base, JA):
    """h_aug [JA, L] bf16: tanh(enc_t + pred) columns for each (frame, u)
    lane, plus the all-ones bias row at JA_base."""
    pT = predT  # [J, U1p]
    if TF > 1:
        pT = jnp.concatenate([pT] * TF, axis=1)  # [J, L]
        e = jnp.concatenate(
            [
                jnp.broadcast_to(jax.lax.slice_in_dim(encT, f, f + 1, axis=1), (J, U1p))
                for f in range(TF)
            ],
            axis=1,
        )
    else:
        e = jnp.broadcast_to(jax.lax.slice_in_dim(encT, 0, 1, axis=1), (J, L))
    h = jnp.tanh(pT + e)  # bf16, matches the XLA path's tanh dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (JA - J, L), 0)
    aug = jnp.where(rows == (JA_base - J), 1.0, 0.0).astype(h.dtype)
    return jnp.concatenate([h, aug], axis=0)  # [JA, L]


def _fwd_kernel(blank, J, U1p, TF, L, JA_base, JA, *refs):
    encT_ref, predT_ref, ids_ref, w_ref, out_ref = refs
    h_aug = _build_h(encT_ref[0][0], predT_ref[0], J, U1p, TF, L, JA_base, JA)
    logitsT = jax.lax.dot_general(
        w_ref[:], h_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [V, L] f32, VMEM only
    m = jnp.max(logitsT, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logitsT - m), axis=0, keepdims=True))
    rows = jax.lax.broadcasted_iota(jnp.int32, logitsT.shape, 0)
    zb = jnp.sum(jnp.where(rows == blank, logitsT, 0.0), axis=0, keepdims=True)
    idrow = jax.lax.slice_in_dim(ids_ref[0], 0, 1, axis=0)  # [1, L]
    ze = jnp.sum(jnp.where(rows == idrow, logitsT, 0.0), axis=0, keepdims=True)
    out_ref[0, 0] = jnp.concatenate(
        [lse, zb, ze, jnp.zeros((5, L), jnp.float32)], axis=0
    )


def _fwd_invoke(blank, encT_g, predT, idsvec, w_aug):
    B, S, J, TF = encT_g.shape
    U1p = predT.shape[-1]
    L = TF * U1p
    V, JA = w_aug.shape
    JA_base = _round_up(J, 8)
    const = lambda *bs: pl.BlockSpec(bs, lambda b, s: (0,) * len(bs), memory_space=pltpu.VMEM)
    per_b = lambda *bs: pl.BlockSpec((1,) + bs, lambda b, s: (b,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    per_bs = lambda *bs: pl.BlockSpec((1, 1) + bs, lambda b, s: (b, s) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, blank, J, U1p, TF, L, JA_base, JA),
        grid=(B, S),
        in_specs=[per_bs(J, TF), per_b(J, U1p), per_b(8, L), const(V, JA)],
        out_specs=[per_bs(8, L)],
        out_shape=[jax.ShapeDtypeStruct((B, S, 8, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 2**20,
        ),
    )(encT_g, predT, idsvec, w_aug)  # 1-list (shard_over_batch listifies)


# --------------------------------------------------------------------- bwd


def _bwd_kernel(blank, J, U1p, TF, L, JA_base, JA, nb, ns, *refs):
    (encT_ref, predT_ref, ids_ref, w_ref, packed_ref, cot_ref,
     denc_ref, dpred_ref, dw_ref, dpred_scr, dw_scr) = refs
    b, s = pl.program_id(0), pl.program_id(1)

    @pl.when((b == 0) & (s == 0))
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)

    @pl.when(s == 0)
    def _():
        dpred_scr[:] = jnp.zeros_like(dpred_scr)

    h_aug = _build_h(encT_ref[0][0], predT_ref[0], J, U1p, TF, L, JA_base, JA)
    logitsT = jax.lax.dot_general(
        w_ref[:], h_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [V, L]
    lse_row = jax.lax.slice_in_dim(packed_ref[0][0], 0, 1, axis=0)  # [1, L]
    smT = jnp.exp(logitsT - lse_row)
    dlpb_row = jax.lax.slice_in_dim(cot_ref[0][0], 0, 1, axis=0)
    dlpe_row = jax.lax.slice_in_dim(cot_ref[0][0], 1, 2, axis=0)
    total = dlpb_row + dlpe_row  # [1, L]
    rows = jax.lax.broadcasted_iota(jnp.int32, logitsT.shape, 0)
    idrow = jax.lax.slice_in_dim(ids_ref[0], 0, 1, axis=0)
    dzT = smT * (-total)
    dzT = dzT + jnp.where(rows == blank, jnp.broadcast_to(dlpb_row, logitsT.shape), 0.0)
    dzT = dzT + jnp.where(rows == idrow, jnp.broadcast_to(dlpe_row, logitsT.shape), 0.0)
    dz_bf = dzT.astype(jnp.bfloat16)

    # dh_aug [JA, L] = W_aug^T @ dz  (only rows < J used, through tanh')
    dh = jax.lax.dot_general(
        w_ref[:], dz_bf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    hf = jax.lax.slice_in_dim(h_aug, 0, J, axis=0).astype(jnp.float32)
    dpre = jax.lax.slice_in_dim(dh, 0, J, axis=0) * (1.0 - hf * hf)  # [J, L] f32

    lanes = jax.lax.broadcasted_iota(jnp.int32, (L, TF), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, TF), 1)
    selF = (lanes // U1p == cols).astype(jnp.float32)  # [L, TF]
    denc_ref[0, 0] = jax.lax.dot_general(
        dpre, selF, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [J, TF]

    lanes_u = jax.lax.broadcasted_iota(jnp.int32, (L, U1p), 0)
    cols_u = jax.lax.broadcasted_iota(jnp.int32, (L, U1p), 1)
    selU = (lanes_u % U1p == cols_u).astype(jnp.float32)  # [L, U1p]
    dpred_scr[:] = dpred_scr[:] + jax.lax.dot_general(
        dpre, selU, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [J, U1p]

    @pl.when(s == ns - 1)
    def _():
        dpred_ref[0] = dpred_scr[:]

    # dW_aug [V, JA] += dz @ h_aug^T; column JA_base collects db (h row = 1)
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        dz_bf, h_aug, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when((b == nb - 1) & (s == ns - 1))
    def _():
        dw_ref[:] = dw_scr[:]


def _bwd_invoke(blank, encT_g, predT, idsvec, w_aug, packed, cot):
    B, S, J, TF = encT_g.shape
    U1p = predT.shape[-1]
    L = TF * U1p
    V, JA = w_aug.shape
    JA_base = _round_up(J, 8)
    const = lambda *bs: pl.BlockSpec(bs, lambda b, s: (0,) * len(bs), memory_space=pltpu.VMEM)
    per_b = lambda *bs: pl.BlockSpec((1,) + bs, lambda b, s: (b,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    per_bs = lambda *bs: pl.BlockSpec((1, 1) + bs, lambda b, s: (b, s) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, blank, J, U1p, TF, L, JA_base, JA, B, S),
        grid=(B, S),
        in_specs=[per_bs(J, TF), per_b(J, U1p), per_b(8, L), const(V, JA),
                  per_bs(8, L), per_bs(8, L)],
        out_specs=[per_bs(J, TF), per_b(J, U1p), const(V, JA)],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, J, TF), jnp.float32),
            jax.ShapeDtypeStruct((B, J, U1p), jnp.float32),
            jax.ShapeDtypeStruct((V, JA), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((J, U1p), jnp.float32),
            pltpu.VMEM((V, JA), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 2**20,
        ),
    )(encT_g, predT, idsvec, w_aug, packed, cot)


# ------------------------------------------------------------------ driver


def _prep(blank_index, enc_proj, pred_proj, wo, bo, ids):
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    U = ids.shape[1]
    V = wo.shape[-1]
    U1p, TF, L, Tp, S, JA_base, JA = _layout(T, U1, J)
    dt = enc_proj.dtype

    if Tp != T:
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, Tp - T), (0, 0)))
    encT_g = jnp.swapaxes(enc_proj.reshape(B, S, TF, J), 2, 3)  # [B, S, J, TF]
    predT = jnp.swapaxes(
        jnp.pad(pred_proj, ((0, 0), (0, U1p - U1), (0, 0))), 1, 2
    )  # [B, J, U1p]
    w_aug = jnp.concatenate(
        [
            jnp.swapaxes(wo, 0, 1).astype(dt),
            jnp.zeros((V, JA_base - J), dt),
            bo.astype(dt)[:, None],
            jnp.zeros((V, 7), dt),
        ],
        axis=1,
    )  # [V, JA]
    idvec = jnp.concatenate(
        [ids.astype(jnp.int32), jnp.full((B, U1p - U), V, jnp.int32)], axis=1
    )  # [B, U1p]; pad rows (u >= U) point past the vocab -> never gathered
    idvec = jnp.tile(idvec, (1, TF))  # [B, L]
    idsvec = jnp.broadcast_to(idvec[:, None, :], (B, 8, L))
    return encT_g, predT, w_aug, idsvec, (U1p, TF, L, Tp, S)


def _unpack_planes(packed, T, Tp, U1, U1p, TF):
    """packed [B, S, 8, L] rows (lse, zb, ze) -> lp_blank [B,T,U1], lp_emit."""
    B, S = packed.shape[:2]
    rows = packed.reshape(B, S, 8, TF, U1p)  # L = TF * U1p, frame-major lanes
    rows = jnp.swapaxes(rows, 2, 3).reshape(B, Tp, 8, U1p)[:, :T]
    lse, zb, ze = rows[:, :, 0], rows[:, :, 1], rows[:, :, 2]
    return (zb - lse)[:, :, :U1], (ze - lse)[:, :, : U1 - 1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_joint_planes(blank_index, enc_proj, pred_proj, wo, bo, ids):
    """Drop-in fast path for ops/transducer.joint_log_planes (same contract:
    (lp_blank [B,T,U+1] f32, lp_emit [B,T,U] f32)); gate with
    joint_planes_supported."""
    out, _ = _fused_fwd(blank_index, enc_proj, pred_proj, wo, bo, ids)
    return out


def _fused_fwd(blank_index, enc_proj, pred_proj, wo, bo, ids):
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    encT_g, predT, w_aug, idsvec, (U1p, TF, L, Tp, S) = _prep(
        blank_index, enc_proj, pred_proj, wo, bo, ids
    )
    (packed,) = shard_over_batch(
        functools.partial(_fwd_invoke, blank_index),
        (encT_g, predT, idsvec, w_aug),
        in_dims=(0, 0, 0, None),
        out_specs=(bspec(0, 4),),
    )
    planes = _unpack_planes(packed, T, Tp, U1, U1p, TF)
    return planes, (enc_proj, pred_proj, wo, bo, ids, packed)


def _fused_bwd(blank_index, res, cots):
    import numpy as np

    enc_proj, pred_proj, wo, bo, ids, packed = res
    dlpb, dlpe = cots  # [B, T, U1] f32, [B, T, U] f32
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    V = wo.shape[-1]
    encT_g, predT, w_aug, idsvec, (U1p, TF, L, Tp, S) = _prep(
        blank_index, enc_proj, pred_proj, wo, bo, ids
    )
    JA_base = _round_up(J, 8)

    def pack(rowsB, rowsE):
        z = jnp.zeros((B, T, U1p), jnp.float32)
        z = z.at[:, :, :U1].set(rowsB.astype(jnp.float32))
        e = jnp.zeros((B, T, U1p), jnp.float32)
        e = e.at[:, :, : U1 - 1].set(rowsE.astype(jnp.float32))
        both = jnp.stack([z, e], axis=2)  # [B, T, 2, U1p]
        both = jnp.pad(both, ((0, 0), (0, Tp - T), (0, 6), (0, 0)))
        # lanes are frame-major within a pair: [B, S, 8, TF * U1p]
        return jnp.swapaxes(both.reshape(B, S, TF, 8, U1p), 2, 3).reshape(B, S, 8, L)

    cot = pack(dlpb, dlpe)
    denc_g, dpredT, dw_aug = shard_over_batch(
        functools.partial(_bwd_invoke, blank_index),
        (encT_g, predT, idsvec, w_aug, packed, cot),
        in_dims=(0, 0, 0, None, 0, 0),
        out_specs=(bspec(0, 4), bspec(0, 3), bspec(None, 2)),
        psum_out=(2,),
    )
    denc = jnp.swapaxes(denc_g, 2, 3).reshape(B, Tp, J)[:, :T].astype(enc_proj.dtype)
    dpred = jnp.swapaxes(dpredT, 1, 2)[:, :U1].astype(pred_proj.dtype)
    dwo = jnp.swapaxes(dw_aug[:, :J], 0, 1).astype(wo.dtype)
    dbo = dw_aug[:, JA_base].astype(bo.dtype)
    return (
        denc,
        dpred,
        dwo,
        dbo,
        np.zeros(ids.shape, jax.dtypes.float0),
    )


fused_joint_planes.defvjp(_fused_fwd, _fused_bwd)
