"""Fused banded RNN-T joint planes — the Pallas pair behind the pruned
transducer loss (ops/transducer_pruned.py).

Same VMEM-resident transposed-logits design as the dense joint pair
(transducer_kernel.py — read that docstring first): per grid cell the
kernel forms ``logits^T = W_aug^T @ h_aug`` with L = 128 lanes and reduces
the logsumexp along the V sublanes.  The banded difference is WHICH
(frame, u) pairs the lanes enumerate: here lane l = f*Sp + s maps to
lattice node (t0 + f, p[b, t0 + f] + s) — only the ``s_range`` label slots
of each frame's band — so with Sp = 8 one grid cell covers TF = 16 frames
instead of 2, an 8x cut in both grid cells and matmul FLOPs at bench
shapes (s_range=8 vs U+1=64).

Because the band start varies per frame, the per-lane prediction rows
cannot be a single per-b block.  Round 15 shipped them as a host-side
``take_along_axis`` gather into ``predL [B, Sgrid, J, L]`` (bf16, ~170 MB
HBM at bench shapes, built in the fwd AND rebuilt in the bwd's prep);
round 16 moves the gather INTO the kernel: each grid cell receives the
whole (padded) prediction projection ``predT [J, U1p]`` (~40 KB VMEM) and
forms its lanes with a one-hot select matmul against the lanes' label
indices (``predL = predT @ selU``, ``selU[u, l] = (u == uband[l])`` —
exact, one term per output) — the same iota-select matmul the backward's
d_pred scatter already used, now shared.  Measured on chip (round 16,
PERF.md): value/grad parity PASS, but the FULL train step is UNCHANGED at
~204 ms — the deleted predL build overlapped with kernel compute, so the
win is HBM footprint (-170 MB of transient traffic), not step time.  The
step lever that DID land is the Sp=4 layout below: ``pruned_range: 4``
runs 153.4 ms/step vs 204 at s_range=8 (tools/family_bench.py
transducer_pruned4 row).  Everything else — the augmented all-ones
bias row, the f32 whole-grid dW_aug accumulator, denc via the
frame-select matmul — is the dense kernel's machinery, imported from
transducer_kernel.

Equivalence with the XLA banded scan (values and all gradients) is pinned
in tests/test_transducer_pruned.py (interpret mode); the on-chip step A/B
lives in tools/family_bench.py (transducer with pruned_range set).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch
from .transducer_kernel import _round_up

_L = 128  # lane count per grid cell (the measured-optimal dense width)


def _band_layout(T: int, U1: int, S: int):
    """(Sp, TF, Tp, Sgrid, U1p) for the banded tiling: Sp rounds the band
    width up to a power-of-two divisor of the 128 lanes, TF = 128 // Sp
    frames pack per grid cell, U1p is the dpred output lane width.  Sp=4
    (TF=32) is the narrowest validated layout — it doubles the frame
    packing for k2-default band widths (s_range 4-5) and halves the grid
    cells again vs Sp=8."""
    Sp = 4
    while Sp < S:
        Sp *= 2
    TF = _L // Sp
    Tp = _round_up(T, TF)
    U1p = 64 if U1 <= 64 else _round_up(U1, 128)
    return Sp, TF, Tp, Tp // TF, U1p


# widest band layout covered by the interpret-mode equivalence pins
# (tests/test_transducer_pruned.py parametrizes Sp in {4, 8, 16, 32});
# wider bands decline loudly instead of reaching an unvalidated tiling
_MAX_S = 32


def banded_planes_supported(enc_proj, pred_proj, wo, ids, s_range: int) -> bool:
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("banded_joint", reason, **kw)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    if enc_proj.dtype != jnp.bfloat16 or pred_proj.dtype != jnp.bfloat16:
        return decline(
            f"joint-input dtypes ({enc_proj.dtype}, {pred_proj.dtype}) != bfloat16"
        )
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    V = wo.shape[-1]
    if ids.shape[1] + 1 != U1:
        # the lane label map assumes pred_proj covers exactly ids plus the
        # leading blank/bos row — anything else means mismatched operands
        return decline(
            f"ids width {ids.shape[1]} + 1 != prediction width U+1 = {U1}"
        )
    if V % 128 or J % 8:
        return decline(f"unaligned dims (V {V} % 128, J {J} % 8)")
    if not 1 <= s_range <= _MAX_S:
        return decline(
            f"s_range {s_range} not in [1, {_MAX_S}] (validated band layouts)"
        )
    if U1 > 512:
        return decline(f"label width U+1 = {U1} > 512")
    if batch_shards(B) is None:
        return decline(f"batch {B} not shardable over the data mesh axis")
    # backward VMEM: the dense kernel's 128-lane budget (logits/softmax/dz
    # f32 + dz bf16 + W_aug bf16 + dW_aug f32 scratch) plus the predT block,
    # the selU one-hot, and the in-kernel predL lanes
    JA = _round_up(J, 8) + 8
    ja_lanes = _round_up(JA, 128)
    _, _, _, _, U1p = _band_layout(T, U1, s_range)
    vmem = V * _L * (4 + 4 + 4 + 2 + 4) + V * ja_lanes * (2 + 4) + 6 * J * _L
    vmem += J * max(U1p, 128) * 4  # dpred scratch
    vmem += J * U1p * 2 + U1p * _L * 4 + J * _L * 6  # predT + selU + predL
    if vmem > 96 * 2**20:
        return decline(f"backward VMEM estimate {vmem >> 20} MB > 96 MB budget")
    return True


def _pred_lanes(predT, uband_row, dt):
    """predL [J, L]: lane l's prediction row — ``predT @ selU`` with the
    one-hot ``selU[u, l] = (u == uband[l])``.  Exactly one term per output,
    so the matmul IS the gather (bit-identical to take_along_axis) but runs
    on the MXU from VMEM instead of shipping a 170 MB HBM operand."""
    U1p = predT.shape[1]
    urows = jax.lax.broadcasted_iota(jnp.int32, (U1p, _L), 0)
    selU = (urows == uband_row).astype(predT.dtype)
    return jax.lax.dot_general(
        predT, selU, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dt)


def _build_h_band(encT, predL, J, Sp, TF, JA_base, JA):
    """h_aug [JA, L] bf16: tanh(enc_f + pred_lane) per banded lane, plus
    the all-ones bias row at JA_base (transducer_kernel._build_h's aug)."""
    e = jnp.concatenate(
        [
            jnp.broadcast_to(jax.lax.slice_in_dim(encT, f, f + 1, axis=1), (J, Sp))
            for f in range(TF)
        ],
        axis=1,
    )  # [J, L] frame-major
    h = jnp.tanh(predL + e)
    rows = jax.lax.broadcasted_iota(jnp.int32, (JA - J, _L), 0)
    aug = jnp.where(rows == (JA_base - J), 1.0, 0.0).astype(h.dtype)
    return jnp.concatenate([h, aug], axis=0)  # [JA, L]


# --------------------------------------------------------------------- fwd


def _fwd_kernel(blank, J, Sp, TF, JA_base, JA, *refs):
    encT_ref, predT_ref, ids_ref, uband_ref, w_ref, out_ref = refs
    uband_row = jax.lax.slice_in_dim(uband_ref[0][0], 0, 1, axis=0)  # [1, L]
    predL = _pred_lanes(predT_ref[0], uband_row, encT_ref.dtype)
    h_aug = _build_h_band(encT_ref[0][0], predL, J, Sp, TF, JA_base, JA)
    logitsT = jax.lax.dot_general(
        w_ref[:], h_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [V, L] f32, VMEM only
    m = jnp.max(logitsT, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logitsT - m), axis=0, keepdims=True))
    rows = jax.lax.broadcasted_iota(jnp.int32, logitsT.shape, 0)
    zb = jnp.sum(jnp.where(rows == blank, logitsT, 0.0), axis=0, keepdims=True)
    idrow = jax.lax.slice_in_dim(ids_ref[0][0], 0, 1, axis=0)  # [1, L]
    ze = jnp.sum(jnp.where(rows == idrow, logitsT, 0.0), axis=0, keepdims=True)
    out_ref[0, 0] = jnp.concatenate(
        [lse, zb, ze, jnp.zeros((5, _L), jnp.float32)], axis=0
    )


def _fwd_invoke(blank, Sp, encT_g, predT, idsrow, ubandrow, w_aug):
    B, Sg, J, TF = encT_g.shape
    V, JA = w_aug.shape
    U1p = predT.shape[-1]
    JA_base = _round_up(J, 8)
    const = lambda *bs: pl.BlockSpec(bs, lambda b, s: (0,) * len(bs), memory_space=pltpu.VMEM)
    per_b = lambda *bs: pl.BlockSpec((1,) + bs, lambda b, s: (b,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    per_bs = lambda *bs: pl.BlockSpec((1, 1) + bs, lambda b, s: (b, s) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, blank, J, Sp, TF, JA_base, JA),
        grid=(B, Sg),
        in_specs=[per_bs(J, TF), per_b(J, U1p), per_bs(8, _L), per_bs(8, _L), const(V, JA)],
        out_specs=[per_bs(8, _L)],
        out_shape=[jax.ShapeDtypeStruct((B, Sg, 8, _L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 2**20,
        ),
    )(encT_g, predT, idsrow, ubandrow, w_aug)


# --------------------------------------------------------------------- bwd


def _bwd_kernel(blank, J, Sp, TF, U1p, JA_base, JA, nb, ns, *refs):
    (encT_ref, predT_ref, ids_ref, uband_ref, w_ref, packed_ref, cot_ref,
     denc_ref, dpred_ref, dw_ref, dpred_scr, dw_scr) = refs
    b, s = pl.program_id(0), pl.program_id(1)

    @pl.when((b == 0) & (s == 0))
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)

    @pl.when(s == 0)
    def _():
        dpred_scr[:] = jnp.zeros_like(dpred_scr)

    uband_row0 = jax.lax.slice_in_dim(uband_ref[0][0], 0, 1, axis=0)  # [1, L]
    predL = _pred_lanes(predT_ref[0], uband_row0, encT_ref.dtype)
    h_aug = _build_h_band(encT_ref[0][0], predL, J, Sp, TF, JA_base, JA)
    logitsT = jax.lax.dot_general(
        w_ref[:], h_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [V, L]
    lse_row = jax.lax.slice_in_dim(packed_ref[0][0], 0, 1, axis=0)  # [1, L]
    smT = jnp.exp(logitsT - lse_row)
    dlpb_row = jax.lax.slice_in_dim(cot_ref[0][0], 0, 1, axis=0)
    dlpe_row = jax.lax.slice_in_dim(cot_ref[0][0], 1, 2, axis=0)
    total = dlpb_row + dlpe_row  # [1, L]
    rows = jax.lax.broadcasted_iota(jnp.int32, logitsT.shape, 0)
    idrow = jax.lax.slice_in_dim(ids_ref[0][0], 0, 1, axis=0)
    dzT = smT * (-total)
    dzT = dzT + jnp.where(rows == blank, jnp.broadcast_to(dlpb_row, logitsT.shape), 0.0)
    dzT = dzT + jnp.where(rows == idrow, jnp.broadcast_to(dlpe_row, logitsT.shape), 0.0)
    dz_bf = dzT.astype(jnp.bfloat16)

    # dh_aug [JA, L] = W_aug^T @ dz (rows < J pass through tanh')
    dh = jax.lax.dot_general(
        w_ref[:], dz_bf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    hf = jax.lax.slice_in_dim(h_aug, 0, J, axis=0).astype(jnp.float32)
    dpre = jax.lax.slice_in_dim(dh, 0, J, axis=0) * (1.0 - hf * hf)  # [J, L] f32

    lanes = jax.lax.broadcasted_iota(jnp.int32, (_L, TF), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_L, TF), 1)
    selF = (lanes // Sp == cols).astype(jnp.float32)  # [L, TF]
    denc_ref[0, 0] = jax.lax.dot_general(
        dpre, selF, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [J, TF]

    # d_pred scatter: lane l's label slot is uband[l] (= p + s, clipped);
    # out-of-band lanes carry dpre == 0, so clipped collisions are inert
    # (same one-hot as _pred_lanes' gather, f32 for the accumulating dot)
    urows = jax.lax.broadcasted_iota(jnp.int32, (U1p, _L), 0)
    selU_T = (urows == uband_row0).astype(jnp.float32)  # [U1p, L]
    dpred_scr[:] = dpred_scr[:] + jax.lax.dot_general(
        dpre, selU_T, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [J, U1p]

    @pl.when(s == ns - 1)
    def _():
        dpred_ref[0] = dpred_scr[:]

    # dW_aug [V, JA] += dz @ h_aug^T; column JA_base collects db
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        dz_bf, h_aug, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when((b == nb - 1) & (s == ns - 1))
    def _():
        dw_ref[:] = dw_scr[:]


def _bwd_invoke(blank, Sp, U1p, encT_g, predT, idsrow, ubandrow, w_aug, packed, cot):
    B, Sg, J, TF = encT_g.shape
    V, JA = w_aug.shape
    JA_base = _round_up(J, 8)
    const = lambda *bs: pl.BlockSpec(bs, lambda b, s: (0,) * len(bs), memory_space=pltpu.VMEM)
    per_b = lambda *bs: pl.BlockSpec((1,) + bs, lambda b, s: (b,) + (0,) * len(bs), memory_space=pltpu.VMEM)
    per_bs = lambda *bs: pl.BlockSpec((1, 1) + bs, lambda b, s: (b, s) + (0,) * len(bs), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, blank, J, Sp, TF, U1p, JA_base, JA, B, Sg),
        grid=(B, Sg),
        in_specs=[per_bs(J, TF), per_b(J, U1p), per_bs(8, _L), per_bs(8, _L),
                  const(V, JA), per_bs(8, _L), per_bs(8, _L)],
        out_specs=[per_bs(J, TF), per_b(J, U1p), const(V, JA)],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sg, J, TF), jnp.float32),
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
    )(encT_g, predT, idsrow, ubandrow, w_aug, packed, cot)


# ------------------------------------------------------------------ driver


def _prep(blank_index, s_range, enc_proj, pred_proj, wo, bo, ids, p):
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    U = ids.shape[1]
    V = wo.shape[-1]
    Sp, TF, Tp, Sg, U1p = _band_layout(T, U1, s_range)
    JA_base = _round_up(J, 8)
    dt = enc_proj.dtype

    if Tp != T:
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, Tp - T), (0, 0)))
        p = jnp.pad(p, ((0, 0), (0, Tp - T)), mode="edge")
    encT_g = jnp.swapaxes(enc_proj.reshape(B, Sg, TF, J), 2, 3)  # [B, Sg, J, TF]

    # per-lane band operands: lane l = f*Sp + s -> u_true = p[t0+f] + s.
    # The prediction rows are NOT gathered here — the kernel one-hot-matmuls
    # them out of the whole (padded, transposed) projection per cell
    # (_pred_lanes), so the only per-lane host operands are the int rows.
    u_true = p[:, :, None] + jnp.arange(Sp, dtype=jnp.int32)[None, None, :]  # [B, Tp, Sp]
    u_clip = jnp.clip(u_true, 0, U1 - 1)
    predT = jnp.swapaxes(
        jnp.pad(pred_proj, ((0, 0), (0, U1p - U1), (0, 0))), 1, 2
    )  # [B, J, U1p]

    # lane label ids: V (never gathered) when the slot is past the targets
    ids_i = ids.astype(jnp.int32)
    idval = jnp.where(
        u_true <= U - 1,
        jnp.take_along_axis(
            ids_i, jnp.clip(u_true, 0, max(U - 1, 0)).reshape(B, Tp * Sp), axis=1
        ).reshape(B, Tp, Sp),
        V,
    )
    idsrow = jnp.broadcast_to(
        idval.reshape(B, Sg, 1, TF * Sp), (B, Sg, 8, _L)
    )
    ubandrow = jnp.broadcast_to(
        u_clip.reshape(B, Sg, 1, TF * Sp), (B, Sg, 8, _L)
    )

    w_aug = jnp.concatenate(
        [
            jnp.swapaxes(wo, 0, 1).astype(dt),
            jnp.zeros((V, JA_base - J), dt),
            bo.astype(dt)[:, None],
            jnp.zeros((V, 7), dt),
        ],
        axis=1,
    )  # [V, JA]
    return encT_g, predT, idsrow, ubandrow, w_aug, (Sp, TF, Tp, Sg, U1p)


def _unpack(packed, T, Tp, S, Sp, TF):
    """packed [B, Sg, 8, L] rows (lse, zb, ze) -> band planes [B, T, S]."""
    B, Sg = packed.shape[:2]
    rows = packed.reshape(B, Sg, 8, TF, Sp)
    rows = jnp.swapaxes(rows, 2, 3).reshape(B, Tp, 8, Sp)[:, :T]
    lse, zb, ze = rows[:, :, 0], rows[:, :, 1], rows[:, :, 2]
    return (zb - lse)[:, :, :S], (ze - lse)[:, :, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_banded_planes(blank_index, s_range, enc_proj, pred_proj, wo, bo, ids, p):
    """Drop-in fast path for ops/transducer_pruned.banded_joint_planes
    (same contract); gate with banded_planes_supported."""
    out, _ = _fused_fwd(blank_index, s_range, enc_proj, pred_proj, wo, bo, ids, p)
    return out


def _fused_fwd(blank_index, s_range, enc_proj, pred_proj, wo, bo, ids, p):
    B, T, J = enc_proj.shape
    encT_g, predT, idsrow, ubandrow, w_aug, (Sp, TF, Tp, Sg, U1p) = _prep(
        blank_index, s_range, enc_proj, pred_proj, wo, bo, ids, p
    )
    (packed,) = shard_over_batch(
        functools.partial(_fwd_invoke, blank_index, Sp),
        (encT_g, predT, idsrow, ubandrow, w_aug),
        in_dims=(0, 0, 0, 0, None),
        out_specs=(bspec(0, 4),),
    )
    planes = _unpack(packed, T, Tp, s_range, Sp, TF)
    return planes, (enc_proj, pred_proj, wo, bo, ids, p, packed)


def _fused_bwd(blank_index, s_range, res, cots):
    import numpy as np

    enc_proj, pred_proj, wo, bo, ids, p, packed = res
    dlpb, dlpe = cots  # [B, T, S] f32
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    encT_g, predT, idsrow, ubandrow, w_aug, (Sp, TF, Tp, Sg, U1p) = _prep(
        blank_index, s_range, enc_proj, pred_proj, wo, bo, ids, p
    )
    JA_base = _round_up(J, 8)

    def pack(rowsB, rowsE):
        z = jnp.zeros((B, T, Sp), jnp.float32)
        z = z.at[:, :, :s_range].set(rowsB.astype(jnp.float32))
        e = jnp.zeros((B, T, Sp), jnp.float32)
        e = e.at[:, :, :s_range].set(rowsE.astype(jnp.float32))
        both = jnp.stack([z, e], axis=2)  # [B, T, 2, Sp]
        both = jnp.pad(both, ((0, 0), (0, Tp - T), (0, 6), (0, 0)))
        return jnp.swapaxes(both.reshape(B, Sg, TF, 8, Sp), 2, 3).reshape(B, Sg, 8, _L)

    cot = pack(dlpb, dlpe)
    denc_g, dpredT, dw_aug = shard_over_batch(
        functools.partial(_bwd_invoke, blank_index, Sp, U1p),
        (encT_g, predT, idsrow, ubandrow, w_aug, packed, cot),
        in_dims=(0, 0, 0, 0, None, 0, 0),
        out_specs=(bspec(0, 4), bspec(0, 3), bspec(None, 2)),
        psum_out=(2,),
    )
    denc = jnp.swapaxes(denc_g, 2, 3).reshape(B, Tp, J)[:, :T].astype(enc_proj.dtype)
    dpred = jnp.swapaxes(dpredT, 1, 2)[:, :U1].astype(pred_proj.dtype)
    dwo = jnp.swapaxes(dw_aug[:, :J], 0, 1).astype(wo.dtype)
    dbo = dw_aug[:, JA_base].astype(bo.dtype)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (denc, dpred, dwo, dbo, f0(ids), f0(p))


fused_banded_planes.defvjp(_fused_fwd, _fused_bwd)
