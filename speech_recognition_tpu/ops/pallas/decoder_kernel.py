"""Pallas TPU mega-kernel for the teacher-forced LAS decoder forward scan.

Motivation (PERF.md "headroom"): under XLA, every one of the N (=127)
sequential decoder steps re-streams the attention operands from HBM — the
projected keys pk [B,S,H] (~17 MB bf16) and the listener values [B,S,Dv]
(~33 MB bf16), ~6 GB per train step for the forward loop alone.  This
kernel runs the WHOLE decode loop as one pallas_call with a grid over
steps: pk/value/weights live in VMEM blocks with constant index maps, so
Mosaic loads them exactly once and keeps them resident for all N steps
(verified: 50 MB of resident blocks compiles and runs on v5e, whose VMEM
is 128 MB).  Per-step traffic drops to the small residual streams.

The two batched matvecs (scores = q·pk per example, ctx = probs·value per
example) cannot use the MXU — Mosaic only lowers 2-D dots, and an M=1 dot
per example wastes the systolic array — so they run as chunked
broadcast-multiply + axis reductions on the VPU with f32 accumulation,
over the NATURAL [B,S,H] key layout: a pre-transposed [B,H,S] layout
makes the scores reduction a sublane reduce but costs a 17 MB relayout
outside the kernel every call, which measured slower end-to-end.

The emitted streams are exactly the minimal residual set of the custom-VJP
scan in ops/decoder.py (hidden, h_start, c_in0, per-cell z and c_p), so
this kernel slots in as the forward of ``decoder_scan_lstm`` with the same
XLA backward.  Reference semantics (speech_recognition/models/las.py:
361-379, 285-288): state threading through the cell stack, pad gating,
constant dropout masks — identical math, f32 gate arithmetic internally.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import batch_shards, bspec, pallas_backend_ok, shard_over_batch

# Attention-length reduction chunk.  models/las.py pads pk/value/bias ONCE to
# this multiple before calling, so the kernels never re-pad the 50 MB
# operands per call — keep the two in sync through this constant.
DEFAULT_CHUNK = 64


def decoder_pallas_supported(emb, pk, value, kernels) -> bool:
    """Shape/dtype gate: the kernel assumes lane-aligned dims and a batch
    that satisfies the bf16 sublane tile (per data-shard under a mesh)."""
    from .fallback import report_fallback

    decline = lambda reason, **kw: report_fallback("las_decoder", reason, **kw)
    if not pallas_backend_ok():
        return decline("backend is not TPU (SRT_PALLAS_FORCE=1 interprets)", loud=False)
    N, B, He = emb.shape
    _, S, H = pk.shape
    Dv = value.shape[-1]
    if emb.dtype != jnp.bfloat16:
        return decline(f"embedding dtype {emb.dtype} != bfloat16")
    shards = batch_shards(B)  # multi-device: kernels run per data-shard
    if shards is None:
        return decline(f"batch {B} not shardable over the data mesh axis")
    d, Bl = shards
    if Bl % 16 or H % 128 or He % 128 or Dv % 128:
        return decline(
            f"unaligned dims (local B {Bl} % 16, H {H} / emb {He} / value {Dv} % 128)"
        )
    # per-instance VMEM: resident pk/value blocks (per-shard), weight blocks
    # (qw + per-cell kernel/rkernel/bias/mask), f32 carry scratch, and the
    # per-step stream blocks (emb/mask/z/cp/hidden/...)
    resident = (pk.size + value.size) * 2 // d
    in_dim = He + Dv
    for k in kernels:
        resident += (k.size + k.shape[-1] * (H + 1)) * 2 + Bl * in_dim * 2
        in_dim = H
    resident += H * H * 2 + 2 * Bl * H * 4  # qw + f32 h/c scratch
    resident += Bl * (He + 2 * H + 4 * H * len(kernels)) * 2 * 2  # step blocks (x2 buffering)
    if resident > 72 * 2**20:
        return decline(f"VMEM estimate {resident >> 20} MB > 72 MB budget")
    return True


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _fwd_kernel(n_cells, n_steps, chunk, refs):
    n_in = 7 + 4 * n_cells + 3
    (
        emb_ref, mask_ref, pk_ref, value_ref, bias_ref, qw_ref, qb_ref,
        *cell_refs,
    ) = refs[:n_in]
    cell_refs, tail = cell_refs[: 4 * n_cells], cell_refs[4 * n_cells:]
    k_refs = cell_refs[0::4]
    r_refs = cell_refs[1::4]
    b_refs = cell_refs[2::4]
    cm_refs = cell_refs[3::4]
    outm_ref, h0_ref, c0_ref = tail
    outs = refs[n_in:-2]
    (hidden_ref, hstart_ref, cin0_ref, *zcp_refs) = outs[:-2]
    hlast_ref, clast_ref = outs[-2:]
    z_refs = zcp_refs[0::2]
    cp_refs = zcp_refs[1::2]
    h_scr, c_scr = refs[-2:]

    n = pl.program_id(0)
    B, H = h0_ref.shape
    S = value_ref.shape[1]
    Dv = value_ref.shape[2]

    @pl.when(n == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    hstart_ref[0] = h.astype(jnp.bfloat16)
    cin0_ref[0] = c.astype(jnp.bfloat16)

    # ---------------------------------------------------------- attention
    h_bf = h.astype(jnp.bfloat16)
    q = jnp.dot(h_bf, qw_ref[:], preferred_element_type=jnp.float32) + qb_ref[:].astype(jnp.float32)
    # chunked VPU batched-matvec over the natural [B,S,H] key layout (no
    # 17 MB relayout outside the kernel); the broadcast scalar stays f32
    # (Mosaic only supports minor-dim insertion for 32-bit types)
    q3 = jnp.expand_dims(q, 1)  # [B,1,H]
    scores = jnp.concatenate(
        [
            jnp.sum(q3 * pk_ref[:, sc:sc + chunk, :], axis=2)
            for sc in range(0, S, chunk)
        ],
        axis=1,
    )
    scores = scores + bias_ref[:]
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.zeros((B, Dv), jnp.float32)
    for sc in range(0, S, chunk):
        p_chunk = jnp.expand_dims(jax.lax.slice_in_dim(probs, sc, sc + chunk, axis=1), 2)
        ctx = ctx + jnp.sum(p_chunk * value_ref[:, sc:sc + chunk, :], axis=1)

    # ---------------------------------------------------------- cell stack
    # mask arrives lane-replicated as [B,H] (all H-sized quantities are
    # gated; lane-1 blocks are not lowerable on TPU)
    m = mask_ref[0].astype(jnp.float32)
    x = jnp.concatenate([emb_ref[0], ctx.astype(jnp.bfloat16)], axis=-1)
    for i in range(n_cells):
        x_in = x * cm_refs[i][:]
        z = (
            jnp.dot(x_in, k_refs[i][:], preferred_element_type=jnp.float32)
            + b_refs[i][:].astype(jnp.float32)
            + jnp.dot(h.astype(jnp.bfloat16), r_refs[i][:], preferred_element_type=jnp.float32)
        )
        z_refs[i][0] = z.astype(jnp.bfloat16)
        gi = _sigmoid(z[:, :H])
        gf = _sigmoid(z[:, H:2 * H])
        gg = jnp.tanh(z[:, 2 * H:3 * H])
        go = _sigmoid(z[:, 3 * H:])
        c_p = gf * c + gi * gg
        cp_refs[i][0] = c_p.astype(jnp.bfloat16)
        h_p = go * jnp.tanh(c_p)
        h = m * h_p + (1.0 - m) * h
        c = m * c_p + (1.0 - m) * c
        x = (h_p * m).astype(jnp.bfloat16)
    hidden_ref[0] = x * outm_ref[:]
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(n == n_steps - 1)
    def _():
        hlast_ref[:] = h.astype(jnp.bfloat16)
        clast_ref[:] = c.astype(jnp.bfloat16)


def _fwd_invoke(n_cells, chunk, *operands):
    # shapes derived INSIDE the (possibly shard_mapped) region: B is the
    # per-shard local batch under a multi-device mesh
    emb = operands[0]
    N, B, He = emb.shape
    _, S, H = operands[2].shape
    Dv = operands[3].shape[-1]
    bf = jnp.bfloat16

    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    step3 = lambda d: pl.BlockSpec((1, B, d), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [
        step3(He),            # emb
        step3(H),             # mask (lane-replicated)
        const(B, S, H),       # pk (natural layout)
        const(B, S, Dv),      # value
        const(B, S),          # attn_bias (f32)
        const(H, H),          # qw
        const(1, H),          # qb
    ]
    in_dim = He + Dv
    for i in range(n_cells):
        in_specs += [
            const(in_dim, 4 * H),   # kernel
            const(H, 4 * H),        # recurrent kernel
            const(1, 4 * H),        # bias
            const(B, in_dim),       # cell dropout mask
        ]
        in_dim = H
    in_specs += [const(B, H), const(B, H), const(B, H)]  # out_mask, h0, c0

    out_shape = [
        jax.ShapeDtypeStruct((N, B, H), bf),  # hidden
        jax.ShapeDtypeStruct((N, B, H), bf),  # h_start
        jax.ShapeDtypeStruct((N, B, H), bf),  # c_in0
    ]
    out_specs = [step3(H), step3(H), step3(H)]
    for _ in range(n_cells):
        out_shape += [
            jax.ShapeDtypeStruct((N, B, 4 * H), bf),  # z_i
            jax.ShapeDtypeStruct((N, B, H), bf),      # c_p_i
        ]
        out_specs += [step3(4 * H), step3(H)]
    out_shape += [jax.ShapeDtypeStruct((B, H), bf)] * 2  # h_last, c_last
    out_specs += [const(B, H), const(B, H)]

    kernel = functools.partial(_fwd_kernel, n_cells, N, chunk)

    return pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 2**20,
        ),
    )(*operands)


def decoder_fwd_pallas(
    emb, token_mask, pk, value, attn_bias, qw, qb, kernels, rkernels, biases,
    cell_masks, out_mask, h0, c0, chunk: int = DEFAULT_CHUNK,
):
    """Run the full teacher-forced decoder loop in one Pallas kernel.

    Returns the same structure as the XLA scan core in ops/decoder.py:
    ``((h_last, c_last), (hidden, h_start, c_in0, zs, c_ps))``.

    Deliberately NOT @jax.jit: the sharded-vs-direct dispatch in
    shard_over_batch reads the ACTIVE MESH global at trace time, and a
    module-level jit cache would not key on it (a call under a different
    mesh would silently reuse the stale trace).  Inside the train/eval
    steps this is inlined by the outer jit; direct callers (tools, tests)
    wrap it themselves if they need fusion.
    """
    N, B, He = emb.shape
    _, S, H = pk.shape
    n_cells = len(kernels)
    bf = jnp.bfloat16

    # pad the attention length to the reduction-chunk multiple; padded keys
    # are zero and the padded bias is -1e9, so softmax assigns them exactly
    # zero probability (exp underflows) and the context is unchanged
    S_pad = -(-S // chunk) * chunk
    if S_pad != S:
        pk = jnp.pad(pk, ((0, 0), (0, S_pad - S), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, S_pad - S), (0, 0)))
        attn_bias = jnp.pad(attn_bias, ((0, 0), (0, S_pad - S)), constant_values=-1e9)

    mask_rep = jnp.broadcast_to(token_mask.astype(bf), (N, B, H))  # lane-replicated

    operands = [
        emb, mask_rep, pk, value, attn_bias.astype(jnp.float32),
        qw, qb.reshape(1, H),
    ]
    in_dims = [1, 1, 0, 0, 0, None, None]
    for i in range(n_cells):
        operands += [kernels[i], rkernels[i], biases[i].reshape(1, 4 * H), cell_masks[i]]
        in_dims += [None, None, None, 0]
    operands += [out_mask, h0, c0]
    in_dims += [0, 0, 0]

    out_specs = [bspec(1, 3)] * (3 + 2 * n_cells) + [bspec(0, 2)] * 2

    outs = shard_over_batch(
        functools.partial(_fwd_invoke, n_cells, chunk), tuple(operands),
        in_dims, out_specs,
    )

    hidden, h_start, c_in0 = outs[0], outs[1], outs[2]
    zs = tuple(outs[3 + 2 * i] for i in range(n_cells))
    c_ps = tuple(outs[4 + 2 * i] for i in range(n_cells))
    h_last, c_last = outs[-2], outs[-1]
    return (h_last, c_last), (hidden, h_start, c_in0, zs, c_ps)


# ---------------------------------------------------------------- backward
def _bwd_kernel(n_cells, n_steps, chunk, He, refs):
    # 9 fixed + 4 per-cell (kT, rT, cm, pad) + 2 per-cell (z, cp) + out_mask
    n_in = 10 + 6 * n_cells
    (
        dhid_ref, mask_ref, probs_ref, cin0_ref, pk_ref, value_ref,
        qwT_ref, dhN_ref, dcN_ref, *rest,
    ) = refs[:n_in]
    cell_in, zcp_in = rest[: 4 * n_cells], rest[4 * n_cells:]
    kT_refs = cell_in[0::4]
    rT_refs = cell_in[1::4]
    cm_refs = cell_in[2::4]
    _pad_refs = cell_in[3::4]
    outm_ref = zcp_in[2 * n_cells]
    z_refs = zcp_in[0:2 * n_cells:2]
    cp_refs = zcp_in[1:2 * n_cells:2]
    outs = refs[n_in:-2]
    dz_refs = outs[:n_cells]
    demb_ref, dctx_ref, dscores_ref, dq_ref, dh0_ref, dc0_ref = outs[n_cells:]
    dh_scr, dc_scr = refs[-2:]

    n = pl.program_id(0)
    B, H = dh0_ref.shape
    S = value_ref.shape[1]
    Dv = value_ref.shape[2]

    @pl.when(n == 0)
    def _():
        dh_scr[:] = dhN_ref[:].astype(jnp.float32)
        dc_scr[:] = dcN_ref[:].astype(jnp.float32)

    dh = dh_scr[:]
    dc = dc_scr[:]
    m = mask_ref[0].astype(jnp.float32)  # [B,H] lane-replicated

    # reconstruct each cell's entering c from the single saved stream
    cins = [cin0_ref[0].astype(jnp.float32)]
    for i in range(1, n_cells):
        cins.append(m * cp_refs[i - 1][0].astype(jnp.float32) + (1.0 - m) * cins[i - 1])

    dxout = dhid_ref[0].astype(jnp.float32) * outm_ref[:].astype(jnp.float32)
    dh_cur, dc_cur = dh, dc
    for i in range(n_cells - 1, -1, -1):
        z = z_refs[i][0].astype(jnp.float32)
        gi = _sigmoid(z[:, :H])
        gf = _sigmoid(z[:, H:2 * H])
        gg = jnp.tanh(z[:, 2 * H:3 * H])
        go = _sigmoid(z[:, 3 * H:])
        tanh_cp = jnp.tanh(cp_refs[i][0].astype(jnp.float32))
        dh_p = m * dh_cur + m * dxout
        dh_prev = (1.0 - m) * dh_cur
        dc_p = m * dc_cur
        dc_prev = (1.0 - m) * dc_cur
        do = dh_p * tanh_cp
        dc_p = dc_p + dh_p * go * (1.0 - tanh_cp * tanh_cp)
        df = dc_p * cins[i]
        dc_prev = dc_prev + dc_p * gf
        di = dc_p * gg
        dg = dc_p * gi
        dz = jnp.concatenate(
            [di * gi * (1.0 - gi), df * gf * (1.0 - gf), dg * (1.0 - gg * gg), do * go * (1.0 - go)],
            axis=-1,
        )
        dz_bf = dz.astype(jnp.bfloat16)
        dz_refs[i][0] = dz_bf
        dh_prev = dh_prev + jnp.dot(dz_bf, rT_refs[i][:], preferred_element_type=jnp.float32)
        if i > 0:
            dh_cur = dh_prev
            dc_cur = dc_prev
            dxout = (
                jnp.dot(dz_bf, kT_refs[i][:], preferred_element_type=jnp.float32)
                * cm_refs[i][:].astype(jnp.float32)
            )
        else:
            dx0 = (
                jnp.dot(dz_bf, kT_refs[0][:], preferred_element_type=jnp.float32)
                * cm_refs[0][:].astype(jnp.float32)
            )
            demb_ref[0] = dx0[:, :He].astype(jnp.bfloat16)
            dctx = dx0[:, He:]
            dctx_ref[0] = dctx.astype(jnp.bfloat16)
            # attention backward: dprobs -> dscores -> dq -> dh chain
            probs = probs_ref[0].astype(jnp.float32)
            dctx3 = jnp.expand_dims(dctx, 1)  # [B,1,Dv]
            dprobs = jnp.concatenate(
                [
                    jnp.sum(dctx3 * value_ref[:, sc:sc + chunk, :], axis=2)
                    for sc in range(0, S, chunk)
                ],
                axis=1,
            )
            dscores = probs * (dprobs - jnp.sum(probs * dprobs, axis=-1, keepdims=True))
            dscores_ref[0] = dscores.astype(jnp.bfloat16)
            dq = jnp.zeros((B, H), jnp.float32)
            for sc in range(0, S, chunk):
                ds3 = jnp.expand_dims(
                    jax.lax.slice_in_dim(dscores, sc, sc + chunk, axis=1), 2
                )  # [B,chunk,1]
                dq = dq + jnp.sum(ds3 * pk_ref[:, sc:sc + chunk, :], axis=1)
            dq_ref[0] = dq.astype(jnp.bfloat16)
            dh_prev = dh_prev + jnp.dot(
                dq.astype(jnp.bfloat16), qwT_ref[:], preferred_element_type=jnp.float32
            )
            dh_scr[:] = dh_prev
            dc_scr[:] = dc_prev

    @pl.when(n == n_steps - 1)
    def _():
        dh0_ref[:] = dh_scr[:].astype(jnp.bfloat16)
        dc0_ref[:] = dc_scr[:].astype(jnp.bfloat16)


def _bwd_invoke(n_cells, chunk, He, *operands):
    # shapes derived INSIDE the (possibly shard_mapped) region: B is the
    # per-shard local batch under a multi-device mesh
    dhidden = operands[0]
    N, B, H = dhidden.shape
    S = operands[4].shape[1]
    Dv = operands[5].shape[-1]
    bf = jnp.bfloat16

    const = lambda *bs: pl.BlockSpec(bs, lambda n: (0,) * len(bs), memory_space=pltpu.VMEM)
    rev3 = lambda d: pl.BlockSpec(
        (1, B, d), lambda n: (n_steps_m1 - n, 0, 0), memory_space=pltpu.VMEM
    )
    n_steps_m1 = N - 1

    in_specs = [
        rev3(H),              # dhidden
        rev3(H),              # mask (lane-replicated)
        rev3(S),              # probs
        rev3(H),              # c_in0
        const(B, S, H),       # pk (natural layout: dq reduces over sublanes)
        const(B, S, Dv),      # value
        const(H, H),          # qw^T
        const(B, H),          # dh_last
        const(B, H),          # dc_last
    ]
    in_dim = He + Dv
    for i in range(n_cells):
        in_specs += [
            const(4 * H, in_dim),  # kernel^T
            const(4 * H, H),       # recurrent kernel^T
            const(B, in_dim),      # cell dropout mask
            const(1, H),           # per-cell placeholder (uniform grouping)
        ]
        in_dim = H
    for i in range(n_cells):
        in_specs += [rev3(4 * H), rev3(H)]  # z_i, cp_i
    in_specs += [const(B, H)]  # out_mask

    out_shape = [jax.ShapeDtypeStruct((N, B, 4 * H), bf) for _ in range(n_cells)]
    out_specs = [rev3(4 * H) for _ in range(n_cells)]
    out_shape += [
        jax.ShapeDtypeStruct((N, B, He), bf),   # demb
        jax.ShapeDtypeStruct((N, B, Dv), bf),   # dctx
        jax.ShapeDtypeStruct((N, B, S), bf),    # dscores
        jax.ShapeDtypeStruct((N, B, H), bf),    # dq
        jax.ShapeDtypeStruct((B, H), bf),       # dh0
        jax.ShapeDtypeStruct((B, H), bf),       # dc0
    ]
    out_specs += [rev3(He), rev3(Dv), rev3(S), rev3(H), const(B, H), const(B, H)]

    kernel = functools.partial(_bwd_kernel, n_cells, N, chunk, He)

    return pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 2**20,
        ),
    )(*operands)


def decoder_bwd_pallas(
    dhidden, dh_last, dc_last, token_mask, probs, c_in0, pk, value,
    qw, kernels, rkernels, cell_masks, out_mask, zs, c_ps, He,
    chunk: int = DEFAULT_CHUNK,
):
    """Reverse-time decoder backward loop in one Pallas kernel.

    pk/value stay VMEM-resident across all N steps (the XLA backward scan
    re-streams both from HBM per step for the attention VJP).  Emits the
    per-cell ``dz`` streams plus the attention-side streams (demb, dctx,
    dscores, dq); every weight gradient is formed afterwards by the same
    post-scan einsums as the XLA path (ops/decoder.py _decoder_bwd).

    Returns (dh0, dc0, dzs, demb, dctx, dscores, dq) — all f32-accurate,
    stored bf16.
    """
    N, B, H = dhidden.shape
    S = S_orig = pk.shape[1]
    n_cells = len(kernels)
    bf = jnp.bfloat16

    S_pad = -(-S // chunk) * chunk
    if S_pad != S:
        pk = jnp.pad(pk, ((0, 0), (0, S_pad - S), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, S_pad - S), (0, 0)))
        probs = jnp.pad(probs, ((0, 0), (0, 0), (0, S_pad - S)))
        S = S_pad

    mask_rep = jnp.broadcast_to(token_mask.astype(bf), (N, B, H))

    operands = [
        dhidden, mask_rep, probs.astype(bf), c_in0, pk, value,
        jnp.swapaxes(qw, 0, 1), dh_last, dc_last,
    ]
    in_dims = [1, 1, 1, 1, 0, 0, None, 0, 0]
    for i in range(n_cells):
        operands += [
            jnp.swapaxes(kernels[i], 0, 1), jnp.swapaxes(rkernels[i], 0, 1),
            cell_masks[i], jnp.zeros((1, H), bf),
        ]
        in_dims += [None, None, 0, None]
    for i in range(n_cells):
        operands += [zs[i], c_ps[i]]
        in_dims += [1, 1]
    operands += [out_mask]
    in_dims += [0]

    out_specs = [bspec(1, 3)] * (n_cells + 4) + [bspec(0, 2)] * 2

    outs = shard_over_batch(
        functools.partial(_bwd_invoke, n_cells, chunk, He), tuple(operands),
        in_dims, out_specs,
    )

    dzs = tuple(outs[:n_cells])
    demb, dctx, dscores, dq, dh0, dc0 = outs[n_cells:]
    if S != S_orig:
        dscores = dscores[..., :S_orig]  # padded columns are exactly zero
    return dh0, dc0, dzs, demb, dctx, dscores, dq
