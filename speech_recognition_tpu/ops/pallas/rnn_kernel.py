"""Pallas TPU kernel: full-sequence LSTM/GRU forward pass.

The recurrent time loop is the framework's hottest region.  XLA compiles
``lax.scan`` into a device loop, but each iteration re-issues the small
recurrent matmul with loop bookkeeping.  This kernel runs the entire
sequence in ONE pallas_call:

- grid = (T,): TPU grid steps execute sequentially on a core, so the hidden
  state lives in VMEM scratch across steps;
- the hoisted input projections x_proj [T, B, G*H] stream HBM -> VMEM one
  step per grid iteration through the BlockSpec pipeline (double-buffered by
  Pallas);
- the recurrent weights [H, G*H] are pinned in VMEM for the whole sequence;
- gate math runs on the VPU right next to the MXU matmul.

Forward-only: training takes gradients through the lax.scan path
(ops/rnn.py); decoding/eval are inference-only and can use this kernel on
TPU.  Numerical parity with the scan path is tested in interpret mode
(tests/test_pallas_rnn.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(x_ref, mask_ref, rk_ref, h0_ref, c0_ref, out_ref, hl_ref, cl_ref, h_scr, c_scr):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    x = x_ref[0]  # [B, 4H] (input bias already folded in)
    # gate math in f32: Mosaic rejects bf16 transcendentals (f32-scalar
    # broadcast into a bf16 vector), and f32 is numerically better anyway
    z = x.astype(jnp.float32) + jnp.dot(h, rk_ref[:], preferred_element_type=jnp.float32)
    H = h.shape[-1]
    zi, zf, zc, zo = z[:, :H], z[:, H : 2 * H], z[:, 2 * H : 3 * H], z[:, 3 * H :]
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    c_new = (f * c.astype(jnp.float32) + i * jnp.tanh(zc)).astype(h.dtype)
    o = jax.nn.sigmoid(zo)
    h_new = (o * jnp.tanh(c_new.astype(jnp.float32))).astype(h.dtype)

    m = mask_ref[0].astype(h.dtype)  # [B, 1]
    h_scr[:] = m * h_new + (1.0 - m) * h
    c_scr[:] = m * c_new + (1.0 - m) * c
    out_ref[0] = h_new * m

    @pl.when(t == T - 1)
    def _final():
        hl_ref[:] = h_scr[:]
        cl_ref[:] = c_scr[:]


def _gru_kernel(x_ref, mask_ref, rk_ref, rb_ref, h0_ref, out_ref, hl_ref, h_scr):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    x = x_ref[0].astype(jnp.float32)  # [B, 3H] with input bias folded in
    inner = jnp.dot(h, rk_ref[:], preferred_element_type=jnp.float32) + rb_ref[0].astype(jnp.float32)
    H = h.shape[-1]
    xz, xr, xh = x[:, :H], x[:, H : 2 * H], x[:, 2 * H :]
    rz, rr, rh = inner[:, :H], inner[:, H : 2 * H], inner[:, 2 * H :]
    z = jax.nn.sigmoid(xz + rz)
    r = jax.nn.sigmoid(xr + rr)
    hh = jnp.tanh(xh + r * rh)
    h_new = (z * h.astype(jnp.float32) + (1.0 - z) * hh).astype(h.dtype)

    m = mask_ref[0].astype(h.dtype)
    h_scr[:] = m * h_new + (1.0 - m) * h
    out_ref[0] = h_new * m

    @pl.when(t == T - 1)
    def _final():
        hl_ref[:] = h_scr[:]


def _time_index_map(reverse: bool, T: int):
    if reverse:
        return lambda t: (T - 1 - t, 0, 0)
    return lambda t: (t, 0, 0)


@functools.partial(jax.jit, static_argnames=("rnn_type", "reverse", "interpret"))
def rnn_sequence_pallas(
    rnn_type: str,
    x_proj: jnp.ndarray,
    mask: jnp.ndarray,
    recurrent_kernel: jnp.ndarray,
    recurrent_bias: Optional[jnp.ndarray] = None,
    initial_state: Optional[Tuple[jnp.ndarray, ...]] = None,
    reverse: bool = False,
    interpret: bool = False,
):
    """Run a full RNN sequence in one Pallas kernel.

    :param x_proj: [T, B, G*H] hoisted input projections (input bias included)
    :param mask: [T, B, 1] validity mask (bool or float)
    :param recurrent_kernel: [H, G*H]
    :param recurrent_bias: [G*H] (GRU reset_after recurrent bias)
    :param initial_state: (h0,) or (h0, c0), defaults to zeros
    :return: (outputs [T, B, H] — masked steps emit zeros, final_state tuple)
    """
    T, B, GH = x_proj.shape
    gates = {"lstm": 4, "gru": 3}[rnn_type]
    H = GH // gates
    dtype = x_proj.dtype
    mask = mask.astype(dtype)

    if initial_state is None:
        zeros = jnp.zeros((B, H), dtype)
        initial_state = (zeros, zeros) if rnn_type == "lstm" else (zeros,)
    initial_state = tuple(s.astype(dtype) for s in initial_state)

    x_spec = pl.BlockSpec((1, B, GH), _time_index_map(reverse, T), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, B, 1), _time_index_map(reverse, T), memory_space=pltpu.VMEM)
    rk_spec = pl.BlockSpec((H, GH), lambda t: (0, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, B, H), _time_index_map(reverse, T), memory_space=pltpu.VMEM)

    if rnn_type == "lstm":
        outputs, h_last, c_last = pl.pallas_call(
            _lstm_kernel,
            grid=(T,),
            in_specs=[x_spec, m_spec, rk_spec, st_spec, st_spec],
            out_specs=[out_spec, st_spec, st_spec],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, H), dtype),
                jax.ShapeDtypeStruct((B, H), dtype),
                jax.ShapeDtypeStruct((B, H), dtype),
            ],
            scratch_shapes=[pltpu.VMEM((B, H), dtype), pltpu.VMEM((B, H), dtype)],
            interpret=interpret,
        )(x_proj, mask, recurrent_kernel, initial_state[0], initial_state[1])
        return outputs, (h_last, c_last)

    if rnn_type == "gru":
        if recurrent_bias is None:
            recurrent_bias = jnp.zeros((GH,), dtype)
        rb_spec = pl.BlockSpec((1, GH), lambda t: (0, 0), memory_space=pltpu.VMEM)
        outputs, h_last = pl.pallas_call(
            _gru_kernel,
            grid=(T,),
            in_specs=[x_spec, m_spec, rk_spec, rb_spec, st_spec],
            out_specs=[out_spec, st_spec],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, H), dtype),
                jax.ShapeDtypeStruct((B, H), dtype),
            ],
            scratch_shapes=[pltpu.VMEM((B, H), dtype)],
            interpret=interpret,
        )(x_proj, mask, recurrent_kernel, recurrent_bias.reshape(1, GH).astype(dtype), initial_state[0])
        return outputs, (h_last,)

    raise ValueError(f"unsupported rnn_type for pallas kernel: {rnn_type}")
