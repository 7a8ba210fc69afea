"""VALID Conv2D with a time-space-to-depth fast path for stride-2 time.

A VALID conv whose time stride is 2 satisfies, for taps w[d] (d < kt):

    y[t'] = sum_d x[2t'+d] w[d] = sum_{p in {0,1}} sum_e x[2(t'+e)+p] w[2e+p]

so on the phase-split input xs[u, (p,c)] = x[2u+p, c] it becomes a
STRIDE-1 VALID conv with kernel k2[e, kf, (p,c), o] = w[2e+p, kf, c, o]
(taps zero-padded to an even count).  Stride-1 convs need no input
dilation in either gradient; XLA's dilated-correlation backward for the
original strided conv runs at ~15% MXU on DeepSpeech2's large kernels
(41x11 / 21x11: conv backward was ~33 ms of the 58 ms step —
tools/profile_ds2.py), while the phase-split chain measures 23.5 vs
44.0 ms fwd+bwd in isolation (tools/s2d_conv_bench.py).

``Conv2DValid`` is a drop-in for ``nn.Conv(..., padding="VALID")`` with an
identical parameter pytree ("kernel" [kt,kf,ci,co] lecun-normal, "bias"
[co] zeros — the Keras/TF layout the checkpoint converter maps onto;
reference conv stacks: speech_recognition/models/deepspeech2.py:47-59 and
models/las.py:159-164).  The weight rearrangement happens inside the
forward, so checkpoints and the converter are unaffected and autodiff
routes dW through the (exact) pad/reshape/transpose.

Gate: SRT_S2D_CONV=1 (default) uses the fast path on TPU when the time
stride is 2; "force" uses it on any backend (tests); "0" disables.
"""

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _s2d_enabled(time_stride: int, time_taps: int) -> bool:
    v = os.environ.get("SRT_S2D_CONV", "1")
    if v == "0" or time_stride != 2:
        return False
    if v == "force":
        return True
    # measured crossover (same-process step A/Bs): DS2's 41/21-tap convs
    # 57.8 -> 42.4 ms; LAS's 3-tap stem 36.7 -> 39.5 ms (XLA wins small
    # kernels).  Phase-split only pays when the dilated backward is the
    # dominant cost, i.e. for wide time kernels.
    return time_taps >= 8 and jax.default_backend() == "tpu"


def valid_conv2d(x, kernel, strides):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kernel, strides, "VALID", dimension_numbers=dn)


def _phase_split_time(x, kernel):
    """Rewrite (x, kernel) so a stride-2 conv over x's axis 1 becomes a
    stride-1 conv over the split pair.  Returns (xs, k2)."""
    B, T, F, C = x.shape
    kt, kf, ci, co = kernel.shape
    kt2 = (kt + 1) // 2
    if T % 2:
        # the pad frame is provably never read by the first t_out outputs
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
        T += 1
    xs = x.reshape(B, T // 2, 2, F, C).transpose(0, 1, 3, 2, 4).reshape(B, T // 2, F, 2 * C)
    wp = jnp.pad(kernel, ((0, 2 * kt2 - kt), (0, 0), (0, 0), (0, 0)))
    k2 = wp.reshape(kt2, 2, kf, ci, co).transpose(0, 2, 1, 3, 4).reshape(kt2, kf, 2 * ci, co)
    return xs, k2


def _phase_split_freq(x, kernel):
    """Same identity on the freq axis.  Because freq is adjacent to the
    channel axis, both rearrangements are CONTIGUOUS reshapes — no
    transpose/relayout (the axis-swapped variant cost a 2.1 ms dx
    relayout in conv0's backward at DS2 bench shapes)."""
    B, T, F, C = x.shape
    kt, kf, ci, co = kernel.shape
    kf2 = (kf + 1) // 2
    if F % 2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
        F += 1
    xs = x.reshape(B, T, F // 2, 2 * C)
    wp = jnp.pad(kernel, ((0, 0), (0, 2 * kf2 - kf), (0, 0), (0, 0)))
    k2 = wp.reshape(kt, kf2, 2 * ci, co)
    return xs, k2


def time_s2d_valid_conv2d(x, kernel, strides, split_freq: bool = False):
    """VALID conv with time stride 2 via the phase-split stride-1 form;
    optionally also phase-splits a stride-2 freq axis."""
    st, sf = strides
    assert st == 2, "phase-split form requires time stride 2"
    T, F = x.shape[1], x.shape[2]
    kt, kf = kernel.shape[0], kernel.shape[1]
    t_out = (T - kt) // 2 + 1
    x, kernel = _phase_split_time(x, kernel)
    if split_freq:
        assert sf == 2
        f_out = (F - kf) // 2 + 1
        x, kernel = _phase_split_freq(x, kernel)
        y = valid_conv2d(x, kernel, (1, 1))
        return y[:, :t_out, :f_out]
    y = valid_conv2d(x, kernel, (1, sf))
    # the phase conv can emit one extra step (even kt); slice to the exact
    # strided-conv output length
    return y[:, :t_out]


class Conv2DValid(nn.Module):
    """Drop-in for ``nn.Conv(features, kernel_size, strides, "VALID")``.

    Same parameter names/shapes/initializers as nn.Conv so existing
    checkpoints and the TF converter (compat/tf_checkpoint.py) see no
    difference; the only change is the compute path dispatch.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: str = "VALID"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.padding == "VALID"
        kt, kf = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kt, kf, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if _s2d_enabled(self.strides[0], kt):
            split_freq = self.strides[1] == 2 and kf >= 8
            y = time_s2d_valid_conv2d(x, kernel, tuple(self.strides), split_freq=split_freq)
        else:
            y = valid_conv2d(x, kernel, tuple(self.strides))
        return y + bias.astype(self.dtype)
