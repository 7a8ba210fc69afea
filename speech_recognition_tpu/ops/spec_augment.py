"""SpecAugment (time warp, frequency masking, time masking) in JAX.

Reimplements the reference's spec_augment (reference: speech_recognition/
data.py:244-307) with explicit PRNG keys and static shapes so it can run
jitted on device over whole batches.

- Frequency / time masking follow the paper parameterization exactly
  (m_F masks of width U(0, F); m_T masks of width U(0, T) with the total
  masked time capped at p * num_time, as in reference data.py:282-301).
- Time warping matches tfa.image.sparse_image_warp semantics (reference
  data.py:275-280): a single interior control point at the center frequency
  row moved by U(-W, W), interpolated to a dense flow with an order-2
  polyharmonic (thin plate) spline pinned by 8 zero-flow boundary points,
  then a dense bilinear warp (ops/warp.py).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _mask_axis(key, x: jnp.ndarray, axis_len: int, max_width: int, axis: int, cap=None, applied=None):
    """Zero a random contiguous span of width U(0, max_width) along ``axis``."""
    kw, kp = jax.random.split(key)
    width = jax.random.randint(kw, (), 0, max_width)
    if cap is not None:
        width = jnp.minimum(width, jnp.maximum(cap - applied, 0))
    start = jax.random.randint(kp, (), 0, jnp.maximum(axis_len - width, 1))
    positions = jnp.arange(axis_len)
    keep = (positions < start) | (positions >= start + width)
    shape = [1] * x.ndim
    shape[axis] = axis_len
    return x * keep.reshape(shape).astype(x.dtype), width


def time_warp(key, audio: jnp.ndarray, W: int) -> jnp.ndarray:
    """SpecAugment time warp, tfa.sparse_image_warp semantics.

    A source frame w0 ~ U(W, T-W) at the center frequency row is moved to
    w0 + U(-W, W) through an order-2 polyharmonic spline warp with 8
    zero-flow boundary points — exactly the reference's call
    (data.py:275-280: single interior control point at (time, v//2),
    num_boundary_points=3).  The spline makes the displacement decay with
    distance from the center frequency row, unlike a rigid time shift.

    :param audio: [T, F, C] feature tensor
    :param W: warp distance parameter (paper's W)
    """
    from .warp import sparse_image_warp

    num_time, v = audio.shape[0], audio.shape[1]
    if num_time <= 2 * W + 1:
        return audio
    k_src, k_dst = jax.random.split(key)
    src = jax.random.randint(k_src, (), W, num_time - W)
    dst = src + jax.random.randint(k_dst, (), -W, W)

    src_pt = jnp.array([[0.0, v // 2]], jnp.float32).at[0, 0].set(src.astype(jnp.float32))
    dst_pt = jnp.array([[0.0, v // 2]], jnp.float32).at[0, 0].set(dst.astype(jnp.float32))
    return sparse_image_warp(audio, src_pt, dst_pt)


def make_spec_augment(
    v: int,
    W: Optional[int] = None,
    F: Optional[int] = None,
    m_F: Optional[int] = None,
    T: Optional[int] = None,
    p: Optional[float] = None,
    m_T: Optional[int] = None,
):
    """Build fn(key, audio [T, v, C]) -> augmented audio (reference data.py:244-307)."""
    use_time_warping = bool(W)
    use_frequency_masking = all([F, m_F])
    use_time_masking = all([T, p, m_T])

    def _fn(key, audio: jnp.ndarray, text=None):
        num_time = audio.shape[0]
        keys = jax.random.split(key, 1 + (m_F or 0) + (m_T or 0))
        ki = 0

        if use_time_warping:
            audio = time_warp(keys[0], audio, W)
        ki = 1

        if use_frequency_masking:
            for _ in range(m_F):
                audio, _ = _mask_axis(keys[ki], audio, v, F, axis=1)
                ki += 1

        if use_time_masking:
            applied = jnp.zeros((), jnp.int32)
            cap = jnp.asarray(int(num_time * p), jnp.int32)
            for _ in range(m_T):
                audio, width = _mask_axis(keys[ki], audio, num_time, T, axis=0, cap=cap, applied=applied)
                applied = applied + width
                ki += 1

        return audio if text is None else (audio, text)

    return _fn
