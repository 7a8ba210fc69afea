"""Vocab-axis padding shim: keep the fused Pallas vocab kernels at
lane-unaligned vocab sizes (kspon's 8K sentencepiece model -> V=8000,
8000 % 128 = 64 — without this every fused vocab path declines and a
Korean config silently runs the slow XLA fallbacks).

All fused vocab kernels (ce_kernel, ctc_kernel, transducer_kernel,
band_kernel, topk_kernel, search_kernel) require V % 128 == 0 because V
is a lane dimension.  Padding the vocab *projection* is exact math:

- extra weight columns are zero and the extra bias entries are -1e30
  (finite in bf16 — exponent range matches f32), so padded logits sit at
  ~-1e30: exp() underflows to 0 in every logsumexp/softmax, and no
  argmax/top-k can select a pad column while any real column exists;
- label ids / gathers only ever touch indices < V, so iota-mask gathers
  and one-hot reductions are untouched;
- the pads are applied at the CALL SITE, *outside* the kernels'
  custom_vjp boundaries, so autodiff transposes ``jnp.pad`` into a slice
  and the padded dW/db columns are discarded automatically — the kernels
  and their gradient-equivalence pins are unchanged.

Padded-vocab equivalence (values AND grads vs the plain-XLA paths at
V % 128 != 0) is pinned in tests/test_vocab_pad.py (interpret mode).

Reference analog: none — the reference's TF kernels take any vocab size;
this is a TPU lane-alignment concern only (reference
speech_recognition/models/las.py:291 feeds Dense(vocab_size) directly).
"""

import jax.numpy as jnp

LANES = 128
PAD_BIAS = -1e30  # bf16-finite floor; matches the band kernel's convention


def vocab_pad_amount(V: int) -> int:
    """Columns needed to reach the next LANES multiple (0 if aligned)."""
    return (-V) % LANES


def pad_vocab_proj(W, b=None):
    """Pad a vocab projection ``W [..., V]`` (zero columns) and its bias
    ``b [V]`` (-1e30 entries) to V % 128 == 0.  Returns them unchanged
    when already aligned.  Apply OUTSIDE any custom_vjp so the gradient
    slice is automatic."""
    pad = vocab_pad_amount(W.shape[-1])
    if pad == 0:
        return W, b
    W = jnp.pad(W, [(0, 0)] * (W.ndim - 1) + [(0, pad)])
    if b is not None:
        b = jnp.pad(b, [(0, pad)], constant_values=jnp.asarray(PAD_BIAS, b.dtype))
    return W, b


def pad_vocab_rows(table):
    """Pad an id-indexed table ``[V, ...]`` (e.g. an embedding matrix) with
    zero rows to V % 128 == 0.  Safe because every id that can index it is
    produced by an argmax/top-k over pad-floored logits, hence < V."""
    pad = vocab_pad_amount(table.shape[0])
    if pad == 0:
        return table
    return jnp.pad(table, [(0, pad)] + [(0, 0)] * (table.ndim - 1))
