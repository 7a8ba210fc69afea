"""Losses and metrics (pure functions over logits).

TPU-native counterpart of reference speech_recognition/measure.py.  All
reductions are computed in float32 regardless of the model's compute dtype
(the reference casts to fp32 the same way, measure.py:39).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def sparse_categorical_crossentropy(y_true, logits, ignore_index: int = 0):
    """Masked sparse CE from logits, averaged over non-pad positions
    (reference measure.py:4-21: boolean_mask + SUM_OVER_BATCH_SIZE).

    Computed as logsumexp(logits) - logits[y] rather than via log_softmax:
    mathematically identical, but log_softmax materializes a full [B, N, V]
    float32 tensor (~1 GB for the LAS-small bench shapes) that the fused
    reduction + gather form never writes to HBM.
    """
    y = y_true[..., None].astype(jnp.int32)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    gathered = jnp.take_along_axis(logits, y, axis=-1)[..., 0].astype(jnp.float32)
    nll = lse - gathered
    mask = (y_true != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sparse_categorical_accuracy(y_true, logits, ignore_index: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked accuracy as (correct_sum, count) for streaming aggregation
    (reference measure.py:45-69)."""
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    mask = y_true != ignore_index
    correct = jnp.sum(jnp.where(mask, (pred == y_true).astype(jnp.float32), 0.0))
    count = jnp.sum(mask.astype(jnp.float32))
    return correct, count


def ctc_loss(y_true, logits, blank_index: int, pad_index: int = 0):
    """CTC loss normalized by label length, averaged over valid rows
    (reference measure.py:24-42: full padded time as logit length).

    Rows with an empty label (all pad) are batch padding — short final
    batches are padded up to the static batch size with zero rows — and
    contribute neither loss nor gradient; the mean is taken over real rows
    only, matching the reference where padded rows never exist.

    :param y_true: [B, N] int labels, pad_index-padded
    :param logits: [B, T, V] float logits
    """
    logits = logits.astype(jnp.float32)
    label_paddings = (y_true == pad_index).astype(jnp.float32)
    logit_paddings = jnp.zeros(logits.shape[:2], jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, y_true, label_paddings, blank_id=blank_index)
    label_lengths = jnp.sum(1.0 - label_paddings, axis=-1)
    valid_row = (label_lengths > 0).astype(jnp.float32)
    per_seq = per_seq / jnp.maximum(label_lengths, 1.0) * valid_row
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(valid_row), 1.0)
