"""Learning-rate schedule (linear warmup -> linear decay).

Parity with reference speech_recognition/utils.py:11-35, including the
``offset_steps`` shift used for epoch-skip resume.
"""

from typing import Optional

import jax.numpy as jnp


def linear_warmup_decay(
    total_steps: int,
    max_learning_rate: float,
    min_learning_rate: float,
    warmup_rate: float = 0.0,
    warmup_steps: Optional[int] = 0,
    offset_steps: int = 0,
):
    """Return schedule fn(step) -> lr, matching the reference formula."""
    warmup = int(total_steps * warmup_rate) + 1 if not warmup_steps else warmup_steps
    increasing_delta = max_learning_rate / warmup if warmup else 1e12
    # guard: with total_steps <= warmup (tiny smoke runs) there is no decay
    # phase; the reference formula would divide by zero (utils.py:20-22)
    decreasing_delta = (max_learning_rate - min_learning_rate) / max(total_steps - warmup, 1)

    def schedule(step):
        step = (jnp.asarray(step) + offset_steps).astype(jnp.float32)
        lr = jnp.minimum(
            step * increasing_delta, max_learning_rate - (step - warmup) * decreasing_delta
        )
        return jnp.maximum(lr, min_learning_rate)

    return schedule
