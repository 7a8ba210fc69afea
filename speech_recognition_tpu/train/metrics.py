"""Depth-bounded asynchronous metric accumulation.

The reference's Keras ``fit`` loop never syncs on per-step metrics — they
are averaged device-side and fetched at the progbar/log cadence
(reference run/train.py:200-217). The naive JAX equivalent
``running[k] += float(v)`` forces a host round-trip on EVERY step, which
serializes step dispatch against device execution (on this environment the
per-fetch latency is exactly what bench.py's chain-subtraction methodology
exists to cancel out of the record — the real train loop must not pay it
either).

``AsyncMetricAccumulator`` keeps the last ``depth`` steps' metric dicts as
un-fetched device scalars, folding the oldest into host-side running totals
only once it is ``depth`` steps stale (by which point the device has long
finished computing it, so the fetch returns without stalling the step
chain). ``depth`` also bounds how many dispatched-but-unconsumed steps can
pile up behind the host loop — each in-flight step pins its input batch in
HBM, so the bound is a memory guarantee, not just a latency trick.
"""

from collections import deque


class AsyncMetricAccumulator:
    """Accumulate per-step metric dicts without per-step host syncs.

    push(metrics): queue one step's device-scalar dict; folds the oldest
        queued step into the running totals once more than ``depth`` are
        pending (one stacked fetch per fold, on long-completed data).
    totals(): drain everything pending and return {key: summed float}.
    """

    def __init__(self, depth: int = 8):
        self.depth = depth
        self._pending = deque()
        self._totals = {}

    def push(self, metrics) -> None:
        import jax.numpy as jnp

        # pre-stack the (tiny) scalars now: one extra async device op per
        # step, and the later fold needs only a single buffer fetch
        self._pending.append((tuple(metrics.keys()), jnp.stack([v for v in metrics.values()])))
        if len(self._pending) > self.depth:
            self._fold(*self._pending.popleft())

    def _fold(self, keys, stacked) -> None:
        import numpy as np

        values = np.asarray(stacked)  # ONE host fetch for the whole dict
        for key, value in zip(keys, values):
            self._totals[key] = self._totals.get(key, 0.0) + float(value)

    def totals(self) -> dict:
        while self._pending:
            self._fold(*self._pending.popleft())
        return self._totals
