"""Loud fallback reporting for the default-on fused fast paths.

Every fused Pallas kernel in this package is gated by a ``*_supported()``
shape/dtype/mesh/VMEM check, and when the gate declines the caller silently
runs the (correct, much slower) XLA path.  That silence cost two wasted
on-chip bench runs in one round alone (PERF.md round-14: the joint kernel's
odd-T' gate and the TSD top-k kernel's H % 128 gate both no-op'd without a
trace).  The reference has no analog — its CUDA kernels either run or raise
— but the failure mode here is worse than a crash: identical numbers,
10-30x the step time.

``report_fallback(kernel, reason)`` is the single funnel: it records the
event (``fallback_events()`` — what the gate-fires regression tests in
tests/test_fastpath_gates.py assert on) and logs it once per process per
(kernel, reason) pair.  Declines that are *actionable* — a default-on path
skipped for a shape/mesh/VMEM reason on a backend where it could have run —
log at WARNING; backend declines (CPU without SRT_PALLAS_FORCE, where no
fused path exists at all) log at INFO so host-side tooling stays quiet.

Gates return ``report_fallback(...)`` (always False) instead of a bare
``False`` so no decline can bypass the funnel.
"""

import threading
from typing import List, Tuple

_lock = threading.Lock()
_logged = set()
_events: List[Tuple[str, str]] = []


def report_fallback(kernel: str, reason: str, loud: bool = True) -> bool:
    """Record that fast path ``kernel`` declined to fire for ``reason``.

    Logs once per process per (kernel, reason): WARNING when ``loud`` (the
    decline is actionable — the kernel could have run on this backend),
    INFO otherwise.  Returns False so gates can ``return report_fallback(...)``.
    """
    from ...utils import get_logger

    key = (kernel, reason)
    with _lock:
        _events.append(key)
        if key in _logged:
            return False
        _logged.add(key)
    logger = get_logger("speech_recognition_tpu.fastpath")
    msg = (
        f"[fastpath] fused kernel '{kernel}' NOT firing: {reason}. "
        "Falling back to the XLA path (identical numbers, slower step)."
    )
    if loud:
        logger.warning(msg)
    else:
        logger.info(msg)
    return False


def fallback_events() -> Tuple[Tuple[str, str], ...]:
    """All (kernel, reason) declines recorded this process (tests)."""
    with _lock:
        return tuple(_events)


def reset_fallbacks() -> None:
    """Clear recorded events and the once-per-process log dedup (tests)."""
    with _lock:
        _events.clear()
        _logged.clear()
