"""Profiling / tracing utilities.

The reference instruments data-vs-model wall-clock with manual timers
(SURVEY.md §5). We keep that surface (utils/timer.py) and add the
TPU-native layer: jax.profiler traces viewable in XProf/TensorBoard and
simple device-memory reporting (the reference logs CUDA high-water marks,
evaluation/test_3DMatch.py:154).
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gmf_trace",
          annotate: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace around a code block.

    View with: tensorboard --logdir <log_dir> (Profile tab) or xprof.
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()


def annotation(name: str):
    """Named region inside a trace (nestable)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    """Live/peak HBM usage of a device (bytes), where the backend reports
    it (TPU does; CPU returns {})."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
