"""Tracing / profiling utilities.

Parity: the reference's hand-rolled wall-clock segmentation — a ``time_cost``
dict with stage buckets threaded through inference (eval.py:303-304,
gom_lstmatcher.py:273-289) plus per-video FPS prints — extended the TPU way
with ``jax.profiler`` traces (the reference has no torch.profiler/chrome-trace
support at all, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


STAGES = (
    "total_time",
    "pre_process",
    "backbone",
    "detector",
    "rescore",
    "tracker",
    "long_match",
    "short_match",
    "post_process",
)


def new_time_cost() -> Dict[str, float]:
    """Fresh stage-bucket dict with the reference's keys (eval.py:303-304)."""
    return {k: 0.0 for k in STAGES}


class StageTimer:
    """Accumulates wall-clock into a time_cost bucket:

        with StageTimer(tc, "detector"):
            ...work...
    """

    def __init__(self, time_cost: Dict[str, float], stage: str):
        self.tc = time_cost
        self.stage = stage

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.tc[self.stage] = self.tc.get(self.stage, 0.0) + time.time() - self.t0
        return False


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace (TensorBoard/XPlane format) when ``log_dir`` is set;
    no-op otherwise. View with ``tensorboard --logdir <dir>`` or xprof."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        yield
    finally:
        jax.profiler.stop_trace()


def fps_report(time_cost: Dict[str, float], n_frames: int) -> str:
    """The reference's aggregate print (eval.py:382-383)."""
    total = time_cost.get("total_time", 0.0)
    fps = n_frames / total if total > 0 else 0.0
    return f"total_time: {total:.2f} FPS: {fps:.2f}"
