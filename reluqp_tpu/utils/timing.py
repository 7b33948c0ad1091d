"""Honest timing + profiling helpers for async TPU dispatch.

The reference times with paired CUDA events + ``torch.cuda.synchronize``
(``ReLU-QP-py/reluqp/reluqpth.py:99-100,297-302``). On TPU, dispatch is
async and compile is cached per shape: honest numbers require
``jax.block_until_ready`` around a jit-warm call. These helpers make that
the easy path and expose ``jax.profiler`` traces for kernel-level study.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List

import jax

__all__ = ["Timer", "time_fn", "trace"]


@dataclass
class Timer:
    """Accumulating named wall-clock timer with device synchronization."""

    times: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        """Time a block; ``sync`` (optional pytree) is block_until_ready'd."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            n = len(ts)
            out[name] = dict(n=n, total=sum(ts), mean=sum(ts) / n,
                             min=min(ts), max=max(ts))
        return out


def time_fn(fn: Callable, *args, warmup: int = 1, reps: int = 10,
            **kwargs) -> Dict[str, float]:
    """Best/median/mean wall time of ``fn(*args)`` with jit warm-up.

    The function's output is ``block_until_ready``'d inside the timed
    region, so async dispatch cannot flatter the numbers.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return dict(best=ts[0], median=ts[len(ts) // 2],
                mean=sum(ts) / len(ts), reps=reps)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/reluqp_trace"):
    """``jax.profiler`` trace context; view with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
