"""Honest timing + profiling helpers for async TPU dispatch.

The reference times with paired CUDA events + ``torch.cuda.synchronize``
(``ReLU-QP-py/reluqp/reluqpth.py:99-100,297-302``). On TPU, dispatch is
async: honest numbers require forcing execution inside the timed region.

Remote-tunnel caveat (docs/perf_notes.md): through tunneled backends
``jax.block_until_ready`` does not reliably block, and repeated identical
dispatches can be served from a cache. ``fetch`` / ``time_fn_fetched``
implement the robust protocol — end timing at a scalar ``device_get`` of
a result-dependent value, with fresh inputs per repetition.
"""
from __future__ import annotations

import contextlib
import math
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List

import jax

__all__ = ["Timer", "time_fn", "time_fn_fetched", "fetch",
           "two_point_step_time", "trace", "entropy_rng", "min_delta",
           "jit_chain_timer"]


def entropy_rng():
    """urandom-seeded ``np.random.RandomState`` for benchmark inputs.

    The tunnel memoizes identical dispatches ACROSS PROCESSES: a
    fixed-seed benchmark re-run replays cached results and reports
    phantom speedups (observed 2.5×). Every timed dispatch must use
    values that have never been dispatched before, by any process."""
    import os
    import numpy as np
    return np.random.RandomState(np.frombuffer(os.urandom(4), np.uint32)[0])


def fetch(x) -> float:
    """Force execution of ``x``'s computation via a scalar data fetch.

    Returns the sum of the first array leaf as a Python float — the fetch
    cannot complete before the device work ran (unlike
    ``block_until_ready`` through remote tunnels).
    """
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jax.device_get(jnp.sum(leaf)))


def time_fn_fetched(fn: Callable, args_maker: Callable[[int], tuple],
                    warmup: int = 1, reps: int = 5) -> Dict[str, float]:
    """Wall time of ``fn(*args_maker(i))`` with forced execution.

    ``args_maker(i)`` must return FRESH input values per call so repeated
    dispatches cannot be served from a tunnel-side cache.
    """
    for i in range(warmup):
        fetch(fn(*args_maker(-1 - i)))
    ts = []
    for i in range(reps):
        args = args_maker(i)
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return dict(best=ts[0], median=ts[len(ts) // 2],
                mean=sum(ts) / len(ts), reps=reps)


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



def min_delta(timed_lo: Callable[[], float],
              timed_hi: Callable[[], float], reps: int = 5) -> float:
    """``min(long samples) − min(short samples)`` over ``reps`` pairs.

    Tunnel congestion is strictly ADDITIVE noise (multi-second stalls
    observed), so the capability estimate is the per-side minimum: each
    side's min converges to its true time, while a median of paired
    deltas stays congested whenever most pairs are (and a min of paired
    deltas can go negative when only the short dispatch hits a stall).
    Every ``timed_*`` call must dispatch FRESH input values
    (``entropy_rng``) and force execution with a scalar device fetch.
    """
    t_los, t_his = [], []
    for _ in range(reps):
        t_los.append(timed_lo())
        t_his.append(timed_hi())
    return min(t_his) - min(t_los)


def jit_chain_timer(make_chain: Callable[[int], Callable],
                    args_of: Callable[[object], tuple],
                    fresh_input: Callable[[int], object]
                    ) -> Callable[[object, int], float]:
    """Adapt a jitted-chain builder to ``two_point_step_time``'s
    ``timed(x, n)`` contract.

    ``make_chain(n)`` returns a jitted function running an n-rep
    result-dependent on-device chain; ``args_of(x)`` maps a fresh input
    value to its argument tuple. Each chain length compiles once with an
    UNTIMED warm-up dispatch on its own fresh input — the warm-up must
    not reuse the timed call's value or the tunnel memoizes the pair and
    the timed dispatch replays the cached result.
    """
    fns: Dict[int, Callable] = {}

    def timed(x, n: int) -> float:
        f = fns.get(n)
        if f is None:
            f = fns[n] = make_chain(n)
            float(jax.device_get(f(*args_of(fresh_input(-n)))))
        t0 = time.perf_counter()
        float(jax.device_get(f(*args_of(x))))
        return time.perf_counter() - t0

    return timed


def two_point_step_time(timed: Callable[[object, int], float],
                        fresh_input: Callable[[int], object],
                        n_lo: int, n_hi: int, reps: int = 5,
                        noise_s: float = 2e-3,
                        jitter_s: float = 0.05) -> float:
    """Per-step time via the axon-safe two-point fit.

    ``timed(x, n)`` runs an n-step on-device chain on input ``x`` and
    returns elapsed seconds (it must force execution with a scalar
    ``jax.device_get``); ``fresh_input(j)`` must return a NEW input value
    for every call — never previously dispatched by ANY process (the
    tunnel memoizes identical dispatches across processes; use
    ``entropy_rng``). The fixed per-dispatch overhead cancels in
    ``t(n_hi) − t(n_lo)``, estimated as ``min_delta`` (min per side —
    congestion noise is additive). Callers compile both lengths before
    timing.

    When the delta does not clear the tunnel's ±40–60 ms dispatch
    jitter (``jitter_s``), the long chain is stretched 8× (one untimed
    compile pass first) and the fit retried; a delta still below the
    unmeasurable floor (``noise_s``) returns NaN — never a clamped
    fabrication.
    """
    if n_hi <= n_lo:
        raise ValueError(f"need n_hi > n_lo, got {n_lo} >= {n_hi}")
    ctr = [0]

    def fresh():
        ctr[0] += 1
        return fresh_input(ctr[0])

    def measure(nh):
        return min_delta(lambda: timed(fresh(), n_lo),
                         lambda: timed(fresh(), nh), reps)

    span = n_hi - n_lo
    d = measure(n_hi)
    if d < jitter_s:
        n_big = n_lo + span * 8
        timed(fresh(), n_big)        # compile pass, untimed
        span = n_big - n_lo
        d = measure(n_big)
        if d < noise_s:
            return float("nan")
    return d / span


def two_point_step_time_or_coarse(timed, fresh_input, n_lo, n_hi,
                                  **kw):
    """``two_point_step_time`` with a finite fallback for JSON emitters.

    Returns ``(sec_per_step, method)``. When the two-point fit is
    unmeasurable (NaN — the delta never cleared the tunnel's dispatch
    jitter), falls back to the overhead-INCLUSIVE long-chain time
    ``timed(x, n_hi) / n_hi`` — a biased-slow but finite upper bound,
    tagged ``method="coarse"`` so consumers can tell it apart from the
    overhead-cancelled ``method="two_point"`` number. Benchmark scripts
    that print machine-read JSON must stay valid JSON (NaN is not).

    ``fresh_input`` receives an index for compatibility, but callers
    should ignore it and draw a new ``entropy_rng`` perturbation per
    call (never-repeating values); the fallback just asks for one more
    fresh input."""
    d = two_point_step_time(timed, fresh_input, n_lo, n_hi, **kw)
    if math.isfinite(d):
        return d, "two_point"
    return timed(fresh_input(64), n_hi) / n_hi, "coarse"


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/reluqp_trace"):
    """``jax.profiler`` trace context; view with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
