"""Profiling / tracing utilities.

The reference's only perf instrumentation was the wall-clock-vs-sim-time
printout in ``render()`` (reference BaseAviary.py:408-416). Here profiling
is first-class: ``jax.profiler`` trace capture around any callable, a
steps/sec measurement harness, and a real-time-factor helper matching the
reference's readout.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def measure_steps_per_sec(fn, *args, n_warmup: int = 1, n_repeats: int = 3,
                          steps_per_call: int = 1, pipelined: bool = True,
                          batch: int = 8):
    """Throughput of a jitted callable. Returns (steps/s, seconds-per-call).

    ``n_repeats`` is ALWAYS the number of independent timing rounds (best
    taken), in both modes. ``pipelined=True`` (default, same methodology as
    bench.py): each round dispatches ``batch`` calls back-to-back and
    blocks once, so the host/tunnel round trip (~20 ms/call on this
    container's remote TPU) is amortized — this measures sustained device
    throughput. ``pipelined=False`` blocks per call and measures end-to-end
    latency instead (``batch`` is ignored).
    """
    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    if pipelined:
        batch = max(batch, 2)  # a batch of 1 cannot amortize the RTT
        for _ in range(n_repeats):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(batch)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / batch)
    else:
        for _ in range(n_repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
    return steps_per_call / best, best


class RealTimeFactor:
    """Wall-clock vs sim-time ratio (reference render():408-410)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.start = time.time()

    def factor(self, sim_time_sec: float) -> float:
        wall = max(time.time() - self.start, 1e-9)
        return sim_time_sec / wall
