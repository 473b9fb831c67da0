"""Profiling / observability (SURVEY.md §5 "tracing" row).

The reference's entire observability story is one chrono printout and an
NFA dump (main.cpp:25-31, NFA.cc:14-41). Here:

* :class:`ScanTimer` — block_until_ready-bracketed wall timing with
  bytes/sec accounting and warmup/compile separation;
* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of the scan kernels;
* :func:`throughput_report` — per-tier sweep used by bench.py / CLI
  ``--stats``.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class ScanTimer:
    """Accumulates timed scan calls; distinguishes first (compile) call."""

    name: str = "scan"
    compile_s: Optional[float] = None
    times_s: List[float] = field(default_factory=list)
    bytes_done: int = 0

    def timed(self, fn, *args, nbytes: int = 0, **kw):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        dt = time.perf_counter() - t0
        if self.compile_s is None:
            self.compile_s = dt
        else:
            self.times_s.append(dt)
            self.bytes_done += nbytes
        return out

    @property
    def best_s(self) -> float:
        return min(self.times_s) if self.times_s else float("nan")

    def bytes_per_sec(self) -> float:
        if not self.times_s or not self.bytes_done:
            return 0.0
        per_call = self.bytes_done / len(self.times_s)
        return per_call / self.best_s

    def report(self) -> str:
        return (
            f"{self.name}: compile {self.compile_s:.2f}s, best "
            f"{self.best_s*1e3:.2f}ms, {self.bytes_per_sec()/1e9:.2f} GB/s"
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput_report(
    patterns: List[str], data, lengths, *, iters: int = 3
) -> Dict[str, float]:
    """bytes/sec per pattern over one packed batch (the per-tier harness)."""
    import jax.numpy as jnp

    from ..compiler.program import compile_program
    from ..engine import ScanEngine

    out: Dict[str, float] = {}
    d = jax.device_put(jnp.asarray(data))
    l = jax.device_put(jnp.asarray(lengths))
    nbytes = int(lengths.sum())
    for pat in patterns:
        prog = compile_program(pat)
        eng = ScanEngine(prog)
        timer = ScanTimer(name=f"{pat} [{prog.tier}/{eng.backend}]")
        fn = jax.jit(lambda d, l: eng.match_stats(d, l, seeded=True)[0].sum())
        for _ in range(iters + 1):
            timer.timed(fn, d, l, nbytes=nbytes)
        out[pat] = timer.bytes_per_sec()
        print(timer.report())
    return out
