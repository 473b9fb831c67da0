"""Failure detection and elastic recovery for mesh-wide scans.

The reference is a single-process CPU library with no failure story
(SURVEY.md §5: "None (single process)"); the minimum requirement there is
the fail-fast ``init_multihost``. This module is the beyond-minimum tier:

- ``probe_mesh``     — active health check: a tiny per-device computation
                       plus a mesh-wide psum, each guarded by a watchdog
                       timeout so one hung chip cannot hang the probe.
- ``with_retry``     — transient-failure retry wrapper with backoff.
- ``surviving_mesh`` — rebuild a smaller 1-D data mesh from live devices.
- ``ElasticScanner`` — a DistScanner facade that, when a scan raises,
                       probes the mesh, re-meshes over survivors,
                       re-replicates the compiled tables, and retries the
                       scan on the smaller slice (tables are content-
                       addressed and tiny, so recovery cost is one
                       broadcast + one recompile).

Fault injection for tests/drills: ``inject_faults(n)`` arms the next ``n``
scan calls to raise ``InjectedFault`` before dispatch, exercising the full
detect -> remesh -> retry path on healthy hardware (the standard way to
test elastic recovery without killing chips).
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dist import DATA_AXIS, DistScanner, Mesh, shard_batch

__all__ = [
    "MeshHealth",
    "probe_mesh",
    "with_retry",
    "surviving_mesh",
    "ElasticScanner",
    "InjectedFault",
    "inject_faults",
]


class InjectedFault(RuntimeError):
    """Raised by armed fault injection (drills for the recovery path)."""


_injected = 0


def inject_faults(n: int) -> None:
    """Arm the next ``n`` ElasticScanner scans to fail before dispatch."""
    global _injected
    _injected = int(n)


def _take_fault() -> bool:
    global _injected
    if _injected > 0:
        _injected -= 1
        return True
    return False


@dataclass
class MeshHealth:
    ok: bool
    alive: List  # jax devices that answered the probe
    dead: List  # devices that timed out or raised
    latency_s: float = 0.0
    detail: str = ""


def _watchdog(fn: Callable, timeout_s: float):
    """Run ``fn`` on a daemon thread; return its result or raise TimeoutError.

    Deliberately NOT a ThreadPoolExecutor: leaving an executor's ``with``
    block joins the worker, so a device call hung inside ``fn`` would hang
    the caller forever — the exact failure the watchdog exists to bound.
    A timed-out daemon thread is abandoned instead (it cannot be cancelled,
    but it no longer blocks the probe or interpreter exit)."""
    box: list = []

    def _run():
        try:
            box.append((True, fn()))
        except Exception as e:  # pragma: no cover - device-dependent
            box.append((False, e))

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if not box:
        raise TimeoutError(f"watchdog: no answer within {timeout_s}s")
    ok, val = box[0]
    if not ok:
        raise val
    return val


def _probe_one(dev, timeout_s: float) -> bool:
    """One-device liveness: put + add + readback under a watchdog."""

    def _go():
        x = jax.device_put(jnp.arange(8, dtype=jnp.int32), dev)
        return int(jax.block_until_ready(x + 1)[0])

    try:
        return _watchdog(_go, timeout_s) == 1
    except Exception:
        return False


def probe_mesh(
    mesh: Mesh, *, timeout_s: float = 30.0, collective: bool = True
) -> MeshHealth:
    """Active failure detection over a mesh: per-device probes, then (if
    every device answered) a mesh-wide psum cross-check. A device that
    hangs is reported dead, not waited on forever."""
    t0 = time.perf_counter()
    devs = list(mesh.devices.flat)
    alive, dead = [], []
    for d in devs:
        (alive if _probe_one(d, timeout_s) else dead).append(d)
    detail = ""
    if not dead and collective and len(alive) > 1:
        # one psum across the mesh: catches interconnect faults that
        # per-device probes miss
        def _psum_check():
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            f = shard_map(
                lambda x: jax.lax.psum(x, mesh.axis_names[0]),
                mesh=mesh,
                in_specs=P(mesh.axis_names[0]),
                out_specs=P(),
            )
            x = jnp.ones((len(devs),), jnp.int32)
            out = jax.block_until_ready(jax.jit(f)(x))
            return int(np.asarray(out).reshape(-1)[0])

        try:
            if _watchdog(_psum_check, timeout_s) != len(devs):
                detail = "collective psum returned a wrong sum"
        except Exception as e:
            detail = f"collective psum failed: {e!r}"
    return MeshHealth(
        ok=not dead and not detail,
        alive=alive,
        dead=dead,
        latency_s=time.perf_counter() - t0,
        detail=detail,
    )


def with_retry(
    fn: Callable,
    *args,
    retries: int = 2,
    backoff_s: float = 1.0,
    exceptions: Tuple = (Exception,),
    **kw,
):
    """Call ``fn`` retrying transient failures with linear backoff."""
    err = None
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kw)
        except exceptions as e:  # pragma: no branch
            err = e
            if attempt < retries:
                time.sleep(backoff_s * (attempt + 1))
    raise err


def surviving_mesh(
    alive: Sequence, axis: str = DATA_AXIS, *, pow2: bool = False
) -> Mesh:
    """A fresh 1-D data mesh over the surviving devices (optionally
    truncated to a power of two for tiling-friendly shard counts)."""
    devs = list(alive)
    if not devs:
        raise RuntimeError("no surviving devices to build a mesh from")
    if pow2:
        n = 1
        while n * 2 <= len(devs):
            n *= 2
        devs = devs[:n]
    return Mesh(np.array(devs), (axis,))


@dataclass
class ElasticScanner:
    """DistScanner facade with detect -> remesh -> retry recovery.

    On a scan failure (device loss, interconnect fault, injected drill),
    probes the mesh, rebuilds the scanner over surviving devices, re-pads
    the batch to the new shard count, and retries. Raises the original
    error if no devices survive or the retry also fails.
    """

    prog: object
    mesh: Mesh
    axis: str = DATA_AXIS
    probe_timeout_s: float = 30.0
    max_recoveries: int = 2
    recoveries: int = field(default=0, init=False)

    def __post_init__(self):
        self._scanner = DistScanner(self.prog, self.mesh, self.axis)

    @property
    def n_devices(self) -> int:
        return int(np.prod(self._scanner.mesh.devices.shape))

    def _pad_to_mesh(self, data: np.ndarray, lengths: np.ndarray):
        n = self.n_devices
        B = data.shape[0]
        Bp = ((B + n - 1) // n) * n
        if Bp != B:
            data = np.concatenate(
                [np.asarray(data), np.zeros((Bp - B, data.shape[1]), np.uint8)]
            )
            lengths = np.concatenate(
                [np.asarray(lengths), np.zeros(Bp - B, np.int32)]
            )
        return data, lengths, B

    def _recover(self, err: Exception) -> None:
        if self.recoveries >= self.max_recoveries:
            raise err
        self.recoveries += 1
        health = probe_mesh(
            self._scanner.mesh, timeout_s=self.probe_timeout_s
        )
        alive = health.alive or list(self._scanner.mesh.devices.flat)
        if health.ok and isinstance(err, InjectedFault):
            # drill: hardware is fine — rebuild on the same mesh
            new_mesh = self._scanner.mesh
        else:
            new_mesh = surviving_mesh(alive, self.axis)
        self._scanner = DistScanner(self.prog, new_mesh, self.axis)

    def _run(self, name: str, data, lengths, **kw):
        data = np.asarray(data)
        lengths = np.asarray(lengths)
        err: Optional[Exception] = None
        for _ in range(self.max_recoveries + 1):
            try:
                if _take_fault():
                    raise InjectedFault("armed fault (drill)")
                d, l, B = self._pad_to_mesh(data, lengths)
                sc = self._scanner
                ds, ls = shard_batch(sc.mesh, d, l, self.axis)
                out = getattr(sc, name)(ds, ls, **kw)
                return out, B
            except Exception as e:  # device loss / drill
                err = e
                self._recover(e)
        raise err  # pragma: no cover - recover() re-raises first

    def _run_long(self, name: str, text, **kw):
        """Recovery wrapper for the ONE-long-string entry points (the
        sharded stream is rebuilt from host bytes on the new mesh, so a
        mid-scan device loss just replays the whole SPMD program)."""
        err: Optional[Exception] = None
        for _ in range(self.max_recoveries + 1):
            try:
                if _take_fault():
                    raise InjectedFault("armed fault (drill)")
                return getattr(self._scanner, name)(text, **kw)
            except Exception as e:  # device loss / drill
                err = e
                self._recover(e)
        raise err  # pragma: no cover - recover() re-raises first

    # -- recovered entry points (take host numpy, return host results) ----
    def global_stats(self, data, lengths):
        out, B = self._run("global_stats", data, lengths)
        total, nrec, nbytes = (int(np.asarray(x)) for x in out)
        # _pad_to_mesh appends zero-length phantom records; for a nullable
        # pattern each phantom contributes one empty match and one matched
        # record to the psum-reduced scalars — subtract them back out.
        n = self.n_devices  # mesh that ran the successful attempt
        pad = ((B + n - 1) // n) * n - B
        if pad and bool(getattr(self.prog, "nullable", False)):
            total -= pad
            nrec -= pad
        return total, nrec, nbytes

    def grep_hits(self, data, lengths):
        out, B = self._run("grep_hits", data, lengths)
        return np.asarray(out)[:B]

    def per_record(self, data, lengths):
        out, B = self._run("per_record", data, lengths)
        return tuple(np.asarray(x)[:B] for x in out)

    def per_record_spans(self, data, lengths, *, cap: int,
                         longest: bool = False):
        """Recovered sharded span extraction (starts, ends, count,
        overflow) — a device loss mid-extraction remeshes and replays."""
        out, B = self._run(
            "per_record_spans", data, lengths, cap=cap, longest=longest
        )
        return tuple(np.asarray(x)[:B] for x in out)

    def long_stats(self, text, *, mode: str = "count"):
        """Recovered sharded ONE-long-string stats (count/any)."""
        return self._run_long("long_stats", text, mode=mode)

    def long_count(self, text, **kw) -> int:
        return self._run_long("long_count", text, **kw)
