"""Distributed scan runtime: data-parallel corpus sharding over a device mesh.

The reference is single-process, single-core (SURVEY.md §1: "no scheduler, no
multi-thread/multi-process layer"); this layer is the capability BASELINE.json
demands instead: the corpus shards over a 1-D ``data`` mesh axis, compiled NFA
tables are **replicated** on every chip (broadcast once at engine build), the
per-shard scan runs under ``shard_map``, and scalar match statistics are
reduced with ``psum`` so every chip (and host) sees the global counts. The
collectives ride ICI within a slice / DCN across hosts — XLA inserts them from
the sharding annotations; there is no hand-written transport.

Multi-host bring-up uses ``jax.distributed.initialize()`` (see
``init_multihost``); single-host multi-chip and the CPU-mesh test harness
(``--xla_force_host_platform_device_count=N``) go through the same code path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compiler.program import DeviceProgram
from ..ops import scan_xla as sx

DATA_AXIS = "data"


def init_multihost(coordinator: Optional[str] = None, **kw) -> None:
    """Initialize jax.distributed for a multi-host run; fail fast on error
    (SURVEY.md §5: minimum failure-detection requirement)."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator_address=coordinator, **kw)
        else:
            jax.distributed.initialize(**kw)
    except Exception as e:  # pragma: no cover - env dependent
        raise RuntimeError(f"jax.distributed init failed: {e}") from e


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D data mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(
    mesh: Mesh, data: np.ndarray, lengths: np.ndarray, axis: str = DATA_AXIS
) -> Tuple[jax.Array, jax.Array]:
    """Place a packed [B, L] batch sharded over the data axis (B must divide
    evenly; callers pad B to a multiple of mesh size)."""
    ds = NamedSharding(mesh, P(axis, None))
    ls = NamedSharding(mesh, P(axis))
    return jax.device_put(data, ds), jax.device_put(lengths, ls)


class DistScanner:
    """Mesh-wide scanner: replicated tables, sharded records, psum'd stats.

    Owns jit caches for the shard_map'd scan functions. All entry points
    take **already encoded** class streams (see ``ScanEngine.encode``) so the
    byte->class translation also runs sharded on device.
    """

    def __init__(self, prog: DeviceProgram, mesh: Mesh, axis: str = DATA_AXIS):
        self.prog = prog
        self.mesh = mesh
        self.axis = axis
        tables = sx.device_tables(prog)
        # replicate tables on every chip (broadcast once, like the
        # "transition tables replicated" requirement of BASELINE config 5)
        rep = NamedSharding(mesh, P())
        self.tables = jax.tree.map(lambda x: jax.device_put(x, rep), tables)
        self._spec_in = P(axis, None)
        self._spec_v = P(axis)

    # ------------------------------------------------------------------
    def encode(self, data: jax.Array, lengths: jax.Array) -> jax.Array:
        p = self.prog

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(), self._spec_in, self._spec_v),
            out_specs=self._spec_in,
            check_vma=False,
        )
        def _enc(tables, d, l):
            return sx.encode_stream(
                tables, d, l, p.bos_class, p.eos_class, p.dead_class
            )

        return _enc(self.tables, data, lengths)

    # ------------------------------------------------------------------
    def global_stats(
        self, cls: jax.Array, lengths: jax.Array, *, seeded: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Global (total_matches, total_matched_records, total_bytes): the
        psum-reduced scalar statistics of BASELINE config 5. Returned arrays
        are fully replicated scalars."""
        nullable = self.prog.nullable

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(), self._spec_in, self._spec_v),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        def _stats(tables, c, l):
            cnt, _, anym = sx.match_stats(
                tables, c, l, seeded=seeded, nullable=nullable
            )
            total = jax.lax.psum(jnp.sum(cnt), self.axis)
            nrec = jax.lax.psum(jnp.sum(anym.astype(jnp.int32)), self.axis)
            nbytes = jax.lax.psum(jnp.sum(l), self.axis)
            return total, nrec, nbytes

        return _stats(self.tables, cls, lengths)

    # ------------------------------------------------------------------
    def per_record(
        self, cls: jax.Array, lengths: jax.Array, *, seeded: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Sharded per-record (count, first_end, any) — stays sharded for
        downstream span extraction on the owning chip."""
        nullable = self.prog.nullable

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(), self._spec_in, self._spec_v),
            out_specs=(self._spec_v, self._spec_v, self._spec_v),
            check_vma=False,
        )
        def _pr(tables, c, l):
            return sx.match_stats(tables, c, l, seeded=seeded, nullable=nullable)

        return _pr(self.tables, cls, lengths)

    # ------------------------------------------------------------------
    def grep_hits(self, cls: jax.Array, lengths: jax.Array) -> jax.Array:
        """[B] bool, sharded: record contains a match."""
        _, _, anym = self.per_record(cls, lengths, seeded=True)
        return anym
