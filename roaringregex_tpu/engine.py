"""Scan-engine dispatcher: routes batched scans to the best backend.

Backends:

* ``xla``    -- pure-XLA lax.scan engine (ops/scan_xla.py): runs anywhere.
* ``pallas`` -- hand-written Pallas TPU kernels (ops/scan_pallas.py): the
  production path on TPU; falls back to interpret mode off-TPU.

The engine owns device table placement and the jit caches; the API layer
(api.py) owns string packing and span-pairing logic.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compiler.program import DeviceProgram, compile_program
from .ops import scan_xla as sx


def _default_backend() -> str:
    env = os.environ.get("RRX_BACKEND")
    if env:
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


class ScanEngine:
    """Per-program engine: holds device tables and exposes scan primitives."""

    def __init__(self, prog: DeviceProgram, backend: Optional[str] = None):
        self.prog = prog
        self.backend = backend or _default_backend()
        self.tables = sx.device_tables(prog)
        self._pallas = None
        if self.backend == "pallas":
            try:
                from .ops import scan_pallas as sp

                self._pallas = sp.PallasScanner(prog)
            except ImportError:  # pragma: no cover - pallas path unavailable
                self.backend = "xla"

    # ------------------------------------------------------------------
    # Stream encoding
    # ------------------------------------------------------------------
    def encode(self, data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        p = self.prog
        return sx.encode_stream(
            self.tables, data, lengths, p.bos_class, p.eos_class, p.dead_class
        )

    # ------------------------------------------------------------------
    # Primitives (all take/return device arrays)
    # ------------------------------------------------------------------
    def forward_flags(self, cls, *, seeded: bool) -> jnp.ndarray:
        if self._pallas is not None:
            return self._pallas.forward_flags(cls, seeded=seeded)
        return sx.forward_flags(self.tables, cls, seeded=seeded, n_seed_steps=2)

    def match_stats(self, cls, lengths, *, seeded: bool):
        if self._pallas is not None:
            return self._pallas.match_stats(cls, lengths, seeded=seeded)
        return sx.match_stats(
            self.tables, cls, lengths, seeded=seeded, nullable=self.prog.nullable
        )

    def reverse_hits(self, cls) -> jnp.ndarray:
        if self._pallas is not None:
            return self._pallas.reverse_hits(cls)
        return sx.reverse_hits(self.tables, cls)

    def first_end_from(self, cls, lengths, starts) -> jnp.ndarray:
        return sx.first_end_from(self.tables, cls, lengths, starts)

    # ------------------------------------------------------------------
    # Bitmaps
    # ------------------------------------------------------------------
    def ends_bitmap(self, cls, lengths, max_len: int) -> np.ndarray:
        flags = self.forward_flags(cls, seeded=True)
        return np.asarray(
            sx.ends_bitmap(flags, lengths, max_len, self.prog.nullable, seeded=True)
        )

    def starts_bitmap(self, cls, lengths, max_len: int) -> np.ndarray:
        hits = self.reverse_hits(cls)
        return np.asarray(
            sx.starts_bitmap(hits, lengths, max_len, self.prog.nullable)
        )

    def fullmatch_flags(self, cls, lengths) -> np.ndarray:
        """[B] bool whole-string acceptance."""
        flags = self.forward_flags(cls, seeded=False)
        B, T1 = flags.shape
        t = jnp.arange(T1)[None, :]
        n = lengths[:, None]
        e = jnp.clip(t - 1, 0, n)
        covers = (jnp.maximum(t - 1, 0) >= n) | (n == 0)
        return np.asarray((flags & (e == n) & covers).any(axis=1))
