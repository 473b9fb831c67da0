"""Scan-engine dispatcher: routes batched scans to the best backend.

Backends:

* ``xla``    -- unpacked fused-matmul lax.scan engine (ops/scan_xla.py):
  runs anywhere, any tier; the portable reference implementation.
* ``packed`` -- lane-packed engine (ops/scan_packed.py): G records per MXU
  row + precomputed bit-packed mask streams; dense tiers. Pure XLA, so it
  also runs anywhere, but it is shaped for the TPU MXU.
* ``pallas`` -- hand-written Pallas TPU kernels (ops/scan_pallas.py) over
  the same packed layout; the production path on TPU.

Engine primitives take **raw byte batches** (data [B, L] uint8 + lengths):
the byte->mask translation runs fused and gather-free on device
(scan_packed.mask_stream_from_bytes) — TPU gathers are ~100x slower than
the run-compare encoder, so class-id streams are only materialized for the
unpacked fallback paths.

The engine owns device table placement and the jit caches; the API layer
(api.py) owns string packing and span-pairing logic.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .compiler.program import DeviceProgram
from .ops import scan_xla as sx


def seeded_alias_program(prog: DeviceProgram):
    """DeviceProgram for the X{m,} alias of a whole-pattern X{m,n} on a
    big-automaton tier, or None.

    Under SEEDED semantics (match may start anywhere) the upper
    repetition bound is unobservable: any chain of L >= m consecutive
    X-matches ending (or starting) at a position contains a min(L, n)-copy
    sub-chain ending (starting) there, so the ends, starts, count,
    first-end and lazy-span sets of ``X{m,n}`` equal those of ``X{m,}`` —
    and the n-fold Glushkov position blowup that forces the >1024-state
    container tier (the family the reference's Roaring tier exists for,
    Parser.cpp:165-168) collapses to the m-copy automaton. Unseeded
    scans (fullmatch, anchored greedy rescans) must keep the original
    program — the bound is observable there. Shared by ScanEngine
    (batched records) and make_long_scanner (one long string)."""
    if prog.tier not in ("multiblock", "sparse"):
        return None
    from .utils.config import get_config

    if not get_config().seeded_alias:
        return None
    from .ops.scan_pallas import counting_plan

    if counting_plan(prog) is not None:
        return None  # run-length tier already collapses it
    try:
        from .compiler.parser import BOS, EOS, Concat, Lit, Repeat, parse

        node = parse(prog.pattern)
        while isinstance(node, Concat) and len(node.parts) == 1:
            node = node.parts[0]
        if not (
            isinstance(node, Repeat) and node.hi is not None and node.lo >= 1
        ):
            return None

        def has_anchor(nd):
            if isinstance(nd, Lit):
                return BOS in nd.syms or EOS in nd.syms
            parts = getattr(nd, "parts", None) or (
                (nd.child,) if isinstance(nd, Repeat) else ()
            )
            return any(has_anchor(p) for p in parts)

        if has_anchor(node.child):
            return None
        from .compiler.nfa import build_nfa_ast
        from .compiler.program import compile_program

        alias_ast = Repeat(node.child, node.lo, None)
        nfa = build_nfa_ast(alias_ast, f"<seeded-alias:{prog.pattern}>")
        if nfa.nullable or nfa.n_states > 256:
            return None
        if nfa.n_states * 2 > prog.n_states:
            return None  # not actually a blowup collapse
        return compile_program(nfa)
    except Exception:  # pragma: no cover - alias is best-effort
        return None


def relaxed_prefilter_program(prog: DeviceProgram):
    """Tiny superset-language program for hyperscan-style prefiltering of
    the sparse container tier, or None.

    Replacing every bounded repeat ``X{m,n}`` with ``X{min(m,4),}``
    relaxes the language to a SUPERSET (a chain of m..n copies is also a
    chain of >= min(m,4) copies when m >= 4), so ``search(P') == False`` proves
    ``search(P) == False`` — and P' collapses the n-fold position blowup
    to a handful of states. The engine scans P' at word/SWAR-tier rate,
    compacts the (typically rare) candidate records, and runs the
    >1024-state container kernels only on those. Unlike the seeded alias
    (exact, whole-pattern only) this works with arbitrary context around
    the repeats, because it is only used as a filter."""
    if prog.tier != "sparse" or prog.nullable:
        return None
    from .utils.config import get_config

    if not get_config().sparse_prefilter:
        return None
    try:
        from .compiler.parser import Alt, Concat, Repeat, parse

        changed = []

        def relax(nd):
            if isinstance(nd, Repeat):
                child = relax(nd.child)
                if nd.hi is not None and nd.hi > 1:
                    changed.append(True)
                    # keep up to 4 required copies: a chain of m..n copies
                    # is a chain of >= min(m, 4) copies (superset), and
                    # the extra required copies slash false positives
                    return Repeat(child, min(nd.lo, 4), None)
                return Repeat(child, nd.lo, nd.hi)
            if isinstance(nd, Concat):
                return Concat(tuple(relax(p) for p in nd.parts))
            if isinstance(nd, Alt):
                return Alt(tuple(relax(p) for p in nd.parts))
            return nd

        ast = relax(parse(prog.pattern))
        if not changed:
            return None
        from .compiler.nfa import build_nfa_ast
        from .compiler.program import compile_program

        nfa = build_nfa_ast(ast, f"<prefilter:{prog.pattern}>")
        if nfa.nullable or nfa.n_states > 64:
            return None
        return compile_program(nfa)
    except Exception:  # pragma: no cover - prefilter is best-effort
        return None


def _default_backend(tier: str) -> str:
    env = os.environ.get("RRX_BACKEND")
    if env:
        return env
    if jax.default_backend() == "tpu":
        return "pallas"  # sparse tier falls back inside if too dense
    return "xla" if tier == "sparse" else "packed"


class ScanEngine:
    """Per-program engine: holds device tables and exposes scan primitives."""

    _cache_enabled = False

    @classmethod
    def _enable_compile_cache(cls, cache_dir: Optional[str]) -> None:
        if cls._cache_enabled or not cache_dir:
            return
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        cls._cache_enabled = True

    def __init__(
        self,
        prog: DeviceProgram,
        backend: Optional[str] = None,
        *,
        accept_map: Optional[np.ndarray] = None,
        channels_per_record: int = 1,
        nullable: Optional[bool] = None,
        subprograms=None,
    ):
        """``accept_map`` ([lanes, C] 0/1) widens the accept reduction to C
        accept channels per packed row (C = G * channels_per_record) — the
        first-class multi-pattern interface (one combined automaton, one
        scan, per-pattern stats). ``nullable`` overrides the kernel-level
        nullability (multi-pattern scans disable it and correct nullable
        channels host-side). ``subprograms`` (per-pattern DevicePrograms,
        optional) lets the engine run the combined grep scan as slotted
        SWAR (4 tiny sub-automata per u32) when every pattern fits."""
        from .utils.config import get_config

        cfg = get_config()
        self._enable_compile_cache(cfg.compile_cache_dir)
        self.prog = prog
        self.backend_requested = backend  # None = tier default (alias uses it)
        self.backend = backend or cfg.backend or _default_backend(prog.tier)
        if self.backend == "packed" and prog.tier == "sparse":
            self.backend = "xla"
        self.tables = sx.device_tables(prog)
        self.n_runs = len(prog.byte_runs[0])
        self.P = channels_per_record
        self._nullable = prog.nullable if nullable is None else nullable
        self._ptables = None
        self._pallas = None
        self._counting = None
        if (
            self.backend == "pallas"
            and accept_map is None
            and channels_per_record == 1
            and prog.G <= 1  # any one-record-per-row tier: the lanes^2
            # matmul (or container expansion) loses to run-length counting
        ):
            from .ops import scan_pallas as spl

            self._counting = spl.counting_plan(prog)
        if self._counting is not None:
            from .ops import scan_pallas as spl

            # run-length (counting) tier: fixed-length-body X{m,n}
            # repetitions collapse to one int32 per record — no follow matmul, no
            # sparse-container kernels, no VMEM caps (the family the
            # reference's broken Roaring tier targets, Parser.cpp:165-168)
            self._pallas = spl.CountScanner(
                prog, self._counting, nullable=nullable
            )
            if prog.tier != "sparse":
                from .ops import scan_packed as sp

                # packed tables back the anchored-rescan / span fallbacks
                self._sp = sp
                self._ptables = sp.packed_tables(prog)
        elif self.backend == "pallas" and prog.tier == "sparse":
            from .ops import scan_bitband as sbb

            bspec = sbb.bitband_spec(prog) if cfg.bitband else None
            npart = len(prog.sparse_partition[0])
            if bspec is not None and prog.s_pad <= cfg.sparse_lanes_max:
                from .ops import scan_packed as sp

                # band+rank-1 bit kernels: the follow structure collapses
                # to u32 shifts on the VPU (~10x the container kernels'
                # byte rate on the x(ab|c){400,520}y class)
                self._sp = sp
                self._ptables = sp.stream_tables(prog)
                sparse_am = (
                    np.asarray(accept_map) if accept_map is not None else None
                )
                self._pallas = sbb.BitbandScanner(
                    prog,
                    self._ptables,
                    bspec,
                    accept_map=sparse_am,
                    nullable=nullable,
                )
            elif (
                npart > cfg.sparse_partial_max
                or prog.s_pad > cfg.sparse_lanes_max
            ):
                import logging

                logging.getLogger(__name__).warning(
                    "rrx: sparse automaton (%d partial blocks, %d lanes) "
                    "exceeds the pallas VMEM caps "
                    "(sparse_partial_max=%d, sparse_lanes_max=%d); "
                    "falling back to the XLA backend",
                    npart, prog.s_pad,
                    cfg.sparse_partial_max, cfg.sparse_lanes_max,
                )
                self.backend = "xla"  # structure too dense for VMEM
            else:
                from .ops import scan_packed as sp
                from .ops import scan_pallas as spl

                self._sp = sp
                self._ptables = sp.stream_tables(prog)
                self._pallas = spl.SparseScanner(
                    prog,
                    self._ptables,
                    accept_map=accept_map,
                    nullable=nullable,
                )
        elif self.backend in ("packed", "pallas"):
            from .ops import scan_packed as sp

            self._sp = sp
            self._ptables = sp.packed_tables(prog)
            if accept_map is not None:
                import jax.numpy as _jnp

                self._ptables = dict(self._ptables)
                self._ptables["A"] = _jnp.asarray(accept_map, _jnp.bfloat16)
                # numpy copy for scanner-side layout transforms (avoids a
                # device->host fetch in PallasScanner.__init__)
                self._ptables["A_np"] = np.asarray(accept_map)
            if self.backend == "pallas":
                from .ops import scan_pallas as spl

                if self._multiblock_container_wins(prog, cfg):
                    # banded multiblock follow structure: the dense
                    # lanes^2 matmul wastes the MXU (VERDICT r1 #5);
                    # prefer the bit-packed band kernels when the
                    # structure decomposes, containers otherwise
                    sparse_am = None
                    if accept_map is not None:
                        sparse_am = np.asarray(accept_map)
                    from .ops import scan_bitband as sbb

                    bspec = (
                        sbb.bitband_spec(prog) if cfg.bitband else None
                    )
                    if bspec is not None:
                        self._pallas = sbb.BitbandScanner(
                            prog,
                            sp.stream_tables(prog),
                            bspec,
                            accept_map=sparse_am,
                            nullable=nullable,
                        )
                    else:
                        self._pallas = spl.SparseScanner(
                            prog,
                            sp.stream_tables(prog),
                            accept_map=sparse_am,
                            nullable=nullable,
                        )
                else:
                    swar = None
                    if accept_map is None and channels_per_record == 1 and cfg.swar:
                        from .ops import scan_swar as ssw

                        if ssw.swar_spec(prog) is not None:
                            # tiny-automaton fast path: 4 records per u32
                            # lane, bit-exact SWAR transitions (the
                            # reference's u64 word tier, Parser.cpp:165-168,
                            # as vector SWAR)
                            swar = ssw.SwarScanner(
                                prog, self._ptables, nullable=nullable
                            )
                    if (
                        swar is None
                        and cfg.swar
                        and cfg.swar_multi
                        and accept_map is not None
                        and subprograms
                        and channels_per_record == len(subprograms)
                    ):
                        from .ops import scan_swar as ssw

                        ms = ssw.swar_multi_spec(subprograms)
                        if ms is not None:
                            # 4 patterns per u32: the combined grep scan
                            # keeps SWAR density instead of one record
                            # per u32 lane (VERDICT r4 #3)
                            swar = ssw.SwarMultiScanner(
                                prog,
                                self._ptables,
                                ms,
                                channels_per_record,
                                nullable=nullable,
                            )
                    if swar is None and cfg.swar:
                        from .ops import scan_word as ssw32

                        if (
                            ssw32.word_spec(
                                prog,
                                accept_map=accept_map,
                                P=channels_per_record,
                            )
                            is not None
                        ):
                            # u32-word fast path: 9..32-state programs and
                            # multi-pattern combined automata (one record
                            # per u32 lane, per-channel accept bit-logs)
                            swar = ssw32.WordScanner(
                                prog,
                                self._ptables,
                                accept_map=accept_map,
                                P=channels_per_record,
                                nullable=nullable,
                            )
                    self._pallas = swar or spl.PallasScanner(
                        prog, self._ptables, nullable=nullable
                    )
        self._accept_map_set = accept_map is not None

    # ------------------------------------------------------------------
    # Seeded-alias routing: X{m,n} == X{m,} under seeded semantics
    # ------------------------------------------------------------------
    def _seeded_alias(self):
        """Cached ScanEngine over ``seeded_alias_program(self.prog)`` (the
        X{m,} alias of a whole-pattern X{m,n} — see that function for the
        semantics argument), or None when no alias applies."""
        built = getattr(self, "_alias_built", False)
        if built:
            return self._alias
        self._alias_built = True
        self._alias = None
        if self.P != 1:
            return None
        aprog = seeded_alias_program(self.prog)
        if aprog is not None:
            self._alias = ScanEngine(aprog, backend=self.backend_requested)
        return self._alias

    @staticmethod
    def _alias_call(alias, name, data, lengths, *args, **kw):
        """Route a call to the seeded-alias engine, rounding B up to the
        alias's packing group with zero-length phantom records (the
        original sparse program has G=1, the alias is lane-packed)."""
        data = jnp.asarray(data)
        lengths = jnp.asarray(lengths)
        G = max(1, alias.prog.G)
        B = data.shape[0]
        Bp = -(-B // G) * G
        if Bp != B:
            data = jnp.pad(data, ((0, Bp - B), (0, 0)))
            lengths = jnp.pad(lengths, (0, Bp - B))
            args = tuple(
                jnp.pad(jnp.asarray(a), (0, Bp - B)) for a in args
            )
        out = getattr(alias, name)(data, lengths, *args, **kw)
        if Bp == B:
            return out
        if isinstance(out, tuple):
            return tuple(o[:B] for o in out)
        return out[:B]

    # ------------------------------------------------------------------
    # Public backend introspection (the supported way for api.py / bench
    # harnesses to reach the device scanner — no private-attr reads)
    # ------------------------------------------------------------------
    @property
    def device_scanner(self):
        """The selected device kernel scanner (PallasScanner / CountScanner
        / SparseScanner / SwarScanner / WordScanner), or None when this
        engine runs the unpacked XLA path."""
        return self._pallas

    @property
    def packed(self) -> bool:
        """True when the engine holds lane-packed tables (dense tiers)."""
        return self._ptables is not None

    @staticmethod
    def _multiblock_container_wins(prog, cfg) -> bool:
        """True if the multiblock program's per-step container MACs
        (partial 128x128 blocks + accept reduce) undercut the dense
        lanes^2 follow matmul — repetition chains have O(S/128) nonzero
        blocks, so the dense path wastes most of the MXU."""
        if prog.tier != "multiblock" or prog.fblocks is None:
            return False
        from .ops.scan_pallas import banded_offsets

        if banded_offsets(np.asarray(prog.F).T, cfg.banded_max_diags):
            return False  # banded-diagonal kernels beat both matmul forms
        pb, _, _, U = prog.sparse_partition
        npart = len(pb)
        if npart > cfg.sparse_partial_max:
            return False
        sparse_macs = npart * 128 * 128 + int(U.sum()) * 128
        return sparse_macs < 0.7 * prog.lanes * prog.lanes

    # ------------------------------------------------------------------
    # Stream encoding
    # ------------------------------------------------------------------
    def encode(self, data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """[B, T] class-id stream (used by the unpacked engine and the
        anchored-rescan primitive)."""
        p = self.prog
        if self._ptables is not None:
            return self._sp.encode_classes_fast(
                self._ptables,
                jnp.asarray(data),
                jnp.asarray(lengths),
                n_runs=self.n_runs,
                bos_class=p.bos_class,
                eos_class=p.eos_class,
            )
        return sx.encode_stream(
            self.tables,
            jnp.asarray(data),
            jnp.asarray(lengths),
            p.bos_class,
            p.eos_class,
            p.dead_class,
        )

    def _words(self, data, lengths, kernel_layout: bool):
        len_g = self._len_g(lengths)
        words = self._sp.mask_stream_from_bytes(
            self._ptables,
            jnp.asarray(data),
            len_g,
            s_tile=self.prog.s_tile,
            G=self.prog.G,
            n_runs=self.n_runs,
            kernel_layout=kernel_layout,
        )
        return words, len_g

    def _len_g(self, lengths: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(lengths).reshape(-1, self.prog.G)

    def _len_channels(self, lengths: jnp.ndarray) -> jnp.ndarray:
        """Per-accept-channel lengths (== per record unless multi-pattern)."""
        len_g = self._len_g(lengths)
        if self.P == 1:
            return len_g
        return jnp.repeat(len_g, self.P, axis=1)

    # ------------------------------------------------------------------
    # Primitives (all take/return device arrays)
    # ------------------------------------------------------------------
    def forward_flags(self, data, lengths, *, seeded: bool) -> jnp.ndarray:
        """[B, T+1] accept flags."""
        alias = self._seeded_alias()
        if seeded and alias is not None:
            return self._alias_call(
                alias, "forward_flags", data, lengths, seeded=True
            )
        if self._pallas is not None:
            raw = lambda d, l: self._pallas.forward_flags_b(
                d, self._len_g(l), seeded=seeded
            )
            if self._use_prefilter(data):
                # prefilter rejection proves no seeded accept anywhere;
                # unseeded accepts are a subset of seeded ones
                return self._prefilter_apply(
                    data, lengths, raw, fills=(False,)
                )
            return raw(jnp.asarray(data), lengths)
        if self._ptables is not None:
            words, _ = self._words(data, lengths, kernel_layout=False)
            return self._sp.forward_flags(
                self._ptables, words, seeded=seeded, lanes=self.prog.lanes
            )
        cls = self.encode(data, lengths)
        return sx.forward_flags(self.tables, cls, seeded=seeded, n_seed_steps=2)

    def _window_plan(self, L: int, B: int, seeded: bool):
        """(k, w, h) record window split for the batched byte scan, or None.

        Tall-narrow batches (few records x long records) underfill the
        kernel's batch lanes; splitting each record into ``k`` windows of
        ``w`` owned bytes plus an ``h``-byte warm-up overlap (scanned with
        ``lead=h`` so overlap accepts are suppressed) multiplies the batch
        width by k at a +h/w byte cost. Exact for (cnt, first, any) when
        every match fits in ``h = prog.horizon`` bytes, the pattern is
        anchor-free (BOS/EOS symbols inert, so per-window injection is a
        no-op) and non-nullable (no empty match at every position)."""
        from .utils.config import get_config

        from .ops.scan_swar import SwarScanner
        from .ops.scan_word import WordScanner

        p = self.prog
        if (
            not seeded
            or not getattr(self._pallas, "byte_window_ok", False)
            or isinstance(self._pallas, (SwarScanner, WordScanner))
            # SWAR windows internally (_swar_window); the u32 word tier
            # doesn't need windows (one record per lane, batch always
            # wide); lead>0 here would silently route either back to the
            # slower matmul path
            or self.P != 1
            or self._nullable
            or p.nullable
            or p.uses_anchor
        ):
            return None
        h = p.horizon
        if h is None or h > 128:
            return None
        w_min = max(128, 4 * h)
        target = get_config().window_cols
        if not target or L < 2 * w_min:
            return None
        G = max(1, p.G)
        rows = max(1, B // G)
        k = min(L // w_min, -(-target // rows))
        if k < 2:
            return None
        w = -(-L // k)
        k = -(-L // w)
        return (k, w, h) if k >= 2 else None

    def _match_stats_windowed(self, data, lengths, k: int, w: int, h: int):
        """Windowed (cnt, first, any): split [B, L] records into [B*k, w+h]
        overlapped windows (front-padded with 0xFF, a dead byte for ASCII
        programs), scan with lead=h, and reduce per record."""
        data = jnp.asarray(data)
        B, L = data.shape
        dp = jnp.pad(
            data, ((0, 0), (h, k * w - L)), constant_values=np.uint8(0xFF)
        )
        win = jnp.stack(
            [dp[:, j * w : j * w + w + h] for j in range(k)], axis=1
        ).reshape(B * k, w + h)
        off = jnp.arange(k, dtype=jnp.int32)[None, :] * w
        ln = jnp.clip(
            jnp.asarray(lengths, jnp.int32)[:, None] + h - off, 0, w + h
        )  # [B, k] window-local lengths
        cnt, first, last, full, anym = self._pallas.match_stats_b(
            win, ln.reshape(-1, self.prog.G), seeded=True, lead=h
        )
        cnt = cnt.reshape(B, k)
        first = first.reshape(B, k)
        big = jnp.int32(1 << 30)
        fg = jnp.where(first >= 0, first - h + off, big)
        fmin = jnp.min(fg, axis=1)
        cnt_rec = cnt.sum(axis=1)
        return cnt_rec, jnp.where(fmin >= big, -1, fmin), cnt_rec > 0

    def match_stats(self, data, lengths, *, seeded: bool):
        """(count, first_end, any) per accept channel (== per record unless
        multi-pattern), each flattened to [B * channels_per_record]."""
        alias = self._seeded_alias()
        if seeded and alias is not None:
            return self._alias_call(
                alias, "match_stats", data, lengths, seeded=True
            )
        if seeded and jnp.asarray(data).shape[0] > 128:
            pf = self._prefilter()
            if pf is not None:
                return self._match_stats_prefiltered(data, lengths)
        return self._match_stats_raw(data, lengths, seeded=seeded)

    def _prefilter(self):
        """Lazily built prefilter engine (relaxed_prefilter_program), or
        None. Only pays off against the container kernels: counting-tier
        sparse programs are already one int32 per record, and small
        batches (B <= the compaction bucket floor) skip it entirely."""
        if getattr(self, "_prefilter_built", False):
            return self._prefilter_eng
        self._prefilter_built = True
        self._prefilter_eng = None
        if (
            self.P == 1
            and not self._accept_map_set
            and self._counting is None
            and self.prog.tier == "sparse"
            and seeded_alias_program(self.prog) is None
        ):
            rp = relaxed_prefilter_program(self.prog)
            if rp is not None:
                self._prefilter_eng = ScanEngine(
                    rp, backend=self.backend_requested
                )
        return self._prefilter_eng

    def _match_stats_prefiltered(self, data, lengths):
        """Two-phase sparse scan: a tiny superset-language scan finds
        candidate records (relaxed_prefilter_program), the heavy kernels
        run on a compacted candidate batch, and results scatter back —
        all traceable (lax.cond picks the full scan when the candidate
        count exceeds the static compaction bucket, so the result is
        exact either way)."""
        return self._prefilter_apply(
            data,
            lengths,
            lambda d, l: self._match_stats_raw(d, l, seeded=True),
            fills=(0, -1, False),
        )

    def _prefilter_apply(self, data, lengths, raw_fn, *, fills, extra=()):
        """Generic prefilter compaction: run ``raw_fn(data2, lengths2,
        *extra2)`` on the candidate-compacted batch and scatter each
        output back along axis 0 with the matching ``fills`` value (the
        exact result for a record the superset scan rejects). ``extra``
        = ((per-record array, gather fill), ...) forwarded to raw_fn.
        Falls through to the raw call when no prefilter applies or the
        batch is too small to compact.

        TWO static bucket sizes (~B/16 and ~B/4, each >= 128 rows and
        picked at runtime by candidate count under nested lax.cond) so
        the filter's leverage scales with hit density: a single B/4
        bucket caps the speedup at 4x the raw kernels no matter how
        sparse the hits (the r5 density sweep measured exactly that
        flat ceiling); the small bucket lifts <= ~6% densities to ~16x.
        Each bucket compiles its own raw_fn geometry — one extra sparse
        Mosaic compile, recorded in the config-10 first_compile_s."""
        data = jnp.asarray(data)
        lengths = jnp.asarray(lengths)
        ex_arrays = tuple(jnp.asarray(a) for (a, _f) in extra)
        B = data.shape[0]
        buckets = []
        for div in (16, 4):
            b = min(B, max(128, -(-(B // div) // 128) * 128))
            if b < B and b not in buckets:
                buckets.append(b)
        if not buckets:  # static: nothing to gain, skip the filter scan
            return raw_fn(data, lengths, *ex_arrays)
        _, _, pre_any = self._alias_call(
            self._prefilter_eng, "match_stats", data, lengths, seeded=True
        )
        pre_any = pre_any.reshape(-1)[:B]
        nhits = jnp.sum(pre_any.astype(jnp.int32))

        def compact_at(bcap):
            def compacted(_):
                (idx,) = jnp.nonzero(pre_any, size=bcap, fill_value=0)
                valid = jnp.arange(bcap) < nhits
                d2 = jnp.take(data, idx, axis=0)
                l2 = jnp.where(valid, jnp.take(lengths, idx), 0)
                ex2 = tuple(
                    jnp.where(
                        valid, jnp.take(a, idx), jnp.asarray(f, a.dtype)
                    )
                    for a, (_a, f) in zip(ex_arrays, extra)
                )
                outs = raw_fn(d2, l2, *ex2)
                single = not isinstance(outs, tuple)
                outs_t = (outs,) if single else outs
                # drop invalid compaction slots (they all alias record 0)
                safe = jnp.where(valid, idx, B)
                res = []
                for o, f in zip(outs_t, fills):
                    base = jnp.full((B,) + o.shape[1:], f, o.dtype)
                    res.append(base.at[safe].set(o, mode="drop"))
                return res[0] if single else tuple(res)

            return compacted

        def full(_):
            return raw_fn(data, lengths, *ex_arrays)

        nxt = full
        for b in sorted(buckets, reverse=True):
            def nxt(_, b=b, inner=nxt):
                return jax.lax.cond(nhits <= b, compact_at(b), inner, None)

        return nxt(None)

    def _use_prefilter(self, data) -> bool:
        return (
            jnp.asarray(data).shape[0] > 128 and self._prefilter() is not None
        )

    def _match_stats_raw(self, data, lengths, *, seeded: bool):
        if self._pallas is not None:
            data = jnp.asarray(data)
            plan = self._window_plan(data.shape[1], data.shape[0], seeded)
            if plan is not None:
                return self._match_stats_windowed(data, lengths, *plan)
            cnt, first, last, full, anym = self._pallas.match_stats_b(
                data, self._len_g(lengths), seeded=seeded
            )
            B = cnt.shape[0] * cnt.shape[1]
            return cnt.reshape(B), first.reshape(B), anym.reshape(B)
        if self._ptables is not None:
            words, _ = self._words(data, lengths, kernel_layout=False)
            len_c = self._len_channels(lengths)
            cnt, first, anym = self._sp.match_stats(
                self._ptables,
                words,
                len_c,
                seeded=seeded,
                nullable=self._nullable,
                lanes=self.prog.lanes,
            )
            B = cnt.shape[0] * cnt.shape[1]
            return cnt.reshape(B), first.reshape(B), anym.reshape(B)
        cls = self.encode(data, lengths)
        return sx.match_stats(
            self.tables, cls, jnp.asarray(lengths), seeded=seeded,
            nullable=self.prog.nullable,
        )

    def reverse_hits(self, data, lengths) -> jnp.ndarray:
        """[B, T] start-position hits."""
        alias = self._seeded_alias()
        if alias is not None:
            return self._alias_call(alias, "reverse_hits", data, lengths)
        if self._pallas is not None:
            raw = lambda d, l: self._pallas.reverse_hits_b(d, self._len_g(l))
            if self._use_prefilter(data):
                # a record the superset scan rejects has no match, hence
                # no start positions
                return self._prefilter_apply(
                    data, lengths, raw, fills=(0,)
                )
            return raw(jnp.asarray(data), lengths)
        if self._ptables is not None:
            words, _ = self._words(data, lengths, kernel_layout=False)
            return self._sp.reverse_hits(
                self._ptables, words, lanes=self.prog.lanes
            )
        cls = self.encode(data, lengths)
        return sx.reverse_hits(self.tables, cls)

    def first_end_from(self, data, lengths, starts, *, longest: bool = False):
        """Anchored-rescan end per record (-1 = none): smallest end (lazy
        policy) or, with ``longest=True``, largest end (greedy
        leftmost-longest -- the POSIX policy)."""
        alias = self._seeded_alias()
        if not longest and alias is not None:
            # lazy first-end from an anchored start: the shortest chain
            # is m copies for X{m,n} and X{m,} alike. Greedy (longest)
            # rescans observe the n bound — they stay on the original.
            return self._alias_call(
                alias, "first_end_from", data, lengths, starts,
                longest=False,
            )
        if self._pallas is not None and self._pallas.has_anchor:
            def raw(d, l, st):
                first = self._pallas.anchor_end_b(
                    d,
                    self._len_g(l),
                    jnp.asarray(st).reshape(-1, self.prog.G),
                    longest=longest,
                )
                return first.reshape(-1)

            if self._use_prefilter(data):
                # no match in the record implies no anchored end either
                return self._prefilter_apply(
                    data, lengths, raw, fills=(-1,),
                    extra=((starts, -1),),
                )
            return raw(jnp.asarray(data), lengths, starts)
        if self._ptables is not None and self.prog.tier != "sparse":
            words, len_g = self._words(data, lengths, kernel_layout=False)
            starts_g = jnp.asarray(starts).reshape(-1, self.prog.G)
            first = self._sp.first_end_from(
                self._ptables,
                words,
                len_g,
                starts_g,
                lanes=self.prog.lanes,
                s_tile=self.prog.s_tile,
                longest=longest,
            )
            return first.reshape(-1)
        cls = self.encode(data, lengths)
        return sx.first_end_from(
            self.tables, cls, jnp.asarray(lengths), jnp.asarray(starts),
            longest=longest,
        )

    # ------------------------------------------------------------------
    # Device-side span enumeration (delegates to the scanner kernels,
    # prefilter-compacted on the sparse tier)
    # ------------------------------------------------------------------
    def lazy_spans(self, data, lengths, *, cap: int):
        """(starts [B, cap], ends [B, cap], count [B]) — lazy spans via
        the device scanner; requires ``device_scanner.has_anchor``."""
        raw = lambda d, l: self._pallas.lazy_spans_b(
            d, self._len_g(l), cap=cap
        )
        if self._use_prefilter(data):
            return self._prefilter_apply(
                data, lengths, raw, fills=(-1, -1, 0)
            )
        return raw(jnp.asarray(data), lengths)

    def greedy_spans(self, data, lengths, *, cap: int):
        """(starts, ends, count, overflow) — greedy (leftmost-longest)
        spans via the device scanner."""
        raw = lambda d, l: self._pallas.greedy_spans_b(
            d, self._len_g(l), cap=cap
        )
        if self._use_prefilter(data):
            return self._prefilter_apply(
                data, lengths, raw, fills=(-1, -1, 0, False)
            )
        return raw(jnp.asarray(data), lengths)

    # ------------------------------------------------------------------
    # Bitmaps
    # ------------------------------------------------------------------
    @staticmethod
    def _fetch_bitmap(bm) -> np.ndarray:
        """Device [B, W] bool -> host bool array via device-side bit
        packing: 8x less device->host traffic (VERDICT r3 #8 — the
        position bitmap is the API's result, but it need not cross the
        link one byte per bit)."""
        W = bm.shape[1]
        packed = np.asarray(jnp.packbits(bm.astype(jnp.uint8), axis=1))
        return np.unpackbits(packed, axis=1)[:, :W].astype(bool)

    @staticmethod
    def _clamp_words(words, lengths, nullable: bool):
        """Word-domain position clamp: keep bits t <= len, fold any bit
        past len into bit len, and (nullable, seeded) set every valid
        position — sx.ends_bitmap/starts_bitmap semantics on bit-packed
        [B, Wt] uint32 words."""
        Wt = words.shape[1]
        wi = (jnp.arange(Wt) * 32)[None, :]
        lo = jnp.clip(lengths[:, None] + 1 - wi, 0, 32)
        lo_s = jnp.minimum(lo, 31).astype(jnp.uint32)
        keep = jnp.where(
            lo >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << lo_s) - jnp.uint32(1),
        )
        tail = ((words & ~keep) != 0).any(axis=1)
        out = words & keep
        wl = (lengths // 32)[:, None]
        bl = (lengths % 32)[:, None].astype(jnp.uint32)
        add = (
            (jnp.arange(Wt)[None, :] == wl) & tail[:, None]
        ).astype(jnp.uint32) << bl
        out = out | add
        if nullable:
            out = out | keep
        return out

    @staticmethod
    def _fetch_words_bitmap(words, max_len: int) -> np.ndarray:
        """Device [B, Wt] uint32 position words -> host bool bitmap —
        ONE bit per position crosses the link AND no [B, T] flag stream
        ever existed in HBM (VERDICT r4 #8)."""
        w = np.asarray(words)
        bits = np.unpackbits(
            w.view(np.uint8).reshape(w.shape[0], -1),
            axis=1,
            bitorder="little",
        )
        return bits[:, : max_len + 1].astype(bool)

    def _words_path_ok(self, data) -> bool:
        sc = self._pallas
        if sc is None or self.P != 1 or not getattr(sc, "flag_words_ok", False):
            return False
        data = jnp.asarray(data)
        B_rows = data.shape[0] // max(1, self.prog.G)
        from .ops.scan_pallas import B_BLK_FLAGS

        return sc._geom_words(data.shape[1], B_rows, B_BLK_FLAGS) is not None

    def ends_bitmap(self, data, lengths, max_len: int) -> np.ndarray:
        alias = self._seeded_alias()
        if alias is not None:
            return self._alias_call(
                alias, "ends_bitmap", data, lengths, max_len=max_len
            )
        if self._words_path_ok(data):
            def raw(d, l):
                w, _t = self._pallas.flags_words_b(
                    d, self._len_g(l), seeded=True
                )
                return self._clamp_words(w, l, self.prog.nullable)

            if self._use_prefilter(data):
                words = self._prefilter_apply(data, lengths, raw, fills=(0,))
            else:
                words = raw(jnp.asarray(data), jnp.asarray(lengths))
            return self._fetch_words_bitmap(words, max_len)
        flags = self.forward_flags(data, lengths, seeded=True)
        return self._fetch_bitmap(
            sx.ends_bitmap(
                flags, jnp.asarray(lengths), max_len, self.prog.nullable,
                seeded=True,
            )
        )

    def starts_bitmap(self, data, lengths, max_len: int) -> np.ndarray:
        alias = self._seeded_alias()
        if alias is not None:
            return self._alias_call(
                alias, "starts_bitmap", data, lengths, max_len=max_len
            )
        if self._words_path_ok(data):
            def raw(d, l):
                w, _t = self._pallas.hits_words_b(d, self._len_g(l))
                # start s = max(t - 1, 0): funnel-shift the stream down
                # one bit (t = 0 and t = 1 both land on s = 0)
                nxt = jnp.concatenate(
                    [w[:, 1:], jnp.zeros_like(w[:, :1])], axis=1
                )
                sh = (w >> 1) | (nxt << 31)
                first = w[:, :1] & jnp.uint32(1)
                sh = jnp.concatenate([sh[:, :1] | first, sh[:, 1:]], axis=1)
                return self._clamp_words(sh, l, self.prog.nullable)

            if self._use_prefilter(data):
                words = self._prefilter_apply(data, lengths, raw, fills=(0,))
            else:
                words = raw(jnp.asarray(data), jnp.asarray(lengths))
            return self._fetch_words_bitmap(words, max_len)
        hits = self.reverse_hits(data, lengths)
        return self._fetch_bitmap(
            sx.starts_bitmap(
                hits, jnp.asarray(lengths), max_len, self.prog.nullable
            )
        )

    def fullmatch_flags(self, data, lengths) -> np.ndarray:
        """[B] bool whole-string acceptance (the reference's only matching
        semantics, regex.h:150-165). On the pallas backend this is fused
        into the match kernel (no [B, T] flag stream is materialized)."""
        if self._pallas is not None:
            def raw(d, l):
                _, _, _, full, _ = self._pallas.match_stats_b(
                    d, self._len_g(l), seeded=False
                )
                return full.reshape(-1)

            if self._use_prefilter(data):
                # prefilter rejection (a seeded-superset fact) rules out
                # the anchored whole-string match too
                return np.asarray(
                    self._prefilter_apply(data, lengths, raw, fills=(False,))
                )
            return np.asarray(raw(jnp.asarray(data), lengths))
        flags = self.forward_flags(data, lengths, seeded=False)
        B, T1 = flags.shape
        t = jnp.arange(T1)[None, :]
        n = jnp.asarray(lengths)[:, None]
        e = jnp.clip(t - 1, 0, n)
        covers = (jnp.maximum(t - 1, 0) >= n) | (n == 0)
        return np.asarray((flags & (e == n) & covers).any(axis=1))
