"""Long-string scan parallelism: one huge string split across blocks.

The per-byte NFA step is the composition of boolean affine maps

    v  ->  (follow(v) & B[c])  |  seed_t

and composition of such maps is **associative**, so one string's scan
factors into (1) per-block *summaries* computed in parallel, (2) an
associative prefix combine over blocks, (3) per-block replay from the now
known entry states — again in parallel. This is the framework's sequence-
parallelism story (SURVEY.md §5 "long-context" row, §7.2 step 8): the
reference can only scan one byte at a time on one core (regex.h:157).

A block summary is the affine pair (M, s):

* ``M [S, S]``: M[i, j] = 1 iff starting the block in state i ends it in a
  state set containing j (computed by scanning the identity batch);
* ``s [S]``: states live at block end due to seeds injected *inside* the
  block (every step in seeded/search mode; the two BOS-side seeds of the
  anchored convention in the global first block only).

Combine (associative):  (Ma, sa) ∘ (Mb, sb) = (Ma·Mb, sa·Mb | sb)
with · the boolean matmul — MXU-shaped, run under lax.associative_scan.
Entry state of block k is then spref[k-1] (all seeding flows through s).

Cost: pass 1 scans S+1 pseudo-records per block, so the parallel scheme
wins once the block count exceeds ~S. The same primitives run sharded:
blocks split over the data mesh axis (DistScanner.long_flags), with only
the tiny [nb, S, S] summary tensor crossing chips.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.program import DeviceProgram
from . import scan_xla as sx

DTYPE = jnp.bfloat16


def _step_fn(tables):
    M = tables["M"]
    c_pad = tables["Bc"].shape[0]
    K = tables["K"]

    def step(v, cls_col):
        oh = (cls_col[:, None] == jnp.arange(c_pad)[None, :]).astype(DTYPE)
        u = jnp.concatenate([v, oh], axis=1)
        acc = jnp.dot(u, M, preferred_element_type=jnp.float32)
        return (acc > K).astype(DTYPE)

    return step


@functools.partial(jax.jit, static_argnames=("s_pad", "seeded"))
def block_summaries(
    tables: Dict[str, jnp.ndarray],
    cls_b: jnp.ndarray,  # [nb, block] int32 class columns per block
    first_gate: jnp.ndarray,  # [nb] 1.0 where the block is the global first
    *,
    s_pad: int,
    seeded: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-block affine summaries (M [nb,S,S], s [nb,S])."""
    nb, block = cls_b.shape
    step = _step_fn(tables)
    seed_vec = jnp.zeros((s_pad,), DTYPE).at[0].set(1)
    eye = jnp.concatenate(
        [jnp.eye(s_pad, dtype=DTYPE), jnp.zeros((1, s_pad), DTYPE)], axis=0
    )
    v0 = jnp.tile(eye, (nb, 1))  # [nb*(S+1), S]
    acc_row = jnp.tile(
        jnp.concatenate([jnp.zeros(s_pad), jnp.ones(1)]).astype(DTYPE), (nb,)
    )[:, None]
    first_rows = acc_row * jnp.repeat(
        first_gate.astype(DTYPE), s_pad + 1
    )[:, None]

    def body(v, xs):
        cls_t, t = xs
        if seeded:
            gate = acc_row
        else:
            gate = first_rows * (t < 2)  # BOS-side seeds, global block 0 only
        v = jnp.maximum(v, gate * seed_vec[None, :])
        return step(v, jnp.repeat(cls_t, s_pad + 1)), None

    vT, _ = jax.lax.scan(body, v0, (cls_b.T, jnp.arange(block)))
    summ = vT.reshape(nb, s_pad + 1, s_pad)
    return summ[:, :s_pad, :], summ[:, s_pad, :]


@functools.partial(jax.jit, static_argnames=("seeded",))
def block_replay(
    tables: Dict[str, jnp.ndarray],
    cls_b: jnp.ndarray,  # [nb, block]
    ventry: jnp.ndarray,  # [nb, S] entry state per block
    first_gate: jnp.ndarray,  # [nb]
    *,
    seeded: bool,
) -> jnp.ndarray:
    """Replay blocks from known entry states; accept flags [nb, block]."""
    nb, block = cls_b.shape
    s_pad = ventry.shape[1]
    step = _step_fn(tables)
    seed_vec = jnp.zeros((s_pad,), DTYPE).at[0].set(1)
    fg = first_gate.astype(DTYPE)[:, None]

    def body(v, xs):
        cls_t, t = xs
        if seeded:
            gate = jnp.asarray(1, DTYPE)
        else:
            gate = fg * (t < 2)
        v = jnp.maximum(v, gate * seed_vec[None, :])
        v2 = step(v, cls_t)
        flag = (
            jnp.dot(v2, tables["accept"], preferred_element_type=jnp.float32)
            > 0
        )
        return v2, flag

    _, flags = jax.lax.scan(
        body, ventry.astype(DTYPE), (cls_b.T, jnp.arange(block))
    )
    return flags.T  # [nb, block]


@jax.jit
def prefix_entries(Ms: jnp.ndarray, ss: jnp.ndarray) -> jnp.ndarray:
    """Associative prefix of affine summaries -> entry state per block."""
    def combine(a, b):
        Ma, sa = a
        Mb, sb = b
        Mab = (
            jnp.einsum("nij,njk->nik", Ma, Mb,
                       preferred_element_type=jnp.float32) > 0
        ).astype(DTYPE)
        sab = jnp.maximum(
            (
                jnp.einsum("nj,njk->nk", sa, Mb,
                           preferred_element_type=jnp.float32) > 0
            ).astype(DTYPE),
            sb,
        )
        return Mab, sab

    _, spref = jax.lax.associative_scan(combine, (Ms, ss), axis=0)
    s_pad = ss.shape[1]
    return jnp.concatenate(
        [jnp.zeros((1, s_pad), DTYPE), spref[:-1].astype(DTYPE)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("length", "block", "seeded", "bos_class", "eos_class"),
)
def scan_long(
    tables: Dict[str, jnp.ndarray],
    data: jnp.ndarray,  # [L] uint8
    *,
    length: int,
    block: int = 1024,
    seeded: bool = True,
    bos_class: int = 0,
    eos_class: int = 0,
) -> jnp.ndarray:
    """Block-parallel scan of ONE string; flags [T = L+2] per stream step."""
    s_pad = tables["accept"].shape[0]
    cls = sx.encode_stream(
        tables, data[None, :], jnp.asarray([length]), bos_class, eos_class, 0
    )[0]
    T = cls.shape[0]
    nb = -(-T // block)
    cls_b = jnp.pad(cls, (0, nb * block - T)).reshape(nb, block)
    first_gate = (jnp.arange(nb) == 0).astype(jnp.float32)
    Ms, ss = block_summaries(
        tables, cls_b, first_gate, s_pad=s_pad, seeded=seeded
    )
    ventry = prefix_entries(Ms, ss)
    flags = block_replay(tables, cls_b, ventry, first_gate, seeded=seeded)
    return flags.reshape(nb * block)[:T]


def compact_tables(prog: DeviceProgram) -> Dict[str, jnp.ndarray]:
    """Unpacked tables trimmed to the record tile (s_tile lanes instead of
    the 128/256-lane padded layout): the long-string passes scan an
    identity batch of S+1 pseudo-records per block, so padding a 7-state
    automaton to 128 lanes would cost 16x the rows AND 16x the lane width
    (~250x the FLOPs). Dense tiers only."""
    assert prog.F is not None, "compact tables need dense F"
    st = prog.s_tile
    F = prog.F[:st, :st]
    Bc = prog.Bc[:, :st]
    fuse_k = 1 << (st + 1).bit_length()
    M = np.concatenate([F, fuse_k * Bc.astype(np.int32)], axis=0)
    return {
        "K": jnp.asarray(fuse_k, jnp.float32),
        "M": jnp.asarray(M, DTYPE),
        "F": jnp.asarray(F, DTYPE),
        "Ft": jnp.asarray(F.T, DTYPE),
        "Bc": jnp.asarray(Bc, DTYPE),
        "accept": jnp.asarray(prog.accept[:st], DTYPE),
        "byte_class": jnp.asarray(prog.byte_class, jnp.int32),
    }


class LongScanner:
    """One-long-string scanner bound to a compiled program."""

    def __init__(self, prog: DeviceProgram, block: int = 1024):
        self.prog = prog
        self.block = block
        self.tables = (
            compact_tables(prog)
            if prog.F is not None
            else sx.device_tables(prog)
        )

    def _flags(self, text: bytes, seeded: bool) -> np.ndarray:
        data = jnp.asarray(np.frombuffer(text, dtype=np.uint8))
        return np.asarray(
            scan_long(
                self.tables,
                data,
                length=len(text),
                block=self.block,
                seeded=seeded,
                bos_class=self.prog.bos_class,
                eos_class=self.prog.eos_class,
            )
        )

    def ends_bitmap(self, text: bytes) -> np.ndarray:
        """[len+1] bool: some match (any start) ends at position e — the
        long-string analog of OracleEngine.ends."""
        n = len(text)
        flags = self._flags(text, seeded=True)
        e = np.clip(np.arange(n + 2), 0, n)
        out = np.zeros(n + 1, bool)
        np.maximum.at(out, e, flags[: n + 2] > 0)
        if self.prog.nullable:
            out[:] = True
        return out

    def count_ends(self, text: bytes) -> int:
        return int(self.ends_bitmap(text).sum())

    def search(self, text: bytes) -> bool:
        return bool(self.ends_bitmap(text).any())

    def fullmatch(self, text: bytes) -> bool:
        n = len(text)
        if n == 0:
            return self.prog.nullable
        flags = self._flags(text, seeded=False)
        e = np.clip(np.arange(n + 2), 0, n)
        covers = np.arange(n + 2) >= n
        return bool(((flags[: n + 2] > 0) & (e == n) & covers).any())


# ---------------------------------------------------------------------------
# Fast path: the same two-pass scheme through the packed Pallas kernels
# ---------------------------------------------------------------------------


class FastLongScanner:
    """Long-string scan through the lane-packed, byte-fused Pallas kernels.

    Two modes, chosen per pattern (both stream raw bytes into the kernels
    — in-kernel byte->mask with per-window global-stream offsets, no HBM
    mask stream):

    * **Overlapped windows** — patterns whose follow graph is acyclic have
      a finite influence horizon (DeviceProgram.horizon): the seeded state
      at any stream step depends only on the last ``horizon`` steps plus
      the per-step seeds. Each window re-scans ``overlap`` extra entry
      steps and is then exact, so ONE batched pass at full packed rate
      replaces summaries + prefix + replay entirely. This covers the
      common grep patterns (literals, unions, brackets, bounded reps).
    * **Summary + replay** — cyclic patterns (unbounded Kleene) and
      unseeded fullmatch scans: pass 1 packs each block's S+1 summary
      pseudo-records into MXU rows (Q blocks per 128-lane row when the
      basis fits G//Q slots), a tiny associative prefix combines the
      affine summaries, pass 2 replays blocks from their entry states.

    Dense tiers with s_tile <= 32 (the common grep patterns); larger
    automata use LongScanner's portable path. Stream offsets are int32:
    single strings up to ~2 GB (shard longer corpora, parallel/dist.py).
    """

    def __init__(self, prog: DeviceProgram, block: int = 16384):
        from . import scan_packed as sp
        from . import scan_pallas as spl

        assert prog.F is not None, "unsupported tier"
        assert block % 128 == 0, "block must be a multiple of 128"
        self.prog = prog
        self.block = block
        self.ptables = sp.packed_tables(prog)
        self.scanner = spl.PallasScanner(prog, self.ptables)
        self.S = prog.n_states
        self.s_tile, self.G, self.lanes = prog.s_tile, prog.G, prog.lanes
        self.P1 = self.S + 1
        self.rows_pb = -(-self.P1 // self.G)
        h = prog.horizon
        self.overlap = (
            h + 2 if (h is not None and h + 2 <= block // 8) else None
        )
        # wide tiles (s_tile > 32, one or two records per row): the
        # overlapped windows run fine through the same batch kernels, but
        # the summary pseudo-record layout is only worthwhile narrow —
        # unseeded scans delegate to the portable scanner instead
        self._wide = prog.s_tile > 32
        if self._wide and self.overlap is None:
            raise ValueError(
                "wide-tile long mode needs a bounded horizon "
                f"(s_tile={prog.s_tile}, horizon={h}, block={block})"
            )
        self._portable = None
        Q = 1
        while Q * 2 <= self.G and self.P1 <= self.G // (Q * 2):
            Q *= 2
        self.Q1 = Q if self.rows_pb == 1 else 1
        self._p1_cache: dict = {}

    # -- geometry ---------------------------------------------------------
    def _geom(self, T_steps: int, B_rows: int, Q: int, t_div: int = 0):
        """(T_pad, B_pad, B_blk, T_chunk, r) for windows of T_steps steps
        with Q byte rows per step. ``t_div``: force T_chunk | t_div (pass 1
        summaries must stop exactly at the block boundary)."""
        import math

        cap_b, cap_t = self.scanner._blk_limits(2048)
        B_blk = min(cap_b, -(-max(B_rows, 1) // 128) * 128)
        B_pad = -(-max(B_rows, 1) // B_blk) * B_blk
        r = max(1, min(32 // Q, 8))
        tc = max(r, (min(cap_t, 512) // r) * r)
        if t_div:
            tc = max(r, math.gcd(t_div, tc))
        T_chunk = tc
        T_pad = -(-T_steps // T_chunk) * T_chunk
        return T_pad, B_pad, B_blk, T_chunk, r

    @staticmethod
    def _tail(flags, n: int, mode: str):
        if mode == "flags":
            return flags
        if mode == "count":
            body = jnp.sum((flags[:n] > 0).astype(jnp.int32))
            tail = ((flags[n] > 0) | (flags[n + 1] > 0)).astype(jnp.int32)
            return body + tail
        if mode == "any":
            return jnp.any(flags[: n + 2] > 0)
        return (flags[n] > 0) | (flags[n + 1] > 0)  # fullmatch

    # -- shared window-batch byte layout ----------------------------------
    def _ov_block(self, n: int) -> int:
        """Per-call window length for the overlapped path: size windows so
        the batch is ~2k kernel columns wide (the per-step cost is nearly
        flat below that, so fixed per-step work amortizes over more lanes)
        while keeping the overlap re-scan tax (overlap/block) small."""
        G, o = self.G, self.overlap or 0
        blk = -(-(n + 2) // (G * 2048))
        blk = max(256, 8 * o, -(-blk // 128) * 128)
        return min(-(-blk // 128) * 128, self.block)

    def _window_tm(self, data, n: int, B_pad: int, T_pad: int, r: int,
                   lead: int, block: int = 0):
        """[T_pad//r, r*G, B_pad] slab layout where window w = col*G + g
        covers global stream steps [w*block - (lead-1), ...): element
        (w, t) = text byte at global index w*block + t - lead."""
        G, block = self.G, block or self.block
        nbp = B_pad * G
        ext = nbp * block + T_pad
        de = jnp.zeros(ext, jnp.uint8).at[lead : lead + n].set(data)
        segs = [
            de[i * block : i * block + nbp * block].reshape(nbp, block)
            for i in range(-(-T_pad // block))
        ]
        wb = jnp.concatenate(segs, axis=1)[:, :T_pad]  # [nbp, T_pad]
        return (
            wb.reshape(B_pad, G, T_pad)
            .transpose(2, 1, 0)
            .reshape(T_pad // r, r * G, B_pad)
        )

    def _slot_windows(self, B_pad: int):
        """[G, B_pad] int32 window index per (slot, column)."""
        G = self.G
        return (
            jnp.arange(B_pad, dtype=jnp.int32)[None, :] * G
            + jnp.arange(G, dtype=jnp.int32)[:, None]
        )

    # -- SWAR overlapped fast path (count/any) ----------------------------
    def _swar_ov_scanner(self):
        """Cached SwarScanner for the overlapped-window count/any path, or
        None when it does not apply. The matmul overlapped path runs the
        lane-per-state kernels at ~17.6 GB/s while the same pattern's
        batch scan rides SWAR at ~25.9 (BENCHALL r5 configs 8 vs 1) — the
        window batch is just a [nw, block + o] record batch, so for
        anchor-free non-nullable 8-state specs it can take
        ``SwarScanner.match_stats_b(seeded=True, lead=o)`` directly:
        accepts at local step <= o belong to the previous window, exactly
        the counting-window ``lead`` semantics. Excluded: BOS/EOS-gated
        specs (window boundaries are not record boundaries) and classes
        containing byte 0 (window 0's synthetic lead bytes are
        zero-filled; the gate condition keeps them structurally dead)."""
        if getattr(self, "_swov_built", False):
            return self._swov
        self._swov_built = True
        self._swov = None
        from ..utils.config import get_config

        if not get_config().swar or self.prog.nullable:
            return None
        from .scan_swar import SwarScanner, swar_spec

        sp = swar_spec(self.prog)
        if sp is None or sp.has_bos or sp.has_eos:
            return None
        if not all(
            lo >= 1 for runs, _b, _e in sp.gates for lo, _hi in runs
        ):
            return None
        self._swov = SwarScanner(self.prog, self.ptables, nullable=False)
        return self._swov

    def _swar_ov_block(self, n: int) -> int:
        """Window length targeting ~swar_window_cols 32-record kernel
        columns, capped at the scanner block (overlap tax o/block stays
        well under 1%)."""
        from ..utils.config import get_config

        cols = max(get_config().swar_window_cols, 64)
        blk = -(-n // (32 * cols))
        blk = max(256, 8 * (self.overlap or 0), -(-blk // 128) * 128)
        return min(-(-blk // 128) * 128, self.block)

    @functools.partial(jax.jit, static_argnames=("self", "n", "mode"))
    def _swar_ov_impl(self, data, *, n: int, mode: str):
        o = self.overlap
        block = self._swar_ov_block(n)
        nw = max(1, -(-n // block))
        ds = jnp.zeros(o + nw * block, jnp.uint8).at[o : o + n].set(data)
        main = ds[o:].reshape(nw, block)
        head = ds[: nw * block].reshape(nw, block)[:, :o]
        wdata = jnp.concatenate([head, main], axis=1)  # [nw, block + o]
        lens = jnp.clip(
            n - jnp.arange(nw, dtype=jnp.int32) * block + o, 0, block + o
        )
        cnt, _first, _last, _full, anym = self._swov.match_stats_b(
            wdata, lens.reshape(-1, 1), seeded=True, lead=o
        )
        if mode == "any":
            return jnp.any(anym)
        return jnp.sum(cnt.astype(jnp.int32))

    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _swar_ov_first(self, data, *, n: int):
        """(any, global first end) through the SWAR window path — the
        only core facts the `.*X.*` trailing-epilogue needs on pure-ASCII
        text (DotStarLongScanner._count_trail_impl)."""
        from .scan_swar import BIG

        o = self.overlap
        block = self._swar_ov_block(n)
        nw = max(1, -(-n // block))
        ds = jnp.zeros(o + nw * block, jnp.uint8).at[o : o + n].set(data)
        main = ds[o:].reshape(nw, block)
        head = ds[: nw * block].reshape(nw, block)[:, :o]
        wdata = jnp.concatenate([head, main], axis=1)
        lens = jnp.clip(
            n - jnp.arange(nw, dtype=jnp.int32) * block + o, 0, block + o
        )
        cnt, first, _last, _full, _anym = self._swov.match_stats_b(
            wdata, lens.reshape(-1, 1), seeded=True, lead=o
        )
        first = first.reshape(-1)[:nw]
        cnt = cnt.reshape(-1)[:nw]
        off = jnp.arange(nw, dtype=jnp.int32) * block - o
        fg = jnp.where(first >= 0, first + off, BIG)
        return jnp.any(cnt > 0), jnp.min(fg)

    # -- overlapped fast path (bounded-horizon patterns, seeded) ----------
    @functools.partial(jax.jit, static_argnames=("self", "n", "mode"))
    def _ov_impl(self, data, *, n: int, mode: str):
        G, lanes, o = self.G, self.lanes, self.overlap
        block = self._ov_block(n)
        T = n + 2
        nb = -(-T // block)
        rows = -(-nb // G)
        T_pad, B_pad, B_blk, T_chunk, r = self._geom(block + o, rows, G)
        tm = self._window_tm(data, n, B_pad, T_pad, r, lead=o + 1,
                             block=block)
        w = self._slot_windows(B_pad)
        bosr = o + 1 - w * block
        eosr = (n + o + 1) - w * block
        v0 = jnp.zeros((lanes, B_pad), DTYPE)
        gates = jnp.ones((G, B_pad), DTYPE)
        if mode in ("count", "any"):
            # fused window reduction: no [T, G, B] flag stream in HBM
            cnt, tail = self.scanner._count_v0_call_b(
                tm, v0, gates, bosr, eosr, True,
                T_pad, B_pad, B_blk, T_chunk, r, G, o, o + block,
            )
            return self._merge_counts(cnt, tail, mode)
        flags = self.scanner._flags_v0_call_b(
            tm, v0, gates, bosr, eosr, True,
            T_pad, B_pad, B_blk, T_chunk, r, G,
        )  # [T_pad, G, B_pad]
        out = (
            flags[o : o + block]
            .transpose(2, 1, 0)
            .reshape(B_pad * G, block)[:nb]
            .reshape(-1)[:T]
        )
        return self._tail(out, n, mode)

    @staticmethod
    def _merge_counts(cnt, tail, mode: str):
        """(body counts, EOS-side hits) per window -> global scalar (the
        same body+tail split as _tail; padded windows contribute zero)."""
        tail_any = jnp.any(tail > 0)
        if mode == "full":  # accept at the EOS-side steps is the answer
            return tail_any
        body = jnp.sum(cnt)
        if mode == "count":
            return body + tail_any.astype(jnp.int32)
        return (body > 0) | tail_any  # any

    # -- summary + replay (cyclic patterns / unseeded scans) --------------
    def _p1_layout(self, nb: int, seeded: bool):
        """Cached (v0 [lanes, B1p], gates [G, B1p]) host arrays packing the
        S+1 summary pseudo-records of each block (basis states + seed
        accumulator) into kernel columns."""
        key = (nb, seeded)
        hit = self._p1_cache.get(key)
        if hit is not None:
            return hit
        G, s_tile, lanes = self.G, self.s_tile, self.lanes
        S, P1, Q, rows_pb = self.S, self.P1, self.Q1, self.rows_pb
        if rows_pb == 1:
            ncol = -(-nb // Q)
            B1 = ncol
        else:
            B1 = nb * rows_pb
        _, B1p, _, _, _ = self._geom(self.block, B1, Q, t_div=self.block)
        v0 = np.zeros((lanes, B1p), np.float32)
        g1 = np.zeros((G, B1p), np.float32)
        if rows_pb == 1:
            R = G // Q
            for c in range(ncol):
                for q in range(Q):
                    b = c * Q + q
                    if b >= nb:
                        continue
                    for ps in range(S):
                        v0[(q * R + ps) * s_tile + ps, c] = 1.0
                    if seeded or b == 0:
                        g1[q * R + S, c] = 1.0
        else:
            for kb in range(nb):
                for j in range(rows_pb):
                    col = kb * rows_pb + j
                    for g in range(G):
                        ps = j * G + g
                        if ps < S:
                            v0[g * s_tile + ps, col] = 1.0
                        elif ps == P1 - 1 and (seeded or kb == 0):
                            g1[g, col] = 1.0
        out = (jnp.asarray(v0, DTYPE), jnp.asarray(g1, DTYPE))
        self._p1_cache[key] = out
        return out

    @functools.partial(jax.jit, static_argnames=("self", "n", "seeded", "mode"))
    def _sum_impl(self, data, v0_1, gates1, *, n: int, seeded: bool, mode: str):
        G, lanes, s_tile, block = self.G, self.lanes, self.s_tile, self.block
        S, P1, Q, rows_pb = self.S, self.P1, self.Q1, self.rows_pb
        T = n + 2
        nb = -(-T // block)

        # ---- pass 1: block summaries (Q blocks per column) -------------
        if rows_pb == 1:
            ncol = -(-nb // Q)
            B1 = ncol
        else:
            ncol = nb * rows_pb
            B1 = ncol
        nbq = (ncol * Q) if rows_pb == 1 else nb
        _, B1p, B_blk1, T_chunk1, r1 = self._geom(
            block, B1, Q, t_div=block
        )
        de = jnp.zeros(nbq * block, jnp.uint8).at[1 : 1 + n].set(data)
        dbn = de.reshape(nbq, block)
        if rows_pb == 1:
            cols = jnp.pad(
                dbn.reshape(ncol, Q, block), ((0, B1p - ncol), (0, 0), (0, 0))
            )
            tm1 = cols.transpose(2, 1, 0).reshape(block // r1, r1 * Q, B1p)
            b_idx = (
                jnp.arange(B1p, dtype=jnp.int32)[None, :] * Q
                + jnp.arange(Q, dtype=jnp.int32)[:, None]
            )
        else:
            rows_arr = jnp.pad(
                jnp.repeat(dbn, rows_pb, axis=0), ((0, B1p - B1), (0, 0))
            )
            tm1 = rows_arr.T.reshape(block // r1, r1, B1p)
            b_idx = (jnp.arange(B1p, dtype=jnp.int32) // rows_pb)[None, :]
        bosr1 = 1 - b_idx * block
        eosr1 = (n + 1) - b_idx * block
        vf = self.scanner._carry_call_b(
            tm1, v0_1, gates1, bosr1, eosr1, seeded,
            block, B1p, B_blk1, T_chunk1, r1, Q,
        )  # [lanes, B1p]
        if rows_pb == 1:
            R = G // Q
            pr = (
                jnp.transpose(vf[:, :ncol], (1, 0))
                .reshape(ncol, Q, R, s_tile)[:, :, :P1, :S]
                .reshape(ncol * Q, P1, S)[:nb]
            )
        else:
            pr = (
                jnp.transpose(vf[:, : nb * rows_pb], (1, 0))
                .reshape(nb, rows_pb, G, s_tile)
                .reshape(nb, rows_pb * G, s_tile)[:, :P1, :S]
            )
        Ms = pr[:, :S, :].astype(DTYPE)
        ss = pr[:, S, :].astype(DTYPE)
        ventry = prefix_entries(Ms, ss)  # [nb, S]

        # ---- pass 2: replay real blocks from their entry states --------
        rows2 = -(-nb // G)
        T2_pad, B2p, B_blk2, T_chunk2, r2 = self._geom(block, rows2, G)
        nbp = B2p * G
        tm2 = self._window_tm(data, n, B2p, T2_pad, r2, lead=1)
        w2 = self._slot_windows(B2p)
        bosr2 = 1 - w2 * block
        eosr2 = (n + 1) - w2 * block
        ve = jnp.pad(ventry, ((0, nbp - nb), (0, s_tile - S)))
        v02 = jnp.transpose(
            ve.reshape(B2p, G * s_tile), (1, 0)
        ).astype(DTYPE)
        g2 = (
            jnp.ones((G, B2p), DTYPE)
            if seeded
            else (w2 == 0).astype(DTYPE)
        )
        if mode in ("count", "any", "full"):
            cnt, tail = self.scanner._count_v0_call_b(
                tm2, v02, g2, bosr2, eosr2, seeded,
                T2_pad, B2p, B_blk2, T_chunk2, r2, G, 0, block,
            )
            return self._merge_counts(cnt, tail, mode)
        flags = self.scanner._flags_v0_call_b(
            tm2, v02, g2, bosr2, eosr2, seeded,
            T2_pad, B2p, B_blk2, T_chunk2, r2, G,
        )
        out = (
            flags[:block]
            .transpose(2, 1, 0)
            .reshape(nbp, block)[:nb]
            .reshape(-1)[:T]
        )
        return self._tail(out, n, mode)

    # -- speculative windows for cyclic patterns ---------------------------
    @functools.partial(jax.jit, static_argnames=("self", "n", "mode", "W"))
    def _spec_impl(self, data, *, n: int, mode: str, W: int):
        """Speculative overlapped scan for CYCLIC patterns, with exact
        validation.

        A cyclic follow graph has no finite horizon, so overlapped
        windows are not a-priori exact — but in practice the seeded
        frontier usually forgets its entry state within a short warmup
        (the data-parallel-FSM convergence observation). So: guess every
        window's entry state from a W-step bottom-up (⊥) warmup scan,
        replay all windows from the guesses in ONE fused stats+exit
        pass, and VALIDATE: if every window's exit equals the next
        window's guessed entry, the guesses form a consistent execution
        and (entry_0 = ⊥ being exact) induction makes the result exact.
        Returns (value, ok); on ok=False the caller falls back to the
        always-exact summary+replay mode. Cost when validated: ~1.1
        passes instead of summary's ~4.5 — adversarial inputs (e.g. an
        unbroken (ab)* run longer than W crossing a boundary) simply
        fall back."""
        G, lanes, s_tile, blk = self.G, self.lanes, self.s_tile, self.block
        T = n + 2
        nb = -(-T // blk)
        rows = -(-nb // G)
        # warmup pass: E_w = state after scanning the W steps before
        # window w's start from the empty set (t_div pins T_pad == W)
        Tw_pad, Bw_pad, Bw_blk, Tw_chunk, rw = self._geom(
            W, rows, G, t_div=W
        )
        tmw = self._window_tm(data, n, Bw_pad, Tw_pad, rw, lead=W + 1)
        w_idx = self._slot_windows(Bw_pad)
        bosw = 1 - (w_idx * blk - W)
        eosw = (n + 1) - (w_idx * blk - W)
        ones = jnp.ones((G, Bw_pad), DTYPE)
        E = self.scanner._carry_call_b(
            tmw, jnp.zeros((lanes, Bw_pad), DTYPE), ones, bosw, eosw, True,
            Tw_pad, Bw_pad, Bw_blk, Tw_chunk, rw, G,
        )
        # window 0 starts at the true stream head: entry is exactly ⊥
        E = E.at[:s_tile, 0].set(0)
        # replay + exits in one fused pass (same geometry as _sum_impl
        # pass 2)
        T2_pad, B2p, B_blk2, T_chunk2, r2 = self._geom(blk, rows, G)
        assert B2p == Bw_pad, (B2p, Bw_pad)
        tm2 = self._window_tm(data, n, B2p, T2_pad, r2, lead=1)
        w2 = self._slot_windows(B2p)
        bosr2 = 1 - w2 * blk
        eosr2 = (n + 1) - w2 * blk
        cnt, tail, vf = self.scanner._count_v0f_call_b(
            tm2, E, jnp.ones((G, B2p), DTYPE), bosr2, eosr2, True,
            T2_pad, B2p, B_blk2, T_chunk2, r2, G, 0, blk,
        )

        def wstates(x):  # [lanes, B] -> [B*G, s_tile], window-ordered
            return (
                x.reshape(G, s_tile, -1).transpose(2, 0, 1).reshape(-1, s_tile)
            )

        if nb > 1:
            ok = jnp.all(wstates(vf)[: nb - 1] == wstates(E)[1:nb])
        else:
            ok = jnp.bool_(True)
        return self._merge_counts(cnt, tail, mode), ok

    def _spec_or_summary(self, data, *, n: int, mode: str, W: int):
        """Speculative scan with a device-side verdict: one fused program
        computes the speculative value, and lax.cond runs the exact
        summary+replay fallback only when validation fails — the verdict
        never crosses to the host. The summary layout constants build
        OUTSIDE the trace (they are cached on self)."""
        nb = -(-(n + 2) // self.block)
        v0_1, g1 = self._p1_layout(nb, True)
        return self._spec_or_summary_impl(
            data, v0_1, g1, n=n, mode=mode, W=W
        )

    @functools.partial(jax.jit, static_argnames=("self", "n", "mode", "W"))
    def _spec_or_summary_impl(self, data, v0_1, g1, *, n, mode, W):
        val, ok = self._spec_impl(data, n=n, mode=mode, W=W)

        def spec(_):
            return val

        def fallback(_):
            return self._sum_impl(
                data, v0_1, g1, n=n, seeded=True, mode=mode
            )

        return jax.lax.cond(ok, spec, fallback, None)

    # -- dispatch ----------------------------------------------------------
    def _run(self, text, seeded: bool, mode: str):
        n = (
            len(text)
            if isinstance(text, (bytes, bytearray))
            else int(text.shape[0])
        )
        data = (
            jnp.asarray(np.frombuffer(text, np.uint8))
            if isinstance(text, (bytes, bytearray))
            else jnp.asarray(text)
        )
        if seeded and self.overlap is not None:
            if (
                mode in ("count", "any")
                and n > 0
                and self._swar_ov_scanner() is not None
            ):
                return self._swar_ov_impl(data, n=n, mode=mode)
            return self._ov_impl(data, n=n, mode=mode)
        if (
            seeded
            and mode in ("count", "any")
            and not self._wide
            and n > 0
        ):
            from ..utils.config import get_config

            W = get_config().spec_warmup
            if W and n + 2 > self.block:
                # the validation verdict stays DEVICE-RESIDENT: lax.cond
                # selects between the speculative value and the exact
                # summary fallback, so back-to-back cyclic count/any
                # scans pipeline with no per-call tunnel round trip
                # (VERDICT r4 #7; previously `if bool(ok)` synced here).
                # The fallback branch costs one extra compile, executes
                # only on failed validation. RRX_SPEC_WARMUP=0 disables.
                return self._spec_or_summary(data, n=n, mode=mode, W=W)
        if self._wide:
            # unseeded (anchored/fullmatch) scan on a wide tile: portable
            # summary scanner — the packed pseudo-record layout only pays
            # for itself at s_tile <= 32
            if self._portable is None:
                self._portable = LongScanner(self.prog, block=4096)
            buf = (
                text
                if isinstance(text, (bytes, bytearray))
                else np.asarray(text).tobytes()
            )
            return self._tail(jnp.asarray(self._portable._flags(buf, seeded)), n, mode)
        nb = -(-(n + 2) // self.block)
        v0_1, g1 = self._p1_layout(nb, seeded)
        return self._sum_impl(data, v0_1, g1, n=n, seeded=seeded, mode=mode)

    # -- public API ---------------------------------------------------------
    def flags(self, text, *, seeded: bool = True):
        """[T = len+2] accept flags per global stream step (device int8).
        ``text`` may be bytes or a device-resident uint8 array (preferred
        for repeated scans: host->device transfer dominates otherwise)."""
        return self._run(text, seeded, "flags")

    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _rev_impl(self, data, *, n: int):
        """[T] start hits per global stream step: overlapped-window reverse
        scan (suffix overlap — reverse influence dies within ``horizon``)."""
        G, block, o = self.G, self.block, self.overlap
        T = n + 2
        nb = -(-T // block)
        rows = -(-nb // G)
        T_pad, B_pad, B_blk, T_chunk, r = self._geom(block + o, rows, G)
        tm = self._window_tm(data, n, B_pad, T_pad, r, lead=1)
        w = self._slot_windows(B_pad)
        bosr = 1 - w * block
        eosr = (n + 1) - w * block
        hits = self.scanner._rev_call_b(
            tm, bosr, eosr, T_pad, B_pad, B_blk, T_chunk, r
        )  # [T_pad, G, B_pad]
        return (
            hits[:block]
            .transpose(2, 1, 0)
            .reshape(B_pad * G, block)[:nb]
            .reshape(-1)[:T]
        )

    def starts_bitmap(self, text) -> np.ndarray:
        """[len+1] bool: some match starts at position s. Bounded-horizon
        patterns only (the overlapped reverse scan needs a finite suffix
        horizon); cyclic patterns raise ValueError — count/search/fullmatch
        still work there via summary mode."""
        if self.overlap is None:
            raise ValueError(
                "long-string start/span extraction needs a bounded-horizon "
                f"(acyclic) pattern; {self.prog.pattern!r} has unbounded "
                "match length"
            )
        n = len(text) if isinstance(text, (bytes, bytearray)) else text.shape[0]
        data = (
            jnp.asarray(np.frombuffer(text, np.uint8))
            if isinstance(text, (bytes, bytearray))
            else jnp.asarray(text)
        )
        hits = np.asarray(self._rev_impl(data, n=n))
        s = np.clip(np.arange(n + 2) - 1, 0, n)
        out = np.zeros(n + 1, bool)
        np.maximum.at(out, s, hits[: n + 2] > 0)
        if self.prog.nullable:
            out[:] = True
        return out

    def ends_bitmap(self, text) -> np.ndarray:
        """[len+1] bool, pulled to host (O(n) transfer; prefer the scalar
        entry points for repeated large-scale scans)."""
        n = len(text) if isinstance(text, (bytes, bytearray)) else text.shape[0]
        flags = np.asarray(self.flags(text, seeded=True))
        e = np.clip(np.arange(n + 2), 0, n)
        out = np.zeros(n + 1, bool)
        np.maximum.at(out, e, flags[: n + 2] > 0)
        if self.prog.nullable:
            out[:] = True
        return out

    def count_ends(self, text) -> int:
        n = len(text) if isinstance(text, (bytes, bytearray)) else text.shape[0]
        if self.prog.nullable:
            return n + 1
        return int(self._run(text, True, "count"))

    def search(self, text) -> bool:
        if self.prog.nullable:
            return True
        return bool(self._run(text, True, "any"))

    def fullmatch(self, text) -> bool:
        n = len(text) if isinstance(text, (bytes, bytearray)) else text.shape[0]
        if n == 0:
            return self.prog.nullable
        return bool(self._run(text, False, "full"))


def count_window_geom(n: int, blk: int, lead: int):
    """(nw, Lw, nseg) for overlapped run-length windows: nw windows of
    ``blk`` payload bytes each re-scanning ``lead`` context bytes, built
    from nseg shifted block-reshapes of a dead-filled ext buffer. Shared
    by CountLongScanner._win and DistScanner._long_count_spmd so the two
    layouts cannot drift."""
    nw = max(1, -(-n // blk))
    Lw = lead + blk
    nseg = -(-Lw // blk) + 1
    return nw, Lw, nseg


class CountLongScanner:
    """One-long-string scan for counting-plan patterns (fixed-length-body
    ``X{m,n}``: ``a{1,300}``, ``(ab){2,600}``, ...).

    The seeded accept test at stream position t depends only on the last
    ``m*k`` bytes (m body copies of length k), so the string splits into
    ``block``-byte windows that each re-scan ``lead = m*k`` context bytes
    owned by the previous window and are then EXACT — one batched pass
    through the run-length kernels (CountScanner) at full counting-tier
    rate. No summaries, no matrix tiers, no S-dependence: this covers the
    family the reference's broken Roaring tier targets (Parser.cpp:165-168)
    on inputs of one huge string, including unbounded ``X{m,}`` whose
    cyclic follow graph rules out the FastLongScanner overlapped mode.

    Fullmatch has a closed form (length j*k with m <= j <= n and every
    byte in its phase class) — no scan at all."""

    def __init__(self, prog: DeviceProgram, plan, block: int = 32768):
        from . import scan_pallas as spl

        self.prog = prog
        self.m, self.n, self.body = plan  # body = R branch bodies
        self.k = len(self.body[0])
        mm = max(self.m, 1)
        self.lead = mm * self.k
        self.block = max(block, -(-4 * self.lead // 128) * 128)
        # duck-types FastLongScanner for Pattern.finditer_long candidate
        # starts (bounded-horizon patterns only; checked there via horizon)
        self.overlap = self.lead
        self.cs = spl.CountScanner(prog, plan)

    # -- window layout ------------------------------------------------------
    def _win(self, data, n: int, right: bool):
        """[nw, Lw] overlapped windows + [nw] lens. ``right=False``: window
        w = ext[w*blk : w*blk + lead + blk] with ``lead`` left-context bytes
        (0x80 dead filler before the stream start). ``right=True``: window
        w = data[w*blk : w*blk + blk + lead] (right context, reverse pass).
        Built from shifted reshapes — no device gathers."""
        blk, lead = self.block, self.lead
        nw, Lw, nseg = count_window_geom(n, blk, lead)
        ext_len = (nw + nseg) * blk
        ext = jnp.full(ext_len, 128, jnp.uint8)  # 0x80 = dead symbol
        off = 0 if right else lead
        ext = jax.lax.dynamic_update_slice(ext, data, (off,))
        segs = [
            ext[i * blk : (i + nw) * blk].reshape(nw, blk)
            for i in range(nseg)
        ]
        win = jnp.concatenate(segs, axis=1)[:, :Lw]
        w = jnp.arange(nw, dtype=jnp.int32) * blk
        real = jnp.clip(n - w, 0, blk)
        lens = (lead + real) if not right else jnp.minimum(n - w, blk + lead)
        return win, lens.astype(jnp.int32), nw

    # -- fused stats ---------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _stats_impl(self, data, *, n: int):
        win, lens, nw = self._win(data, n, right=False)
        cnt, first, last, _, _ = self.cs.match_stats_b(
            win, lens.reshape(-1, 1), seeded=True, lead=self.lead
        )
        cnt = cnt.reshape(-1)[:nw]
        first = first.reshape(-1)[:nw]
        last = last.reshape(-1)[:nw]
        off = jnp.arange(nw, dtype=jnp.int32) * self.block - self.lead
        big = jnp.iinfo(jnp.int32).max
        gfirst = jnp.min(jnp.where(first >= 0, first + off, big))
        glast = jnp.max(jnp.where(last >= 0, last + off, -1))
        total = jnp.sum(cnt)
        return total, jnp.where(total > 0, gfirst, -1), glast

    @staticmethod
    def _data(text):
        if isinstance(text, (bytes, bytearray)):
            return jnp.asarray(np.frombuffer(text, np.uint8)), len(text)
        return jnp.asarray(text), int(text.shape[0])

    def long_stats(self, text):
        """(count, first_end, last_end) over the whole string, one batched
        device pass."""
        data, n = self._data(text)
        if self.prog.nullable:  # empty match at every position
            return n + 1, 0, n
        if n == 0:
            return 0, -1, -1
        total, first, last = self._stats_impl(data, n=n)
        return int(total), int(first), int(last)

    def _run(self, text, seeded: bool, mode: str):
        """Device-value variant for pipelined callers (bench harness).

        Duck-types ``FastLongScanner._run`` for the modes this tier
        supports: seeded count/any and unseeded fullmatch. Returns the
        un-synced device scalar so K scans can be in flight."""
        data, n = self._data(text)
        if mode == "full":
            return self._full_value(data, n)
        if not seeded or mode not in ("count", "any"):
            raise ValueError(
                f"CountLongScanner._run: unsupported (seeded={seeded}, "
                f"mode={mode!r}) — counting tier has no flag stream"
            )
        total, _, _ = self._stats_impl(data, n=n)
        return total if mode == "count" else total > 0

    def count_ends(self, text) -> int:
        return self.long_stats(text)[0]

    def search(self, text) -> bool:
        return self.count_ends(text) > 0

    def _full_value(self, data, n: int):
        """Whole-string acceptance as a device (or python) bool scalar."""
        if n == 0:
            return jnp.bool_(self.prog.nullable)
        k, mm = self.k, max(self.m, 1)
        j = n // k
        if n % k or j < mm or (self.n and j > self.n):
            return jnp.bool_(False)
        from .scan_pallas import _in_class

        # copy c (bytes c*k..c*k+k-1) must match SOME branch; the whole
        # string matches iff every copy does
        occ = None
        for br in self.body:
            bok = None
            for q in range(k):
                d = data[q::k].astype(jnp.int32)
                t = _in_class(d, br[q])
                bok = t if bok is None else (bok & t)
            occ = bok if occ is None else (occ | bok)
        return jnp.all(occ)

    def fullmatch(self, text) -> bool:
        data, n = self._data(text)
        return bool(self._full_value(data, n))

    # -- bitmaps (ends / candidate starts over the global stream) ----------
    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _ends_impl(self, data, *, n: int):
        win, lens, nw = self._win(data, n, right=False)
        fl = self.cs.forward_flags_b(
            win, lens.reshape(-1, 1), seeded=True
        )  # [nw, Lw + 3] bool, column c = accept at step tg = c - 1
        lead, blk = self.lead, self.block
        # window-local ends e = tg in (lead, lead + blk] own the global
        # positions w*blk + (e - lead); column c = e + 1
        return fl[:nw, lead + 2 : lead + 2 + blk].reshape(-1)[: max(n, 1)]

    def ends_bitmap(self, text) -> np.ndarray:
        """[n+1] bool; bit e = some match ends at e."""
        data, n = self._data(text)
        if self.prog.nullable:
            return np.ones(n + 1, bool)
        out = np.zeros(n + 1, bool)
        if n:
            out[1:] = np.asarray(self._ends_impl(data, n=n))[:n]
        return out

    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _starts_impl(self, data, *, n: int):
        win, lens, nw = self._win(data, n, right=True)
        h = self.cs.reverse_hits_b(
            win, lens.reshape(-1, 1)
        )  # [nw, T] bool, step tg = a match starts at window byte tg-1
        return h[:nw, 1 : 1 + self.block].reshape(-1)[: max(n, 1)]

    def starts_bitmap(self, text) -> np.ndarray:
        """[n+1] bool; bit s = some match starts at s (candidate starts
        for span extraction, Pattern.finditer_long)."""
        data, n = self._data(text)
        if self.prog.nullable:
            return np.ones(n + 1, bool)
        out = np.zeros(n + 1, bool)
        if n:
            out[:n] = np.asarray(self._starts_impl(data, n=n))[:n]
        return out

    # -- closed-form span extraction ----------------------------------------
    def _copies_from(self, arr: np.ndarray) -> np.ndarray:
        """[n] int64: number of consecutive body copies starting at each
        position (run-length analysis, no scan kernels)."""
        n = arr.shape[0]
        k = self.k
        nocc = max(n - k + 1, 0)
        occ = np.zeros(nocc, bool)
        for br in self.body:  # copy starts here iff SOME branch matches
            bok = np.ones(nocc, bool)
            for q, runs in enumerate(br):
                a = arr[q : q + nocc]
                ok = np.zeros(nocc, bool)
                for lo, hi in runs:
                    ok |= (a >= lo) & (a <= hi)
                bok &= ok
            occ |= bok
        C = np.zeros(n + k, np.int64)  # C[s] = occ[s] ? 1 + C[s+k] : 0
        for r in range(k):  # suffix recurrence, vectorized per phase
            o = occ[r::k] if r < occ.shape[0] else np.zeros(0, bool)
            m = o.shape[0]
            if not m:
                continue
            # run length to the right within the phase: distance to the
            # next False (nxt is sorted; searchsorted finds it per index)
            nxt = np.where(~o)[0]
            if len(nxt):
                pos = np.searchsorted(nxt, np.arange(m), side="left")
                safe = np.minimum(pos, len(nxt) - 1)
                bound = np.where(pos < len(nxt), nxt[safe], m)
            else:
                bound = np.full(m, m, np.int64)
            C[r::k][:m] = bound - np.arange(m)
        return C[:n]

    def spans(self, text, *, longest: bool = False):
        """Non-overlapping spans (oracle finditer policy) in closed form:
        a lazy match from start s is always exactly m body copies, a
        greedy one min(copies(s), n) copies — so the whole enumeration is
        a host walk over the copies array. Works for unbounded ``X{m,}``
        too (no finite horizon needed). Nullable patterns fall back to
        the generic per-candidate path (Pattern.finditer_long handles
        them before calling this)."""
        assert not self.prog.nullable, "nullable spans handled by caller"
        if isinstance(text, (bytes, bytearray)):
            arr = np.frombuffer(text, np.uint8)
        else:
            arr = np.asarray(text, np.uint8)
        n = arr.shape[0]
        k, mm = self.k, max(self.m, 1)
        C = self._copies_from(arr)
        starts = np.where(C >= mm)[0]
        out = []
        p = 0
        i = 0
        M = starts.shape[0]
        while i < M:
            s = int(starts[i])
            cap = int(C[s]) if not self.n else min(int(C[s]), self.n)
            e = s + (cap if longest else mm) * k
            out.append((s, e))
            p = e
            i = int(np.searchsorted(starts, p, side="left"))
        return out


def dotstar_core(prog: DeviceProgram):
    """(core_prog, had_trailing_dotstar) for `.*X.*`-shaped patterns, or
    None. Under SEEDED ends semantics a leading ``.*`` is redundant (a
    match may start anywhere already) and a trailing ``.*`` turns the
    ends set into a segmented running-OR of X's ends (segments break at
    dead >= 0x80 bytes, which ``.`` does not match) — so the cyclic
    automaton of the BASELINE-config-2 class (``.*error.*``) never needs
    the summary+replay mode: scan the bounded-horizon core X at the
    overlapped kernel rate and apply a cheap vector epilogue. X must be
    non-nullable (a nullable X makes the whole pattern nullable, which
    callers already special-case)."""
    from ..compiler.nfa import build_nfa_ast
    from ..compiler.parser import Concat, Lit, Repeat, parse
    from ..compiler.program import compile_program

    try:
        node = parse(prog.pattern)
    except Exception:
        return None
    parts = list(node.parts) if isinstance(node, Concat) else [node]
    any_syms = frozenset(range(0x80))

    def is_ds(nd):
        return (
            isinstance(nd, Repeat)
            and nd.lo == 0
            and nd.hi is None
            and isinstance(nd.child, Lit)
            and nd.child.syms == any_syms
        )

    lead = 0
    while lead < len(parts) and is_ds(parts[lead]):
        lead += 1
    trail = 0
    while len(parts) - lead - trail > 0 and is_ds(parts[-1 - trail]):
        trail += 1
    if (lead == 0 and trail == 0) or len(parts) - lead - trail < 1:
        return None
    core_parts = tuple(parts[lead : len(parts) - trail])
    core_ast = core_parts[0] if len(core_parts) == 1 else Concat(core_parts)
    try:
        nfa = build_nfa_ast(core_ast, f"<core:{prog.pattern}>")
    except Exception:
        return None
    if nfa.nullable:
        return None
    core = compile_program(nfa)
    if core.uses_anchor:
        # BOS/EOS inside the core interacts with the stripped context
        # (e.g. `.*^a`): keep those on the generic scanners
        return None
    return core, trail > 0


class DotStarLongScanner:
    """Seeded long-string scan for `.*X.*` rewrites (see dotstar_core).

    count/any/ends run as: inner scan of X (overlapped/counting kernels)
    → device ends bitmap → trailing-``.*`` running-OR epilogue. Fullmatch
    and unseeded scans delegate to a generic scanner for the ORIGINAL
    pattern (the rewrite is exact only for the seeded ends set)."""

    def __init__(self, prog, core_prog, trail: bool, block: int = 16384):
        self.prog = prog
        self.core_prog = core_prog
        self.trail = trail
        self.block = block
        self.inner = make_long_scanner(core_prog, block)
        self.overlap = getattr(self.inner, "overlap", None)
        self._generic = None

    def _fallback(self):
        if self._generic is None:
            try:
                self._generic = FastLongScanner(self.prog, block=self.block)
            except (AssertionError, ValueError):
                self._generic = LongScanner(self.prog, block=4096)
        return self._generic

    @staticmethod
    def _data(text):
        if isinstance(text, (bytes, bytearray)):
            return jnp.asarray(np.frombuffer(text, np.uint8)), len(text)
        return jnp.asarray(text), int(text.shape[0])

    def _ends_post(self, data, *, n: int, mode: str):
        """Plain orchestration (NOT jitted: the inner scanners own jit
        caches with host-side state — e.g. FastLongScanner._p1_layout —
        that must not run under an outer trace); returns un-synced device
        values so callers can pipeline."""
        ends = self._inner_ends(data, n)
        return self._epilogue(ends, data, n=n, mode=mode)

    def _inner_ends(self, data, n: int):
        inner = self.inner
        # inner ends bitmap [n+1] on device (e = 0 impossible: core is
        # non-nullable)
        if isinstance(inner, CountLongScanner):
            if n:
                body = inner._ends_impl(data, n=n)[:n]
                ends = jnp.concatenate(
                    [jnp.zeros(1, bool), body.astype(bool)]
                )
            else:
                ends = jnp.zeros(1, bool)
        else:
            if isinstance(inner, LongScanner):
                flags = scan_long(
                    inner.tables, data, length=n, block=inner.block,
                    seeded=True, bos_class=self.core_prog.bos_class,
                    eos_class=self.core_prog.eos_class,
                )
            else:
                flags = inner._run(data, True, "flags")  # [n+2] by step
            f = flags[: n + 2] > 0
            ends = f[: n + 1]
            ends = ends.at[n].set(ends[n] | f[n + 1])
        return ends

    @functools.partial(jax.jit, static_argnames=("self", "n", "mode"))
    def _epilogue(self, ends, data, *, n: int, mode: str):
        if not (self.trail and n):
            if mode == "count":
                return jnp.sum(ends.astype(jnp.int32))
            if mode == "any":
                return jnp.any(ends)
            return ends
        if mode == "any":
            # a trailing .* can be empty: any X end IS a P end
            return jnp.any(ends)
        dead = data[:n] >= 0x80

        def general(_):
            """Segmented running-OR: e is a P end iff some X end e' <= e
            with no dead byte in [e', e). O(n log n) cummax passes —
            reached only when the text actually contains dead bytes."""
            e_idx = jnp.arange(n + 1, dtype=jnp.int32)
            last_end = jax.lax.cummax(jnp.where(ends, e_idx, -1))
            dd = jnp.where(dead, jnp.arange(1, n + 1, dtype=jnp.int32), 0)
            D = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jax.lax.cummax(dd)]
            )
            return (last_end >= 0) & (last_end >= D)

        if mode == "ends":
            return general(None)
        # count with the single-segment fast path (pure-ASCII text — the
        # overwhelmingly common case): every e >= first X end is a P end
        first = jnp.argmax(ends).astype(jnp.int32)
        cnt_fast = jnp.where(jnp.any(ends), n + 1 - first, 0)
        return jax.lax.cond(
            jnp.any(dead),
            lambda _: jnp.sum(general(None).astype(jnp.int32)),
            lambda _: cnt_fast,
            None,
        )

    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _count_trail_impl(self, data, *, n: int):
        """Trailing-``.*`` count with a DEVICE-RESIDENT dead-byte
        verdict: on pure-ASCII text (the common case) every e >= the
        global FIRST core end is a P end, and that first is exactly the
        SWAR window stats' `first` reduction — no flag stream at all.
        Text containing dead (>= 0x80) bytes keeps the segmented
        running-OR over the flag stream; lax.cond selects on device so
        back-to-back scans pipeline with no per-call host sync (the
        speculative-window verdict pattern)."""
        dead = data[:n] >= 0x80

        def fast(_):
            anyg, firstg = self.inner._swar_ov_first(data, n=n)
            return jnp.where(
                anyg, n + 1 - firstg.astype(jnp.int32), 0
            )

        def slow(_):
            flags = self.inner._ov_impl(data, n=n, mode="flags")
            f = flags[: n + 2] > 0
            ends = f[: n + 1].at[n].set(f[n] | f[n + 1])
            e_idx = jnp.arange(n + 1, dtype=jnp.int32)
            last_end = jax.lax.cummax(jnp.where(ends, e_idx, -1))
            dd = jnp.where(dead, jnp.arange(1, n + 1, dtype=jnp.int32), 0)
            D = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jax.lax.cummax(dd)]
            )
            return jnp.sum(
                ((last_end >= 0) & (last_end >= D)).astype(jnp.int32)
            )

        return jax.lax.cond(jnp.any(dead), slow, fast, None)

    def _run(self, text, seeded: bool, mode: str):
        """FastLongScanner._run duck type (bench pipelining): un-synced
        device values for seeded count/any; everything else generic."""
        if seeded and mode in ("count", "any"):
            if not self.trail and hasattr(self.inner, "_run"):
                # no trailing .*: P's ends ARE the core's ends — take the
                # inner scanner's fastest stats path directly (overlapped
                # / counting / speculative), no flag stream needed
                return self.inner._run(text, seeded, mode)
            data, n = self._data(text)
            if mode == "any":
                # a trailing .* can be empty: any core end IS a P end, so
                # the inner scanner's any path (SWAR windows where they
                # apply) answers directly
                if hasattr(self.inner, "_run"):
                    return self.inner._run(text, seeded, "any")
            elif (
                n > 0
                and isinstance(self.inner, FastLongScanner)
                and self.inner.overlap is not None
                and self.inner._swar_ov_scanner() is not None
            ):
                return self._count_trail_impl(data, n=n)
            return self._ends_post(data, n=n, mode=mode)
        return self._fallback()._run(text, seeded, mode)

    def ends_bitmap(self, text) -> np.ndarray:
        data, n = self._data(text)
        if self.prog.nullable:
            return np.ones(n + 1, bool)
        return np.asarray(self._ends_post(data, n=n, mode="ends"))

    def count_ends(self, text) -> int:
        if self.prog.nullable:
            return self._data(text)[1] + 1
        return int(self._run(text, True, "count"))

    def search(self, text) -> bool:
        if self.prog.nullable:
            return True
        return bool(self._run(text, True, "any"))

    def fullmatch(self, text) -> bool:
        return bool(self._fallback().fullmatch(text))

    def starts_bitmap(self, text) -> np.ndarray:
        return self._fallback().starts_bitmap(text)

    def flags(self, text, *, seeded: bool = True):
        return self._fallback().flags(text, seeded=seeded)


class AliasLongScanner(DotStarLongScanner):
    """Long-string scans for whole-pattern X{m,n} blowups via the X{m,}
    seeded alias (engine.seeded_alias_program): ends AND starts are
    identical under seeded semantics, so count/search/bitmaps run on the
    small alias automaton at kernel rate; fullmatch keeps the original
    program (the bound is observable there)."""

    def __init__(self, prog, core_prog, block: int = 16384):
        super().__init__(prog, core_prog, trail=False, block=block)

    def starts_bitmap(self, text) -> np.ndarray:
        # starts(X{m,n}) == starts(X{m,}) (prefix sub-chains), but the
        # alias is cyclic so the reverse overlapped pass may refuse;
        # surface that as the same bounded-horizon error callers already
        # handle (Pattern.finditer_long gates on `overlap` first)
        inner = self.inner
        if hasattr(inner, "starts_bitmap"):
            return inner.starts_bitmap(text)
        raise ValueError(
            "start extraction over one long string needs a bounded-horizon "
            f"scanner; {self.prog.pattern!r} routes through the cyclic "
            "X{m,} alias — use the batched record API for spans"
        )


def make_long_scanner(prog: DeviceProgram, block: int = 16384):
    """Best available long-string scanner for this program: `.*X.*` and
    X{m,n}-blowup rewrites first, run-length windows for counting-plan
    patterns on the one-record-per-row tiers, packed overlapped/summary
    kernels for dense tiers, portable XLA otherwise."""
    from . import scan_pallas as spl

    if not prog.nullable and prog.horizon is None:
        ds = dotstar_core(prog)
        if ds is not None:
            core_prog, trail = ds
            if core_prog.horizon is not None or spl.counting_plan(
                core_prog
            ):
                return DotStarLongScanner(prog, core_prog, trail, block)
    if prog.tier in ("multiblock", "sparse") and not prog.nullable:
        from ..engine import seeded_alias_program

        aprog = seeded_alias_program(prog)
        if aprog is not None:
            return AliasLongScanner(prog, aprog, block)

    # counting-plan patterns always prefer the run-length windows in long
    # mode: unlike the batched engine there is no G-lane packing edge for
    # the matrix kernels here, and X{m,} (cyclic) would otherwise fall to
    # the far slower summary/portable paths
    plan = spl.counting_plan(prog)
    if plan is not None:
        m, _, branches = plan
        if max(m, 1) * len(branches[0]) <= 1 << 16:
            return CountLongScanner(prog, plan, block=max(block, 32768))
    if prog.F is not None:
        if prog.s_tile <= 32:
            return FastLongScanner(prog, block=block)
        # wide tiles: overlapped windows still run at kernel rate when the
        # horizon is bounded; grow the block so the overlap fits
        if prog.horizon is not None:
            blk = max(block, -(-8 * (prog.horizon + 2) // 128) * 128)
            try:
                return FastLongScanner(prog, block=blk)
            except ValueError:
                pass
    return LongScanner(prog, block=min(block, 4096))
