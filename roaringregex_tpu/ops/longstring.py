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
    """Long-string scan through the lane-packed Pallas kernels.

    Pass 1 packs each block's S+1 summary pseudo-records (identity states +
    seed accumulator) into MXU rows and carries them with the VMEM-resident
    kernel; pass 2 replays the real block chains from their prefix-combined
    entry states. ~100x the XLA path's row rate. Dense tiers with
    s_tile <= 32 (the common grep patterns); larger automata use
    LongScanner's portable path.
    """

    def __init__(self, prog: DeviceProgram, block: int = 16384):
        from . import scan_packed as sp
        from . import scan_pallas as spl

        assert prog.F is not None and prog.s_tile <= 32, "unsupported tier"
        assert block % 128 == 0, "block must be a multiple of 128"
        self.prog = prog
        self.block = block
        self.ptables = sp.packed_tables(prog)
        self.scanner = spl.PallasScanner(prog, self.ptables)
        self.S = prog.n_states
        self.s_tile, self.G, self.lanes = prog.s_tile, prog.G, prog.lanes
        self.P1 = self.S + 1
        self.rows_pb = -(-self.P1 // self.G)
        k = 32 // self.s_tile
        self.repl = sum(1 << (m * self.s_tile) for m in range(k))
        lo, hi, cl = prog.byte_runs
        self._runs = (lo, hi, prog.Bc_words[cl][:, 0] if len(cl) else
                      np.zeros(0, np.uint32))
        self._bos = int(prog.Bc_words[prog.bos_class][0])
        self._eos = int(prog.Bc_words[prog.eos_class][0])

    # -- global stream of tile mask words --------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "n", "total"))
    def _tile_words(self, data: jnp.ndarray, *, n: int, total: int):
        lo, hi, words = self._runs
        dd = data.astype(jnp.int32)
        tile = jnp.zeros((n,), jnp.uint32)
        for r in range(len(lo)):
            hit = (dd >= int(lo[r])) & (dd <= int(hi[r]))
            tile = tile | jnp.where(hit, jnp.uint32(int(words[r])), jnp.uint32(0))
        out = jnp.zeros((total,), jnp.uint32)
        out = out.at[0].set(jnp.uint32(self._bos))
        out = out.at[1 : n + 1].set(tile)
        out = out.at[n + 1].set(jnp.uint32(self._eos))
        return out

    # -- passes ----------------------------------------------------------
    @functools.partial(
        jax.jit, static_argnames=("self", "n", "seeded")
    )
    def _flags_impl(self, data, v0_1, gates1, gates2, *, n: int, seeded: bool):
        """The full two-pass pipeline as ONE device program (eager op
        dispatch through a remote TPU costs more than the compute)."""
        G, s_tile, lanes = self.G, self.s_tile, self.lanes
        S, P1, rows_pb, block = self.S, self.P1, self.rows_pb, self.block
        T = n + 2
        nb = -(-T // block)
        total = nb * block
        W = lanes // 32
        geom = self.scanner._blk_limits(2048)

        tile = self._tile_words(data, n=n, total=total)
        tile_bn = tile.reshape(nb, block)

        # ---- pass 1: block summaries ---------------------------------
        B1 = nb * rows_pb
        B_blk = min(geom[0], ((B1 + 127) // 128) * 128)
        B1p = -(-B1 // B_blk) * B_blk
        T_chunk = min(geom[1], 128)
        w1 = (tile_bn * jnp.uint32(self.repl)).T  # [block, nb]
        if rows_pb > 1:
            w1 = jnp.repeat(w1, rows_pb, axis=1)
        w1 = jnp.pad(w1, ((0, 0), (0, B1p - B1)))
        stream1 = jnp.broadcast_to(w1[:, None, :], (block, W, B1p))
        vf = self.scanner._carry_call(
            stream1, v0_1, gates1, seeded, block, B1p, B_blk, T_chunk
        )  # [lanes, B1p]
        pr = (
            jnp.transpose(vf[:, :B1], (1, 0))
            .reshape(nb, rows_pb, G, s_tile)
            .reshape(nb, rows_pb * G, s_tile)[:, :P1, :S]
        )
        Ms = pr[:, :S, :].astype(DTYPE)
        ss = pr[:, S, :].astype(DTYPE)
        ventry = prefix_entries(Ms, ss)  # [nb, S]

        # ---- pass 2: replay real blocks ------------------------------
        rows2 = -(-nb // G)
        B_blk2 = min(geom[0], ((rows2 + 127) // 128) * 128)
        B2p = -(-rows2 // B_blk2) * B_blk2
        k = 32 // s_tile
        nbp = B2p * G
        tile_p = jnp.pad(tile_bn, ((0, nbp - nb), (0, 0)))
        t3 = tile_p.T.reshape(block, B2p, W, k)  # g = w*k + m
        shifts = (jnp.arange(k, dtype=jnp.uint32) * s_tile)[
            None, None, None, :
        ]
        w2 = jnp.sum(
            (t3 << shifts).astype(jnp.uint32), axis=3, dtype=jnp.uint32
        )
        stream2 = jnp.transpose(w2, (0, 2, 1))  # [block, W, B2p]
        # scatter entry states into packed lanes: record b = r*G + g
        ve = jnp.pad(ventry, ((0, nbp - nb), (0, s_tile - S)))
        v02 = jnp.transpose(
            ve.reshape(B2p, G, s_tile).reshape(B2p, lanes), (1, 0)
        ).astype(DTYPE)
        flags = self.scanner._flags_v0_call(
            stream2, v02, gates2, seeded, block, B2p, B_blk2,
            min(geom[1], 128),
        )  # [block, G, B2p]
        out = jnp.transpose(flags, (2, 1, 0)).reshape(nbp, block)[:nb]
        return out.reshape(-1)[:T]  # device int8 [T]

    def _host_gates(self, nb: int, seeded: bool):
        """(v0_1, gates1, gates2) for a given block count (cached)."""
        key = (nb, seeded)
        cache = getattr(self, "_gate_cache", None)
        if cache is None:
            cache = self._gate_cache = {}
        if key in cache:
            return cache[key]
        G, s_tile, lanes = self.G, self.s_tile, self.lanes
        S, P1, rows_pb = self.S, self.P1, self.rows_pb
        B1 = nb * rows_pb
        geom = self.scanner._blk_limits(2048)
        B_blk = min(geom[0], ((B1 + 127) // 128) * 128)
        B1p = -(-B1 // B_blk) * B_blk
        v0 = np.zeros((lanes, B1p), np.float32)
        gates = np.zeros((G, B1p), np.float32)
        for kb in range(nb):
            for j in range(rows_pb):
                col = kb * rows_pb + j
                for g in range(G):
                    ps = j * G + g
                    if ps < S:
                        v0[g * s_tile + ps, col] = 1.0
                    elif ps == P1 - 1 and (seeded or kb == 0):
                        gates[g, col] = 1.0
        rows2 = -(-nb // G)
        B_blk2 = min(geom[0], ((rows2 + 127) // 128) * 128)
        B2p = -(-rows2 // B_blk2) * B_blk2
        gates2 = np.zeros((G, B2p), np.float32)
        for b in range(nb if seeded else 1):
            r, g = divmod(b, G)
            gates2[g, r] = 1.0
        out = (
            jnp.asarray(v0, DTYPE),
            jnp.asarray(gates, DTYPE),
            jnp.asarray(gates2, DTYPE),
        )
        cache[key] = out
        return out

    def flags(self, text, *, seeded: bool = True):
        """[T = len+2] accept flags per global stream step (device int8).
        ``text`` may be bytes or a device-resident uint8 array (preferred
        for repeated scans: host->device transfer dominates otherwise)."""
        n = len(text) if isinstance(text, (bytes, bytearray)) else text.shape[0]
        nb = -(-(n + 2) // self.block)
        data = (
            jnp.asarray(np.frombuffer(text, np.uint8))
            if isinstance(text, (bytes, bytearray))
            else jnp.asarray(text)
        )
        v0_1, gates1, gates2 = self._host_gates(nb, seeded)
        return self._flags_impl(
            data, v0_1, gates1, gates2, n=n, seeded=seeded
        )

    @functools.partial(jax.jit, static_argnames=("self", "n", "seeded", "mode"))
    def _reduce_impl(self, data, v0_1, g1, g2, *, n, seeded, mode):
        """flags + scalar reduction in ONE device program (pulling the raw
        flag stream or reducing it eagerly costs more than the scan on a
        remote TPU)."""
        flags = self._flags_impl(data, v0_1, g1, g2, n=n, seeded=seeded)
        if mode == "count":
            body = jnp.sum((flags[:n] > 0).astype(jnp.int32))
            tail = ((flags[n] > 0) | (flags[n + 1] > 0)).astype(jnp.int32)
            return body + tail
        if mode == "any":
            return jnp.any(flags[: n + 2] > 0)
        return (flags[n] > 0) | (flags[n + 1] > 0)  # fullmatch

    def _reduce(self, text, seeded, mode):
        n = len(text) if isinstance(text, (bytes, bytearray)) else text.shape[0]
        nb = -(-(n + 2) // self.block)
        data = (
            jnp.asarray(np.frombuffer(text, np.uint8))
            if isinstance(text, (bytes, bytearray))
            else jnp.asarray(text)
        )
        v0_1, g1, g2 = self._host_gates(nb, seeded)
        return self._reduce_impl(data, v0_1, g1, g2, n=n, seeded=seeded, mode=mode)

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
        return int(self._reduce(text, True, "count"))

    def search(self, text) -> bool:
        if self.prog.nullable:
            return True
        return bool(self._reduce(text, True, "any"))

    def fullmatch(self, text) -> bool:
        n = len(text) if isinstance(text, (bytes, bytearray)) else text.shape[0]
        if n == 0:
            return self.prog.nullable
        return bool(self._reduce(text, False, "full"))


def make_long_scanner(prog: DeviceProgram, block: int = 16384):
    """Best available long-string scanner for this program."""
    if prog.F is not None and prog.s_tile <= 32:
        return FastLongScanner(prog, block=block)
    return LongScanner(prog, block=min(block, 4096))
