"""SWAR word scan: one record per u32 lane, automata up to 32 states.

The reference's ``BitSet<1>`` u64 word tier (BitSet.h:9-41, selected at
Parser.cpp:165-168) reborn at vector width: where scan_swar.py packs 4
records into each u32 (8-bit state sets), this module gives every record a
full 32-bit state set — covering 9..32-state programs and, crucially,
**multi-pattern combined automata with accept channels** (SURVEY.md §2.8's
type-erased tier dispatch, extended to the union automaton of
api.MultiPattern). The matmul kernels spend a [128, B] bf16 row advancing
G = 128 // s_tile records one byte; here a [8, B] u32 block advances 8
records per row-op with exact boolean transitions:

* transitions by **(diagonal, gate) decomposition** of the static follow
  matrix (the reference's per-byte row union, NFA.cc:86-100): for each
  distinct delta d = target - source and byte-class gate g, the step is
  ``nxt |= where(gate_g, (v << d) & mask_dg, 0)`` with ``mask_dg`` the
  static bitmask of targets — a chain's whole body costs ~3 ops.
* byte -> gate translation as range compares on int32 byte planes
  (byte_runs; no gathers), with BOS/EOS/liveness folded in per step.
* the byte stream stays u32-packed (4 steps per word, one bitcast + one
  u32 2D transpose — no slow u8/minor-4 layouts); the kernel unpacks one
  byte per step with a shift+mask.
* accept flags emit as per-channel **bit-logs** (bit m of the log word =
  step m's accept for channel p), reduced to (cnt, first, last, full,
  any) in one fused XLA pass exactly like scan_swar._swar_stats.

Only dense-tier programs with s_tile <= 32, ASCII alphabets, and a
reasonably small (delta, gate) set qualify; wider automata keep the
matmul kernels. Constructed by the engine when scan_swar's 8-state tier
does not apply (s_tile in (16, 32), or any s_tile <= 32 multi-pattern).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.program import DeviceProgram
from .scan_pallas import (
    PallasScanner,
    _interpret,
    _round_up,
    _pow2_floor,
)
from .scan_swar import _merge_runs

ROWS = 8  # records per column = u32 rows per step
BIG = 1 << 30
MAX_DG_OPS = 64  # (delta, gate) pairs past this: matmul wins


class WordSpec(NamedTuple):
    """Static per-program plan (hashable: jit/pallas static arg)."""

    # deduped byte-set gates: (((lo, hi), ...) merged runs, bos, eos)
    gates: Tuple[Tuple[Tuple[Tuple[int, int], ...], bool, bool], ...]
    # (delta, ((gate_index, target_bitmask), ...)): the step applies
    # nxt |= where(gate, (v << delta) & mask, 0) per pair
    dg: Tuple[Tuple[int, Tuple[Tuple[int, int], ...]], ...]
    acc_masks: Tuple[int, ...]  # per accept channel: bitmask of states
    has_eos: bool
    has_bos: bool
    S: int


def word_spec(
    prog: DeviceProgram,
    accept_map: Optional[np.ndarray] = None,
    P: int = 1,
) -> Optional[WordSpec]:
    """Build the u32-word plan, or None if the program doesn't qualify.

    ``accept_map`` ([lanes, G * P] 0/1) supplies per-channel accept masks
    for multi-pattern programs (channel p's states are rows of the first
    record tile, engine accept_map construction in api.MultiPattern)."""
    if prog.tier == "sparse" or prog.F is None or prog.s_tile > 32:
        return None
    S = prog.s_tile
    F = np.asarray(prog.F[:S, :S])
    Bw = [int(w[0]) & 0xFFFFFFFF for w in np.asarray(prog.Bc_words)]
    lo, hi, cl = prog.byte_runs
    if len(hi) and int(max(hi)) > 0x7F:
        return None
    runs_all = [(int(l), int(h), int(c)) for l, h, c in zip(lo, hi, cl)]
    bos_c = prog.bos_class if Bw[prog.bos_class] else -1
    eos_c = prog.eos_class if Bw[prog.eos_class] else -1
    gate_ids = {}
    gates = []
    pairs = {}
    has_eos = has_bos = False
    for u in range(S):
        preds = [int(s) for s in range(S) if F[s, u]]
        if not preds:
            continue
        cs = {c for c, w in enumerate(Bw) if (w >> u) & 1}
        if not cs:
            continue
        key = (
            _merge_runs([(l, h) for l, h, c in runs_all if c in cs]),
            bos_c in cs,
            eos_c in cs,
        )
        has_bos = has_bos or key[1]
        has_eos = has_eos or key[2]
        gid = gate_ids.get(key)
        if gid is None:
            gid = gate_ids[key] = len(gates)
            gates.append(key)
        for s in preds:
            k = (u - s, gid)
            pairs[k] = pairs.get(k, 0) | (1 << u)
    if len(pairs) > MAX_DG_OPS:
        return None
    by_d = {}
    for (d, gid), mask in sorted(pairs.items()):
        by_d.setdefault(d, []).append((gid, mask))
    dg = tuple((d, tuple(ps)) for d, ps in sorted(by_d.items()))
    if accept_map is not None:
        A = np.asarray(accept_map)
        acc_masks = []
        for p in range(P):
            m = 0
            for s in range(S):
                if A[s, p]:
                    m |= 1 << s
            acc_masks.append(m)
    else:
        acc = np.asarray(prog.accept)[:S]
        acc_masks = [sum(1 << s for s in range(S) if acc[s])]
    return WordSpec(
        tuple(gates), dg, tuple(acc_masks), has_eos, has_bos, S
    )


# ---------------------------------------------------------------------------
# Stream packing (XLA, fused into the jitted scan call)
# ---------------------------------------------------------------------------


def _word_pack(data, T_pad: int, B_pad: int):
    """[R, L] uint8 raw bytes -> [T_pad // 4, ROWS, B_pad] uint32 stream.
    Record r maps to (row g = r // B_pad, column b = r % B_pad); stream
    step tg sits in word tg // 4, byte lane tg % 4, and carries byte
    j = tg - 1 (step 0 = BOS, encoded by one leading pad column so the
    u32 packing stays aligned). One pad + bitcast + u32 2D transpose —
    no u8/minor-axis-4 layouts (30x slower through XLA)."""
    R, L = data.shape
    rows = ROWS * B_pad
    if rows != R:
        data = jnp.pad(data, ((0, rows - R), (0, 0)))
    dp = jnp.pad(data, ((0, 0), (1, T_pad - L - 1)))  # col tg = byte tg-1
    w = jax.lax.bitcast_convert_type(
        dp.reshape(rows, T_pad // 4, 4), jnp.uint32
    )  # [rows, T_pad // 4]
    w = jnp.transpose(w, (1, 0))  # [T_pad // 4, rows]
    return w.reshape(T_pad // 4, ROWS, B_pad)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _word_kernel(
    len_ref,  # [ROWS, B] int32 lengths
    data_ref,  # [T_chunk // 4, ROWS, B] uint32 byte stream (4 steps/word)
    log_out,  # [T_chunk // 8, ROWS * P, B] uint32 accept bit-logs
    v_s,  # scratch [ROWS, B] uint32 state carry
    pf_s,  # scratch [ROWS * P, B] uint32 previous-step flags ($-dedup)
    *,
    spec: WordSpec,
    P: int,
    seeded: bool,
    T_chunk: int,
):
    j = pl.program_id(1)
    B = v_s.shape[1]
    u32 = jnp.uint32

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((ROWS, B), u32)
        if spec.has_eos:
            pf_s[:] = jnp.zeros((ROWS * P, B), u32)

    lens = len_ref[:]

    from ..utils.config import get_config
    from .scan_swar import _compose_slab, compose_cost

    cfg = get_config()
    compose = (
        cfg.swar_compose
        and len(spec.dg) > 0
        and compose_cost(spec.dg, width=spec.S) <= cfg.swar_compose_terms
    )

    def body(i, _):
        w0 = data_ref[2 * i]
        w1 = data_ref[2 * i + 1]
        v = v_s[:]
        prevs = (
            [pf_s[p * ROWS : (p + 1) * ROWS] != 0 for p in range(P)]
            if spec.has_eos
            else [None] * P
        )
        logws = [jnp.zeros((ROWS, B), u32) for _ in range(P)]
        gates_m = []
        eosb_m = []
        for m in range(8):
            tg = j * T_chunk + i * 8 + m
            jr = tg - 1
            word = w0 if m < 4 else w1
            sh8 = 8 * (m % 4)
            d32 = ((word >> sh8 if sh8 else word) & u32(0xFF)).astype(
                jnp.int32
            )
            # jr == -1 is the BOS step: its stream slot holds a ZERO
            # padding byte, which classes containing byte 0 ([^a], .)
            # would otherwise match — a phantom transition before the
            # record starts (latent since round 4; the SWAR kernel
            # sidesteps it via an unsigned length compare)
            alive = (jr >= 0) & (jr < lens)
            eosb = (jr == lens) if spec.has_eos else None
            gates = []
            for runs, bosf, eosf in spec.gates:
                g = None
                for lo, hi in runs:
                    t = (d32 >= lo) & (d32 <= hi)
                    g = t if g is None else g | t
                g = (g & alive) if g is not None else None
                if bosf:
                    bb = jnp.broadcast_to(jnp.asarray(tg == 0), (ROWS, B))
                    g = bb if g is None else g | bb
                if eosf and eosb is not None:
                    g = eosb if g is None else g | eosb
                gates.append(
                    g
                    if g is not None
                    else jnp.zeros((ROWS, B), jnp.bool_)
                )
            gates_m.append(gates)
            eosb_m.append(eosb)
        if compose:
            # slab-composed stepping (scan_swar._compose_slab, state
            # field = S bits): per-step effective masks per diagonal,
            # composed off the carry chain
            step_maps = []
            injects = []
            for m in range(8):
                tg = j * T_chunk + i * 8 + m
                pairs = []
                for dlt, ps in spec.dg:
                    gm = None
                    for gid, mask in ps:
                        t = jnp.where(gates_m[m][gid], u32(mask), u32(0))
                        gm = t if gm is None else gm | t
                    pairs.append((dlt, gm))
                step_maps.append(pairs)
                injects.append(
                    u32(1)
                    if seeded
                    else jnp.where(tg < 2, u32(1), u32(0))
                )
            vs = _compose_slab(
                v,
                step_maps,
                injects,
                jnp.zeros((ROWS, B), u32),
                width=spec.S,
            )
            v = vs[-1]
        for m in range(8):
            tg = j * T_chunk + i * 8 + m
            gates = gates_m[m]
            eosb = eosb_m[m]
            if compose:
                v_m = vs[m]
            else:
                if seeded:
                    vv = v | u32(1)
                else:
                    vv = jnp.where(tg < 2, v | u32(1), v)
                nxt = None
                for dlt, ps in spec.dg:
                    sh = vv if dlt == 0 else (
                        vv << dlt if dlt > 0 else vv >> -dlt
                    )
                    for gid, mask in ps:
                        t = jnp.where(gates[gid], sh & u32(mask), u32(0))
                        nxt = t if nxt is None else nxt | t
                v = nxt if nxt is not None else jnp.zeros((ROWS, B), u32)
                v_m = v
            for p in range(P):
                fl = (v_m & u32(spec.acc_masks[p])) != 0
                if spec.has_eos:
                    # the EOS step's accept duplicates end == len when the
                    # final byte step already flagged; emit only if new
                    emit = fl & ~(prevs[p] & eosb)
                    prevs[p] = fl
                else:
                    emit = fl
                eb = emit.astype(u32)
                logws[p] = logws[p] | (eb << m if m else eb)
        log_out[i] = jnp.concatenate(logws, axis=0)
        v_s[:] = v
        if spec.has_eos:
            pf_s[:] = jnp.concatenate(
                [pv.astype(u32) for pv in prevs], axis=0
            )
        return 0

    jax.lax.fori_loop(0, T_chunk // 8, body, 0)


# ---------------------------------------------------------------------------
# Bit-log reduction (XLA; one fused pass, no gathers)
# ---------------------------------------------------------------------------


def _word_stats(log, lengths, *, P: int, nullable: bool, seeded: bool):
    """Reduce per-channel accept bit-logs to (cnt, first, last, full, any)
    in external (record-major, channel-minor) order [R_pad, P] — the
    scan_swar._swar_stats formulation, one byte-lane (bits 0-7/word)."""
    nTw, _, B_pad = log.shape
    ln = jnp.asarray(lengths, jnp.int32).reshape(ROWS, B_pad)
    w8 = (jnp.arange(nTw, dtype=jnp.int32) * 8)[:, None, None]
    pc = jax.lax.population_count
    outs = []
    for p in range(P):
        fk = log[:, p * ROWS : (p + 1) * ROWS, :] & jnp.uint32(0xFF)
        cnt = pc(fk).astype(jnp.int32).sum(axis=0)
        nz = fk != 0
        ctz = pc((fk & (~fk + jnp.uint32(1))) - jnp.uint32(1))
        first_tl = jnp.where(nz, w8 + ctz.astype(jnp.int32), BIG).min(axis=0)
        y = fk | (fk >> 1)
        y = y | (y >> 2)
        y = y | (y >> 4)
        last_tl = jnp.where(nz, w8 + pc(y).astype(jnp.int32) - 1, -1).max(
            axis=0
        )
        anyf = cnt > 0
        full = anyf & (last_tl >= ln)
        if nullable:
            full = full | (ln == 0)
            if seeded:
                cnt = ln + 1
                first = jnp.zeros_like(ln)
                last = jnp.where(
                    last_tl < 0, ln, jnp.minimum(last_tl, ln)
                )
            else:
                step0 = (first_tl == 0).astype(jnp.int32)
                cnt = jnp.where(ln == 0, 1, 1 + cnt - step0)
                first = jnp.zeros_like(ln)
                last = jnp.maximum(
                    jnp.minimum(jnp.where(last_tl < 0, 0, last_tl), ln), 0
                )
        else:
            first = jnp.where(
                first_tl >= BIG, -1, jnp.minimum(first_tl, ln)
            )
            last = jnp.where(last_tl < 0, -1, jnp.minimum(last_tl, ln))
        outs.append((cnt, first, last, full, cnt > 0))
    outs = jax.lax.optimization_barrier(outs)

    def ext(xs):  # P x [ROWS, B_pad] -> [R_pad, P] record-major
        return jnp.stack(xs, axis=-1).reshape(-1, P)

    return tuple(
        ext([outs[p][k] for p in range(P)]) for k in range(5)
    )


# ---------------------------------------------------------------------------
# Scanner
# ---------------------------------------------------------------------------


class WordScanner(PallasScanner):
    """PallasScanner with the u32-word fast path on match_stats_b; every
    other primitive inherits the matmul kernels. Constructed by the
    engine when word_spec(prog) qualifies and the 8-state SWAR tier does
    not apply."""

    def __init__(
        self, prog, ptables, accept_map=None, P: int = 1, nullable=None
    ):
        super().__init__(prog, ptables, nullable=nullable)
        self.wspec = word_spec(prog, accept_map=accept_map, P=P)
        assert self.wspec is not None
        self.P = P

    def _geom_word(self, L: int, n_cols: int):
        from ..utils.config import get_config

        cfg = get_config()
        T = L + 2
        b_cap = min(1024, cfg.b_blk_max)
        br = max(n_cols, 1)
        nb = -(-br // b_cap)
        B_blk = min(b_cap, _round_up(-(-br // nb), 128))
        B_pad = _round_up(br, B_blk)
        # bytes per (step, column): stream 8 + log P * 4
        t_cap = max(
            8, (4 * 1024 * 1024) // ((8 + 4 * self.P) * B_blk)
        )
        t_cap = min(_pow2_floor(t_cap), cfg.t_chunk_max)
        T_chunk = min(max(t_cap, 8), max(8, _round_up(T, 8)))
        T_pad = _round_up(T, T_chunk)
        return T, T_pad, B_pad, B_blk, T_chunk

    def match_stats_b(self, data, len_g, *, seeded: bool, lead: int = 0):
        if lead:  # engine-driven windowed mode: inherit the matmul path
            return super().match_stats_b(
                data, len_g, seeded=seeded, lead=lead
            )
        data = jnp.asarray(data)
        B_rows0, G = len_g.shape
        R = B_rows0 * G
        L = data.shape[1]
        lengths = jnp.asarray(len_g).reshape(-1).astype(jnp.int32)
        T, T_pad, B_pad, B_blk, T_chunk = self._geom_word(
            L, -(-R // ROWS)
        )
        cnt, first, last, full, anyf = self._word_call(
            data, lengths, seeded, T_pad, B_pad, B_blk, T_chunk
        )
        P = self.P

        def sl(x):  # [R_pad, P] -> [B_rows0, G * P]
            return x[:R].reshape(B_rows0, G * P)

        return sl(cnt), sl(first), sl(last), sl(full), sl(anyf)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk",
        ),
    )
    def _word_call(
        self, data, lengths, seeded, T_pad, B_pad, B_blk, T_chunk
    ):
        R_pad = B_pad * ROWS
        if lengths.shape[0] != R_pad:
            lengths = jnp.pad(lengths, (0, R_pad - lengths.shape[0]))
        tm = _word_pack(data, T_pad, B_pad)
        lnT = lengths.reshape(ROWS, B_pad)
        P = self.P
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _word_kernel,
            spec=self.wspec,
            P=P,
            seeded=seeded,
            T_chunk=T_chunk,
        )
        log = pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec(
                    (ROWS, B_blk), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T_chunk // 4, ROWS, B_blk),
                    lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk // 8, ROWS * P, B_blk),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad // 8, ROWS * P, B_pad), jnp.uint32
            ),
            scratch_shapes=[
                pltpu.VMEM((ROWS, B_blk), jnp.uint32),
                pltpu.VMEM((ROWS * P, B_blk), jnp.uint32),
            ],
            interpret=_interpret(),
        )(lnT, tm)
        return _word_stats(
            log, lengths, P=P, nullable=self.nullable, seeded=seeded
        )
