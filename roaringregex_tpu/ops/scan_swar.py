"""SWAR bit-packed Pallas scan for tiny automata (s_tile == 8).

The lane-per-state kernels (ops/scan_pallas.py) spend one bf16 VPU lane on
every NFA state: a 7-state ``cat|dog`` program burns a [128, B] register row
to advance 16 records one byte. Profiling (round 3) showed that path is
VPU-bound at ~0.9 ns per column-step — the MXU follow matmul is free, the
elementwise mask/threshold traffic is not. This module is the density fix
for the smallest (and headline) tier: the reference's ``u64 BitSet<1>``
word tier (BitSet.h:9-41, Parser.cpp:165-168) reborn as **SWAR on u32
vector lanes** — 4 records per uint32, 8-bit state sets, 32 records per
vector column:

* state vector ``v``: [8, B] uint32 — byte k of row g8, column b is the
  full reachable-state bitset of one record (exact boolean semantics, no
  bf16, no renormalization).
* transition by **diagonal decomposition** of the static 8x8 Glushkov
  follow matrix (the reference's per-byte row union, NFA.cc:86-100,
  turned inside out): edges sharing the offset d = target - source
  collapse to ``nxt |= (vv << d) & gmask_d`` — a chain like ``c->a->t``
  is ONE shift/AND/OR regardless of length, so the per-step dependent
  chain is ~3 ops per distinct diagonal.
* byte->class gates: SWAR range compares on the per-byte high bit,
  batched over the whole 8-step slab (no cross-step dependence) and
  pre-positioned at each target state's bit so the inner loop pays no
  per-target shifts.
* record lengths stay **in the kernel** as per-byte-lane int32 compares
  batched per slab (alive = byte index < len, EOS = byte index == len,
  BOS = step 0), assembled into SWAR byte masks that AND into the gates.
  An XLA-side sentinel/select pass over the [R, T] byte field was 10x
  more expensive than these in-VMEM compares. Flags beyond step len + 1
  are therefore structurally zero, so the stats reduction needs no
  length masking at all.
* the stream layout is just a quad-local byte interleave + one uint32 2D
  transpose of the raw bytes — both ~30 us at 10 MB (any layout with a
  size-4 minor axis is ~30x slower through XLA's transpose lowering).
* accept flags are emitted as a **bit-log** (bit m of log byte = step m's
  accept), 1/8 byte per scanned byte; counts/first/last/full reduce from
  the log in one fused XLA pass (popcount / ctz / msb per word — no
  gathers, no [B, T] materialization, and no minor-axis stacking, which
  would poison the reduction's layout assignment). For ``$``-patterns
  the EOS step duplicates end == len; the kernel dedups it against the
  previous step so the count is a plain popcount.
* tall-narrow batches (few long records) split into overlapped windows
  in-jit (exact for bounded-horizon anchor-free non-nullable patterns,
  same argument as engine._window_plan) so the kernel always runs wide;
  the windows are two slice-concats, not k strided gathers.

Only s_tile == 8 programs qualify (S <= 8 states after Glushkov
factorization — which covers every BASELINE dense-config pattern); wider
tiles keep the matmul kernels.
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
    B_BLK_MAX,
    STREAM_VMEM_BUDGET,
    PallasScanner,
    _interpret,
    _round_up,
    _pow2_floor,
)

M1 = 0x01010101
M7F = 0x7F7F7F7F
M80 = 0x80808080
RECS = 32  # records per vector column (8 u32 rows x 4 byte lanes)
G8 = 8  # u32 rows per step
BIG = 1 << 30


class SwarSpec(NamedTuple):
    """Static per-program plan (hashable: jit/pallas static arg)."""

    # deduped byte-set gates: (((lo, hi), ...) merged runs, bos, eos)
    gates: Tuple[Tuple[Tuple[Tuple[int, int], ...], bool, bool], ...]
    # per-state positioning: ((gate_index, target_state), ...) — the slab
    # pass shifts gate g's 0x80-mask down to bit ``u`` of each byte
    gpos: Tuple[Tuple[int, int], ...]
    # diagonal decomposition: ((delta, (gpos_index, ...)), ...); the step
    # applies nxt |= (vv << delta) & OR(gmask[i] for i in group)
    diags: Tuple[Tuple[int, Tuple[int, ...]], ...]
    accept_bits: Tuple[int, ...]
    has_eos: bool  # some gate fires on the EOS boundary ($ patterns)
    has_bos: bool  # some gate fires on the BOS step (^ patterns)


class SwarMultiSpec(NamedTuple):
    """Static multi-pattern plan: up to 4 patterns share one u32, one
    8-bit sub-automaton per byte lane ("slot"). The record's byte stream
    is replicated across its quad's four lanes; slot-restricted gate
    masks keep the sub-automata independent (the no-leakage argument is
    per-slot: a diagonal-d group only targets bits u >= d, while any
    bit leaking across a slot boundary lands at u < d)."""

    gates: Tuple  # deduped across slots: ((runs, bos, eos), ...)
    gpos: Tuple[Tuple[int, int, int], ...]  # (gate_index, bit u, slot)
    diags: Tuple[Tuple[int, Tuple[int, ...]], ...]
    accepts: Tuple[Tuple[int, int], ...]  # (slot, accept bit)
    has_eos: bool
    has_bos: bool


def swar_multi_spec(subprogs) -> Optional[SwarMultiSpec]:
    """Merge per-pattern SWAR plans into one slotted plan, or None when
    any pattern disqualifies (> 8 states, non-ASCII) or P > 4."""
    if not subprogs or len(subprogs) > 4:
        return None
    specs = [swar_spec(p) for p in subprogs]
    if any(s is None for s in specs):
        return None
    gate_ids: dict = {}
    gates: list = []
    gpos: list = []
    by_delta: dict = {}
    accepts: list = []
    has_eos = has_bos = False
    for k, sp in enumerate(specs):
        gid_map = {}
        for gi, key in enumerate(sp.gates):
            gid = gate_ids.get(key)
            if gid is None:
                gid = gate_ids[key] = len(gates)
                gates.append(key)
            gid_map[gi] = gid
        pi_map = {}
        for pi, (gi, u) in enumerate(sp.gpos):
            pi_map[pi] = len(gpos)
            gpos.append((gid_map[gi], u, k))
        for d, pis in sp.diags:
            by_delta.setdefault(d, []).extend(pi_map[pi] for pi in pis)
        accepts.extend((k, s) for s in sp.accept_bits)
        has_eos = has_eos or sp.has_eos
        has_bos = has_bos or sp.has_bos
    diags = tuple((d, tuple(pis)) for d, pis in sorted(by_delta.items()))
    return SwarMultiSpec(
        tuple(gates), tuple(gpos), diags, tuple(accepts), has_eos, has_bos
    )


def _merge_runs(runs):
    out = []
    for lo, hi in sorted(runs):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


def swar_spec(prog: DeviceProgram) -> Optional[SwarSpec]:
    """Build the SWAR plan, or None if the program doesn't qualify.

    A position's byte set is the union of every class whose mask contains
    it (a ``.``-labeled position sits in many classes); positions sharing
    the same merged byte-run set share one gate computation."""
    if prog.tier == "sparse" or prog.s_tile != 8 or prog.F is None:
        return None
    F8 = np.asarray(prog.F[:8, :8])
    B8 = [int(w[0]) & 0xFF for w in np.asarray(prog.Bc_words)]
    lo, hi, cl = prog.byte_runs
    if len(hi) and int(max(hi)) > 0x7F:  # never for ASCII programs:
        return None  # byte_class[128:] == 0
    runs_all = [(int(l), int(h), int(c)) for l, h, c in zip(lo, hi, cl)]
    bos_c = prog.bos_class if B8[prog.bos_class] else -1
    eos_c = prog.eos_class if B8[prog.eos_class] else -1
    gate_ids = {}
    gates = []
    gpos = []
    by_delta = {}
    has_eos = has_bos = False
    for u in range(8):
        preds = tuple(int(s) for s in range(8) if F8[s, u])
        if not preds:
            continue
        cs = {c for c, w in enumerate(B8) if (w >> u) & 1}
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
        pi = len(gpos)
        gpos.append((gid, u))
        for s in preds:
            by_delta.setdefault(u - s, []).append(pi)
    diags = tuple((d, tuple(pis)) for d, pis in sorted(by_delta.items()))
    accept_bits = tuple(
        int(s) for s in range(8) if np.asarray(prog.accept)[s]
    )
    return SwarSpec(
        tuple(gates), tuple(gpos), diags, accept_bits, has_eos, has_bos
    )


# ---------------------------------------------------------------------------
# Stream packing (XLA, fused into the jitted scan call)
# ---------------------------------------------------------------------------


def _swar_pack(data, T_pad: int, B_pad: int):
    """[R, L] uint8 raw bytes -> [T_pad // 8, 8 * G8, B_pad] uint32 slab
    stream. Record r maps to (quad q = r // 4, byte lane k = r % 4) and
    quad q to (row g8 = q // B_pad, column b = q % B_pad): one quad-local
    interleave plus one plain 2D uint32 transpose. Stream row t carries
    byte j = t - 1 (row 0 = BOS step); rows past L are padding. No
    sentinel/length editing happens here — the kernel gates liveness from
    the int32 length planes, so padding content is irrelevant."""
    R, L = data.shape
    rows = B_pad * RECS
    if rows != R:
        data = jnp.pad(data, ((0, rows - R), (0, 0)))
    q = data.reshape(rows // 4, 4, L).transpose(0, 2, 1)  # [R/4, L, 4]
    w = jax.lax.bitcast_convert_type(q, jnp.uint32)  # [R/4, L]
    w = jnp.transpose(w, (1, 0))  # [L, R/4]
    w = jnp.pad(w, ((1, T_pad - L - 1), (0, 0)))
    return w.reshape(T_pad, G8, B_pad).reshape(T_pad // 8, 8 * G8, B_pad)


def _len_planes(lengths, B_pad: int):
    """[R] int32 -> [4 * G8, B_pad] per-byte-lane length planes (row
    k * G8 + g8), matching the packed record layout."""
    ln = jnp.asarray(lengths, jnp.int32).reshape(G8, B_pad, 4)
    return ln.transpose(2, 0, 1).reshape(4 * G8, B_pad)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _live_masks(jr, ln64, spec: SwarSpec):
    """Per-slab liveness assembly: jr [8*G8, B] int32 byte indices (-1 =
    BOS step), ln64[k] the k-th byte lane's lengths tiled to slab rows.
    Returns (alive 0xFF-mask, eos 0x80-mask or None, bos 0x80-mask or
    None, eos 0x01-mask or None)."""
    u32 = jnp.uint32
    jru = jr.astype(u32)
    am = None
    em = None
    bm = None
    for k in range(4):
        lnu = ln64[k].astype(u32)
        a = (jru < lnu).astype(u32) * u32(0xFF << (8 * k) & 0xFFFFFFFF)
        am = a if am is None else am | a
        if spec.has_eos:
            e = (jru == lnu).astype(u32) * u32(0x80 << (8 * k) & 0xFFFFFFFF)
            em = e if em is None else em | e
    if spec.has_bos:
        b = (jr == -1).astype(u32) * u32(M80)
        bm = b
    return am, em, bm, (em >> 7) if em is not None else None


def _gates_slab(d_all, am, em, bm, spec: SwarSpec):
    """[8 * G8, B] raw bytes (as u32) + liveness masks -> positioned gate
    masks: gmask[i] has bit ``u`` set per byte iff that record's byte is
    live and in gate gid's byte set, for (gid, u) = spec.gpos[i].
    Batched over the slab and pre-shifted to the target bit so the
    sequential step pays nothing for positioning."""
    u32 = jnp.uint32
    dlo = d_all & u32(M7F)
    noth = (~d_all) & u32(M80)  # bytes >= 0x80 are outside the alphabet
    raw = []
    for runs, bos, eos in spec.gates:
        g = None
        for lo, hi in runs:
            ge = (dlo + u32(((0x80 - lo) * M1) & 0xFFFFFFFF)) & u32(M80)
            le = (u32(((0x80 + hi) * M1) & 0xFFFFFFFF) - dlo) & u32(M80)
            gg = ge & le
            g = gg if g is None else g | gg
        g = (g & noth & am) if g is not None else None
        if bos and bm is not None:
            g = bm if g is None else g | bm
        if eos and em is not None:
            g = em if g is None else g | em
        raw.append(g if g is not None else jnp.zeros_like(d_all))
    return [raw[gid] >> (7 - u) for gid, u in spec.gpos]


def _gates_slab_multi(d_all, am, em, bm, spec: SwarMultiSpec):
    """Slot-restricted gate masks: gmask[i] has bit ``u`` of byte lane
    ``slot`` set per u32 iff that record's byte is live and in gate
    gid's byte set, for (gid, u, slot) = spec.gpos[i]. Identical raw
    SWAR range compares to _gates_slab (the byte is replicated across
    the quad's lanes), then per-slot 0x80 masking before positioning."""
    u32 = jnp.uint32
    dlo = d_all & u32(M7F)
    noth = (~d_all) & u32(M80)
    raw = []
    for runs, bos, eos in spec.gates:
        g = None
        for lo, hi in runs:
            ge = (dlo + u32(((0x80 - lo) * M1) & 0xFFFFFFFF)) & u32(M80)
            le = (u32(((0x80 + hi) * M1) & 0xFFFFFFFF) - dlo) & u32(M80)
            gg = ge & le
            g = gg if g is None else g | gg
        g = (g & noth & am) if g is not None else None
        if bos and bm is not None:
            g = bm if g is None else g | bm
        if eos and em is not None:
            g = em if g is None else g | em
        raw.append(g if g is not None else jnp.zeros_like(d_all))
    return [
        (raw[gid] & u32(0x80 << (8 * slot))) >> (7 - u)
        for gid, u, slot in spec.gpos
    ]


def _sh(x, d: int):
    """Signed u32 shift: << d for d > 0, >> -d for d < 0, identity at 0."""
    return x if d == 0 else (x << d if d > 0 else x >> -d)


def compose_cost(diags, steps: int = 8, width: int = 8) -> int:
    """Static apply-term count of slab-composed stepping for a diagonal
    set: how many ``shift & mask`` terms the per-step state reconstruction
    pays across one 8-byte slab. Composed shifts outside (-width, width)
    have left the state field (8 bits here, S bits for the u32 word tier)
    — the per-step gate ANDs make their masks structurally zero — so they
    are pruned statically. The enable heuristic compares this against
    ``config.swar_compose_terms``."""
    shifts = {0}
    total = 0
    for _ in range(steps):
        shifts = {
            s + d
            for s in shifts
            for d, _ in diags
            if -width < s + d < width
        }
        total += len(shifts)
    return total


def _diag_gms(gmask, diags, m: int):
    """Per-step combined gate mask per diagonal: [(d, OR of the group's
    positioned gate masks, sliced to step m's slab rows), ...]."""
    out = []
    for d, pis in diags:
        gm = gmask[pis[0]][m * G8 : (m + 1) * G8]
        for pi in pis[1:]:
            gm = gm | gmask[pi][m * G8 : (m + 1) * G8]
        out.append((d, gm))
    return out


def _compose_slab(carry, step_maps, injects, zeros, width: int = 8):
    """Slab-composed stepping for ANY diagonal set (generalizes the
    round-4 single-diagonal scheme): compose the per-step bit-linear maps
    OFF the carry chain and reconstruct every per-step state from the
    slab-entry carry in one shift/AND fan-in, so the cross-slab dependent
    chain is ~3 ops deep regardless of the diagonal structure.

    ``step_maps``: per step (application order) the canonical
    ``(shift, mask)`` pairs of that step's map x -> OR_i(sh(x, s_i) & m_i)
    — forward diagonals are ``(d, gm)`` directly; the mirrored reverse
    recurrence ``R' = OR_d sh(R & gm, -d)`` canonicalizes to
    ``(-d, sh(gm, -d))`` by distributing the shift through the AND.
    ``injects``: per step, a value OR-ed into the state BEFORE the step
    (seed word / accept join), or None.

    Gate-derived masks satisfy ``sh(ones, s) & m == m`` (a diagonal-d
    gate only targets bits u >= d for d > 0, u <= 7 + d for d < 0), so
    the identity term elides its AND. Composed shifts accumulate along
    paths; |shift| >= 8 leaves the record field and is pruned — the same
    no-leakage induction as single stepping, applied per composed path.
    Returns the per-step state values in application order ([-1] is the
    slab-exit carry)."""
    C = {0: None}  # composed map: shift -> mask (None = all-ones)
    E = None  # composed inject image (None = zero)
    outs = []
    for pairs, inj in zip(step_maps, injects):
        if inj is not None:
            Ein = inj if E is None else E | inj
        else:
            Ein = E
        newC: dict = {}
        newE = None
        for d, g in pairs:
            if Ein is not None:
                te = _sh(Ein, d) & g
                newE = te if newE is None else newE | te
            for s, msk in C.items():
                ns = s + d
                if not -width < ns < width:
                    continue
                t = g if msk is None else _sh(msk, d) & g
                pv = newC.get(ns)
                newC[ns] = t if pv is None else pv | t
        C, E = newC, newE
        acc = E
        for s, msk in sorted(C.items()):
            t = _sh(carry, s) & msk
            acc = t if acc is None else acc | t
        outs.append(acc if acc is not None else zeros)
    return outs


def _compose_on(spec) -> bool:
    """Shared enable heuristic for slab-composed stepping."""
    from ..utils.config import get_config

    cfg = get_config()
    return (
        cfg.swar_compose
        and len(spec.diags) > 0
        and compose_cost(spec.diags) <= cfg.swar_compose_terms
    )


def _swar_multi_kernel(
    len_ref,  # [4 * G8, B] int32 per-byte-lane lengths
    data_ref,  # [T_chunk // 8, 8 * G8, B] uint32 byte slab
    log_out,  # [T_chunk // 8, G8, B] uint32 accept bit-log (lane = slot)
    v_s,  # scratch [G8, B] uint32 state carry (byte lane = pattern slot)
    pf_s,  # scratch [G8, B] uint32 previous-step flags ($-dedup carry)
    *,
    spec: SwarMultiSpec,
    seeded: bool,
    T_chunk: int,
):
    """Forward scan with one pattern per byte lane (see SwarMultiSpec).
    Same slab structure as _swar_kernel; only the gate construction and
    the accept reduction are slot-aware."""
    j = pl.program_id(1)
    B = v_s.shape[1]
    u32 = jnp.uint32
    seedw = u32(M1)

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((G8, B), u32)
        if spec.has_eos:
            pf_s[:] = jnp.zeros((G8, B), u32)

    ln64 = [
        jnp.broadcast_to(
            len_ref[k * G8 : (k + 1) * G8][None], (8, G8, B)
        ).reshape(8 * G8, B)
        for k in range(4)
    ]
    riota = jax.lax.broadcasted_iota(jnp.int32, (8 * G8, B), 0) // G8
    # shared liveness spec fields (only has_eos / has_bos are read)
    lm_spec = spec

    compose = _compose_on(spec)  # slab-composed stepping (see
    # _compose_slab): one shared composition across every slot

    def body(i, _):
        slab = data_ref[i]
        jr = riota + (j * T_chunk + i * 8 - 1)
        am, em, bm, eos01 = _live_masks(jr, ln64, lm_spec)
        gmask = _gates_slab_multi(slab, am, em, bm, spec)
        v = v_s[:]
        prev = pf_s[:] if spec.has_eos else None
        logw = jnp.zeros((G8, B), u32)
        if compose:
            step_maps = [_diag_gms(gmask, spec.diags, m) for m in range(8)]
            if seeded:
                injects = [seedw] * 8
            else:
                injects = [
                    jnp.where(j * T_chunk + i * 8 + m < 2, seedw, u32(0))
                    for m in range(8)
                ]
            vs = _compose_slab(
                v, step_maps, injects, jnp.zeros((G8, B), u32)
            )
            v = vs[-1]
        for m in range(8):
            if compose:
                v_m = vs[m]
            else:
                tl = j * T_chunk + i * 8 + m
                if seeded:
                    vv = v | seedw
                else:
                    vv = jnp.where(tl < 2, v | seedw, v)
                nxt = None
                for d, pis in spec.diags:
                    gm = gmask[pis[0]][m * G8 : (m + 1) * G8]
                    for pi in pis[1:]:
                        gm = gm | gmask[pi][m * G8 : (m + 1) * G8]
                    sh = vv if d == 0 else (vv << d if d > 0 else vv >> -d)
                    t = sh & gm
                    nxt = t if nxt is None else nxt | t
                v = nxt if nxt is not None else jnp.zeros((G8, B), u32)
                v_m = v
            fl = None
            for (k, s) in spec.accepts:
                t = (v_m >> s if s else v_m) & u32(1 << (8 * k))
                fl = t if fl is None else fl | t
            if fl is not None:
                if spec.has_eos:
                    emit = fl & ~(prev & eos01[m * G8 : (m + 1) * G8])
                    prev = fl
                else:
                    emit = fl
                logw = logw | (emit << m if m else emit)
        log_out[i] = logw
        v_s[:] = v
        if spec.has_eos:
            pf_s[:] = prev
        return 0

    jax.lax.fori_loop(0, T_chunk // 8, body, 0)


def _swar_kernel(
    len_ref,  # [4 * G8, B] int32 per-byte-lane lengths
    data_ref,  # [T_chunk // 8, 8 * G8, B] uint32 byte slab
    log_out,  # [T_chunk // 8, G8, B] uint32 accept bit-log
    v_s,  # scratch [G8, B] uint32 state carry
    pf_s,  # scratch [G8, B] uint32 previous-step flags ($-dedup carry)
    *,
    spec: SwarSpec,
    seeded: bool,
    T_chunk: int,
):
    j = pl.program_id(1)
    B = v_s.shape[1]
    u32 = jnp.uint32
    seedw = u32(M1)  # the initial state is bit 0 of every record tile

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((G8, B), u32)
        if spec.has_eos:
            pf_s[:] = jnp.zeros((G8, B), u32)

    # per-kernel constants: lane lengths tiled to slab rows, byte indices
    ln64 = [
        jnp.broadcast_to(
            len_ref[k * G8 : (k + 1) * G8][None], (8, G8, B)
        ).reshape(8 * G8, B)
        for k in range(4)
    ]
    riota = jax.lax.broadcasted_iota(jnp.int32, (8 * G8, B), 0) // G8

    # slab-composed stepping (see _compose_slab): the recurrence
    # v' = OR_d (sh(v | s, d) & g_d) is bit-linear, so the 8 per-step
    # maps compose OFF the sequential chain into a shift->mask fan
    # (plus an accumulated-seed image); the whole 8-byte slab then
    # advances in ~3 dependent ops regardless of the diagonal count.
    compose = _compose_on(spec)

    def body(i, _):
        slab = data_ref[i]
        jr = riota + (j * T_chunk + i * 8 - 1)
        am, em, bm, eos01 = _live_masks(jr, ln64, spec)
        gmask = _gates_slab(slab, am, em, bm, spec)
        v = v_s[:]
        prev = pf_s[:] if spec.has_eos else None
        logw = jnp.zeros((G8, B), u32)
        if compose:
            step_maps = [_diag_gms(gmask, spec.diags, m) for m in range(8)]
            if seeded:
                injects = [seedw] * 8
            else:
                injects = [
                    jnp.where(j * T_chunk + i * 8 + m < 2, seedw, u32(0))
                    for m in range(8)
                ]
            vs = _compose_slab(
                v, step_maps, injects, jnp.zeros((G8, B), u32)
            )
            v = vs[-1]
        for m in range(8):
            if compose:
                v_m = vs[m]
            else:
                tl = j * T_chunk + i * 8 + m
                if seeded:
                    vv = v | seedw
                else:
                    vv = jnp.where(tl < 2, v | seedw, v)
                nxt = None
                for d, pis in spec.diags:
                    gm = gmask[pis[0]][m * G8 : (m + 1) * G8]
                    for pi in pis[1:]:
                        gm = gm | gmask[pi][m * G8 : (m + 1) * G8]
                    sh = vv if d == 0 else (vv << d if d > 0 else vv >> -d)
                    t = sh & gm
                    nxt = t if nxt is None else nxt | t
                v = nxt if nxt is not None else jnp.zeros((G8, B), u32)
                v_m = v
            fl = None
            for s in spec.accept_bits:
                t = v_m >> s if s else v_m
                fl = t if fl is None else fl | t
            if fl is not None:
                fl = fl & u32(M1)
                if spec.has_eos:
                    # the EOS step's accept duplicates end == len when the
                    # final byte step already flagged; emit only if new
                    emit = fl & ~(prev & eos01[m * G8 : (m + 1) * G8])
                    prev = fl
                else:
                    emit = fl
                logw = logw | (emit << m if m else emit)
        log_out[i] = logw
        v_s[:] = v
        if spec.has_eos:
            pf_s[:] = prev
        return 0

    jax.lax.fori_loop(0, T_chunk // 8, body, 0)


def _swar_reverse_kernel(
    len_ref,  # [4 * G8, B] int32 per-byte-lane lengths
    data_ref,  # [T_chunk // 8, 8 * G8, B] uint32 byte slab (chunk nT-1-j)
    log_out,  # [T_chunk // 8, G8, B] uint32 hit bit-log (chunk nT-1-j)
    r_s,  # scratch [G8, B] uint32 reverse-state carry
    *,
    spec: SwarSpec,
    accm: int,  # OR of M1 << s for accept states s
    T_chunk: int,
):
    """SWAR reverse scan: the matmul _reverse_kernel_b's
    masked = (R + acc) * bits; Rn = F @ masked; hit = sg @ Rn
    as masked_d = (R | accm) & gmask_d; Rn = OR_d (masked_d >> d);
    hit = Rn & M1 (the initial state is bit 0 of every record tile).
    Walks the stream back-to-front; accept states join at every live
    step (a match can end anywhere), exactly like the matmul acc_col."""
    j = pl.program_id(1)
    B = r_s.shape[1]
    u32 = jnp.uint32
    nT = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((G8, B), u32)

    ln64 = [
        jnp.broadcast_to(
            len_ref[k * G8 : (k + 1) * G8][None], (8, G8, B)
        ).reshape(8 * G8, B)
        for k in range(4)
    ]
    riota = jax.lax.broadcasted_iota(jnp.int32, (8 * G8, B), 0) // G8
    nS = T_chunk // 8

    compose = _compose_on(spec)  # slab-composed stepping, mirrored:
    # R' = OR_d sh(R & g_d, -d) canonicalizes to (-d, sh(g_d, -d)) pairs
    # by distributing the shift through the AND (see _compose_slab)

    def body(i, _):
        iq = nS - 1 - i
        slab = data_ref[iq]
        jr = riota + ((nT - 1 - j) * T_chunk + iq * 8 - 1)
        am, em, bm, _ = _live_masks(jr, ln64, spec)
        gmask = _gates_slab(slab, am, em, bm, spec)
        R = r_s[:]
        logw = jnp.zeros((G8, B), u32)
        if compose:
            step_maps = [
                [
                    (-d, _sh(gm, -d))
                    for d, gm in _diag_gms(gmask, spec.diags, m)
                ]
                for m in reversed(range(8))
            ]
            injects = [u32(accm)] * 8
            Rs = _compose_slab(
                R, step_maps, injects, jnp.zeros((G8, B), u32)
            )
            R = Rs[-1]
            for idx, m in enumerate(reversed(range(8))):
                hit = Rs[idx] & u32(M1)
                logw = logw | (hit << m if m else hit)
        else:
            for m in reversed(range(8)):
                Ra = R | u32(accm)
                nxt = None
                for d, pis in spec.diags:
                    gm = gmask[pis[0]][m * G8 : (m + 1) * G8]
                    for pi in pis[1:]:
                        gm = gm | gmask[pi][m * G8 : (m + 1) * G8]
                    t = Ra & gm
                    sh = t if d == 0 else (t >> d if d > 0 else t << -d)
                    nxt = sh if nxt is None else nxt | sh
                R = nxt if nxt is not None else jnp.zeros((G8, B), u32)
                hit = R & u32(M1)
                logw = logw | (hit << m if m else hit)
        log_out[iq] = logw
        r_s[:] = R
        return 0

    jax.lax.fori_loop(0, nS, body, 0)


def _swar_span_kernel(
    len_ref,  # [4 * G8, B] int32 per-byte-lane lengths
    hits_ref,  # [T_chunk // 8, G8, B] uint32 candidate-start bit-log
    data_ref,  # [T_chunk // 8, 8 * G8, B] uint32 byte slab
    ev_out,  # [T_chunk, 4 * G8, B] int32: span start + 1 at emit step
    v_s,  # scratch [G8, B] uint32 anchored-state carry
    pos_s,  # scratch [4 * G8, B] int32: next allowed start position
    cur_s,  # scratch [4 * G8, B] int32: active anchored start (-1 idle)
    *,
    spec: SwarSpec,
    T_chunk: int,
):
    """One-pass lazy span enumeration in SWAR form (the matmul
    _span_kernel_b's claim/anchor/emit loop): the 8-bit anchored
    automaton advances as diagonal shift/AND/OR on u32 words while the
    per-record claim bookkeeping (pos, cur) lives on 4 int32 byte-lane
    planes. Non-nullable patterns only (engine-asserted)."""
    j = pl.program_id(1)
    B = v_s.shape[1]
    u32 = jnp.uint32

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((G8, B), u32)
        pos_s[:] = jnp.zeros((4 * G8, B), jnp.int32)
        cur_s[:] = jnp.full((4 * G8, B), -1, jnp.int32)

    ln64 = [
        jnp.broadcast_to(
            len_ref[k * G8 : (k + 1) * G8][None], (8, G8, B)
        ).reshape(8 * G8, B)
        for k in range(4)
    ]
    lnk = [len_ref[k * G8 : (k + 1) * G8] for k in range(4)]
    riota = jax.lax.broadcasted_iota(jnp.int32, (8 * G8, B), 0) // G8

    def body(i, _):
        slab = data_ref[i]
        jr = riota + (j * T_chunk + i * 8 - 1)
        am, em, bm, _ = _live_masks(jr, ln64, spec)
        gmask = _gates_slab(slab, am, em, bm, spec)
        hlog = hits_ref[i]
        v = v_s[:]
        pos = [pos_s[k * G8 : (k + 1) * G8] for k in range(4)]
        cur = [cur_s[k * G8 : (k + 1) * G8] for k in range(4)]
        for m in range(8):
            tg = j * T_chunk + i * 8 + m
            hit01 = (hlog >> m if m else hlog) & u32(M1)
            sp = jnp.maximum(tg - 1, 0)
            seedm = jnp.zeros((G8, B), u32)
            gates = []
            for k in range(4):
                hk = ((hit01 >> (8 * k)) & u32(1)).astype(jnp.int32) > 0
                claim = (cur[k] < 0) & hk & (pos[k] <= sp) & (sp <= lnk[k])
                cur[k] = jnp.where(claim, sp, cur[k])
                gate = ((cur[k] == tg - 1) | ((cur[k] == 0) & (tg <= 1))) & (
                    cur[k] >= 0
                )
                gates.append(gate)
                g32 = gate.astype(u32)
                seedm = seedm | (g32 << (8 * k) if k else g32)
            vv = v | seedm
            nxt = None
            for d, pis in spec.diags:
                gm = gmask[pis[0]][m * G8 : (m + 1) * G8]
                for pi in pis[1:]:
                    gm = gm | gmask[pi][m * G8 : (m + 1) * G8]
                sh = vv if d == 0 else (vv << d if d > 0 else vv >> -d)
                t = sh & gm
                nxt = t if nxt is None else nxt | t
            v = nxt if nxt is not None else jnp.zeros((G8, B), u32)
            fl = None
            for s in spec.accept_bits:
                t = v >> s if s else v
                fl = t if fl is None else fl | t
            fl01 = (fl & u32(M1)) if fl is not None else jnp.zeros((G8, B), u32)
            killm = jnp.zeros((G8, B), u32)
            evs = []
            for k in range(4):
                fk = ((fl01 >> (8 * k)) & u32(1)).astype(jnp.int32) > 0
                e = jnp.minimum(tg, lnk[k])
                done = fk & (cur[k] >= 0) & (e >= cur[k])
                evs.append(jnp.where(done, cur[k] + 1, 0))
                pos[k] = jnp.where(done, jnp.maximum(e, cur[k] + 1), pos[k])
                cur[k] = jnp.where(done, -1, cur[k])
                d32 = done.astype(u32) * u32(0xFF)
                killm = killm | (d32 << (8 * k) if k else d32)
            v = v & ~killm
            ev_out[i * 8 + m] = jnp.concatenate(evs, axis=0)
        v_s[:] = v
        pos_s[:] = jnp.concatenate(pos, axis=0)
        cur_s[:] = jnp.concatenate(cur, axis=0)
        return 0

    jax.lax.fori_loop(0, T_chunk // 8, body, 0)


def _swar_anchor_kernel(
    len_ref,  # [4 * G8, B] int32 per-byte-lane lengths
    starts_ref,  # [4 * G8, B] int32 per-record match start (-1 inactive)
    data_ref,  # [T_chunk // 8, 8 * G8, B] uint32 byte slab
    log_out,  # [T_chunk // 8, G8, B] uint32 accept bit-log
    v_s,  # scratch [G8, B] uint32 anchored-state carry
    *,
    spec: SwarSpec,
    T_chunk: int,
):
    """Anchored rescan in SWAR form (the matmul _anchor_end_kernel_b's
    automaton, bit-logged): each record's 8-bit automaton is seeded only
    at its given start position; accepts stream out as a bit-log and the
    XLA reduction picks the first (lazy) or last (greedy leftmost-longest,
    the POSIX policy) end. Start gate mirrors the matmul kernel:
    seed at step start+1, or steps <= 1 when start == 0."""
    j = pl.program_id(1)
    B = v_s.shape[1]
    u32 = jnp.uint32

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((G8, B), u32)

    ln64 = [
        jnp.broadcast_to(
            len_ref[k * G8 : (k + 1) * G8][None], (8, G8, B)
        ).reshape(8 * G8, B)
        for k in range(4)
    ]
    stk = [starts_ref[k * G8 : (k + 1) * G8] for k in range(4)]
    riota = jax.lax.broadcasted_iota(jnp.int32, (8 * G8, B), 0) // G8

    compose = _compose_on(spec)  # slab-composed stepping (see
    # _compose_slab); the per-record start gates are v-independent, so
    # they fold into the accumulated-inject image

    def body(i, _):
        slab = data_ref[i]
        jr = riota + (j * T_chunk + i * 8 - 1)
        am, em, bm, _ = _live_masks(jr, ln64, spec)
        gmask = _gates_slab(slab, am, em, bm, spec)
        v = v_s[:]
        logw = jnp.zeros((G8, B), u32)
        seedms = []
        for m in range(8):
            tg = j * T_chunk + i * 8 + m
            seedm = jnp.zeros((G8, B), u32)
            for k in range(4):
                gate = (
                    (stk[k] == tg - 1) | ((stk[k] == 0) & (tg <= 1))
                ) & (stk[k] >= 0)
                g32 = gate.astype(u32)
                seedm = seedm | (g32 << (8 * k) if k else g32)
            seedms.append(seedm)
        if compose:
            step_maps = [_diag_gms(gmask, spec.diags, m) for m in range(8)]
            vs = _compose_slab(
                v, step_maps, seedms, jnp.zeros((G8, B), u32)
            )
            v = vs[-1]
        for m in range(8):
            if compose:
                v_m = vs[m]
            else:
                vv = v | seedms[m]
                nxt = None
                for d, pis in spec.diags:
                    gm = gmask[pis[0]][m * G8 : (m + 1) * G8]
                    for pi in pis[1:]:
                        gm = gm | gmask[pi][m * G8 : (m + 1) * G8]
                    sh = vv if d == 0 else (vv << d if d > 0 else vv >> -d)
                    t = sh & gm
                    nxt = t if nxt is None else nxt | t
                v = nxt if nxt is not None else jnp.zeros((G8, B), u32)
                v_m = v
            fl = None
            for s in spec.accept_bits:
                t = v_m >> s if s else v_m
                fl = t if fl is None else fl | t
            if fl is not None:
                emit = fl & u32(M1)
                logw = logw | (emit << m if m else emit)
        log_out[i] = logw
        v_s[:] = v
        return 0

    jax.lax.fori_loop(0, T_chunk // 8, body, 0)


# ---------------------------------------------------------------------------
# Bit-log reduction (XLA; one fused pass, no gathers)
# ---------------------------------------------------------------------------


def _anchor_ends(log, lengths, *, longest: bool):
    """Reduce an anchored accept bit-log to the end per record: smallest
    (lazy) or largest (greedy) e = min(step, len) with an accept; -1 when
    none. Same ctz/msb formulation as _swar_stats."""
    nTw, _, B_pad = log.shape
    ln = jnp.asarray(lengths, jnp.int32).reshape(G8, B_pad, 4)
    ln = jnp.concatenate([ln[:, :, k] for k in range(4)], axis=0)
    w8 = (jnp.arange(nTw, dtype=jnp.int32) * 8)[:, None, None]
    pc = jax.lax.population_count
    outs = []
    for k in range(4):
        fk = (log >> (8 * k)) & jnp.uint32(0xFF)
        nz = fk != 0
        if longest:
            y = fk | (fk >> 1)
            y = y | (y >> 2)
            y = y | (y >> 4)
            tl = jnp.where(
                nz, w8 + pc(y).astype(jnp.int32) - 1, -1
            ).max(axis=0)
            outs.append(jnp.where(tl < 0, -1, jnp.minimum(tl, ln[k * G8 : (k + 1) * G8])))
        else:
            ctz = pc((fk & (~fk + jnp.uint32(1))) - jnp.uint32(1))
            tl = jnp.where(nz, w8 + ctz.astype(jnp.int32), BIG).min(axis=0)
            outs.append(
                jnp.where(tl >= BIG, -1, jnp.minimum(tl, ln[k * G8 : (k + 1) * G8]))
            )
    return jnp.concatenate(outs, axis=0)  # [4 * G8, B_pad]


def _swar_stats(log, lengths, *, nullable: bool, seeded: bool, lead: int = 0):
    """Reduce the accept bit-log to (cnt, first, last, full, any) per
    record, matching _match_kernel_b's stat semantics: ends are
    e = min(step, len); the EOS duplicate is already deduped in-kernel;
    flags beyond step len + 1 are structurally zero (length gating), so
    only [R]-sized clips touch lengths. ``lead`` > 0 suppresses flags at
    steps <= lead (windowed mode: the overlap prefix belongs to the
    previous window). Everything reduces over the word axis in natural
    layouts — per-k results are concatenated on axis 0, never stacked on
    a new minor axis (which would poison the whole reduction's layout)."""
    nTw, _, B_pad = log.shape
    ln = jnp.asarray(lengths, jnp.int32).reshape(G8, B_pad, 4)
    ln = jnp.concatenate([ln[:, :, k] for k in range(4)], axis=0)  # [4G8,B]
    w8 = (jnp.arange(nTw, dtype=jnp.int32) * 8)[:, None, None]
    pc = jax.lax.population_count
    if lead:
        wmask = np.zeros(nTw, np.uint32)
        for w in range(nTw):
            keep = 0
            for b in range(8):
                if w * 8 + b > lead:
                    keep |= 1 << b
            wmask[w] = (keep * M1) & 0xFFFFFFFF
        log = log & jnp.asarray(wmask)[:, None, None]
    cnts, firsts, lasts = [], [], []
    for k in range(4):
        fk = (log >> (8 * k)) & jnp.uint32(0xFF)
        cnts.append(pc(fk).astype(jnp.int32).sum(axis=0))
        nz = fk != 0
        ctz = pc((fk & (~fk + jnp.uint32(1))) - jnp.uint32(1))
        firsts.append(
            jnp.where(nz, w8 + ctz.astype(jnp.int32), BIG).min(axis=0)
        )
        y = fk | (fk >> 1)
        y = y | (y >> 2)
        y = y | (y >> 4)
        lasts.append(
            jnp.where(nz, w8 + pc(y).astype(jnp.int32) - 1, -1).max(axis=0)
        )
    cat = lambda xs: jnp.concatenate(xs, axis=0)  # [4 * G8, B_pad]
    cnt = cat(cnts)
    first_tl = cat(firsts)
    last_tl = cat(lasts)
    anyf = cnt > 0
    full = anyf & (last_tl >= ln)
    if nullable:
        full = full | (ln == 0)
        if seeded:
            # every position ends an empty match (closed form, kernel
            # parity with _match_kernel_b's nullable init); ``last``
            # still tracks the final raw accept, falling back to len
            cnt = ln + 1
            first = jnp.zeros_like(ln)
            last = jnp.where(last_tl < 0, ln, jnp.minimum(last_tl, ln))
        else:
            # end 0 is pre-counted and a step-0 flag duplicates it; on an
            # empty record EVERY flag clips to end 0 (the EOS step is step
            # 1 with e = min(1, 0) = 0 — '$'-bearing nullable patterns like
            # '(a|$)*'), so cnt is exactly the one pre-counted empty match
            step0 = (first_tl == 0).astype(jnp.int32)
            cnt = jnp.where(ln == 0, 1, 1 + cnt - step0)
            first = jnp.zeros_like(ln)
            last = jnp.maximum(
                jnp.minimum(jnp.where(last_tl < 0, 0, last_tl), ln), 0
            )
    else:
        first = jnp.where(first_tl >= BIG, -1, jnp.minimum(first_tl, ln))
        last = jnp.where(last_tl < 0, -1, jnp.minimum(last_tl, ln))
    # cut fusion before the tiny re-layout to external record order so the
    # [.., 4]-minor transpose can't poison the reduction's layouts
    cnt, first, last, full, anyf = jax.lax.optimization_barrier(
        (cnt, first, last, full, anyf)
    )

    def ext(x):  # [4 * G8, B_pad] (k-major) -> [R] external (quad-major)
        return x.reshape(4, G8, B_pad).transpose(1, 2, 0).reshape(-1)

    return ext(cnt), ext(first), ext(last), ext(full), ext(anyf)


# ---------------------------------------------------------------------------
# Scanner
# ---------------------------------------------------------------------------


class SwarScanner(PallasScanner):
    """PallasScanner with SWAR fast paths on match_stats_b, reverse_hits_b,
    lazy_spans_b, greedy_spans_b and the anchored rescan (anchor_end_b,
    lazy + longest); forward_flags_b inherits the matmul kernels.
    Constructed by the engine only when swar_spec(prog) qualifies
    (s_tile == 8, single accept channel)."""

    def __init__(self, prog, ptables, nullable=None):
        super().__init__(prog, ptables, nullable=nullable)
        self.sspec = swar_spec(prog)
        assert self.sspec is not None
        accm = 0
        for s in self.sspec.accept_bits:
            accm |= (M1 << s) & 0xFFFFFFFF
        self._accm = accm

    def _geom_swar(self, L: int, n_cols: int):
        from ..utils.config import get_config

        cfg = get_config()
        T = L + 2
        b_cap = min(B_BLK_MAX, cfg.b_blk_max)
        br = max(n_cols, 1)
        nb = -(-br // b_cap)
        B_blk = min(b_cap, _round_up(-(-br // nb), 128))
        B_pad = _round_up(br, B_blk)
        # slab VMEM per fori step = 8 steps x G8 rows x 4 B = 256 B/column
        t_cap = max(8, STREAM_VMEM_BUDGET * 8 // (256 * B_blk))
        t_cap = min(_pow2_floor(t_cap), cfg.t_chunk_max)
        T_chunk = min(max(t_cap, 8), max(8, _round_up(T, 8)))
        T_pad = _round_up(T, T_chunk)
        return T, T_pad, B_pad, B_blk, T_chunk

    def _swar_window(self, L: int, B: int, seeded: bool):
        """(k, w, h) split of long records into k overlapped windows, or
        None. Exactness argument = engine._window_plan: every match fits
        in h = horizon bytes, the pattern is anchor-free (so per-window
        BOS/EOS handling is inert) and non-nullable; flags in the h-byte
        warm-up prefix belong to the previous window and are suppressed
        (lead masking in _swar_stats). Unlike the matmul path's opt-in
        knob, SWAR windows by default: its column count is 2x lower
        (32 records/column), so tall-narrow batches bind sooner, and the
        window build is two slice-concats inside the fused jit."""
        from ..utils.config import get_config

        p = self.prog
        if not seeded or self.nullable or p.nullable or p.uses_anchor:
            return None
        h = p.horizon
        if h is None or h > 64:
            return None
        w_min = max(128, 4 * h)
        target = get_config().swar_window_cols
        if not target or L < 2 * w_min:
            return None
        cols = -(-B // RECS)
        if cols >= target:
            return None
        k = min(L // w_min, -(-target // cols))
        if k < 2:
            return None
        w = -(-L // k)
        k = -(-L // w)
        return (k, w, h) if k >= 2 else None

    def match_stats_b(self, data, len_g, *, seeded: bool, lead: int = 0):
        if lead and self.nullable:
            # windowed-nullable count corrections live on the matmul path
            return super().match_stats_b(data, len_g, seeded=seeded, lead=lead)
        data = jnp.asarray(data)
        B_rows0, G = len_g.shape
        B = B_rows0 * G
        L = data.shape[1]
        lengths = jnp.asarray(len_g).reshape(-1).astype(jnp.int32)
        win = self._swar_window(L, B, seeded) if not lead else None
        if win is not None:
            k, w, h = win
            T, T_pad, B_pad, B_blk, T_chunk = self._geom_swar(
                w + h, -(-(B * k) // RECS)
            )
            cnt, first, last, full = self._swar_call_win(
                data, lengths, k, w, h, T_pad, B_pad, B_blk, T_chunk
            )
        else:
            T, T_pad, B_pad, B_blk, T_chunk = self._geom_swar(
                L, -(-B // RECS)
            )
            cnt, first, last, full = self._swar_call(
                data, lengths, seeded, T_pad, B_pad, B_blk, T_chunk,
                lead=lead,
            )
        sl = lambda x: x[:B].reshape(B_rows0, G)
        cnt = sl(cnt)
        return cnt, sl(first), sl(last), sl(full), cnt > 0

    def _geom_swar_spans(self, L: int, n_cols: int):
        """Span-path geometry: the [T_chunk, 32, B_blk] int32 event block
        (128 B/column-step) plus slab (32) and hit log (4) dominate VMEM;
        cap columns at 512 and fit T_chunk to a ~6 MB block budget."""
        from ..utils.config import get_config

        cfg = get_config()
        T = L + 2
        b_cap = min(512, cfg.b_blk_max)
        br = max(n_cols, 1)
        nb = -(-br // b_cap)
        B_blk = min(b_cap, _round_up(-(-br // nb), 128))
        B_pad = _round_up(br, B_blk)
        t_cap = max(8, (6 * 1024 * 1024) // (164 * B_blk))
        t_cap = min(_pow2_floor(t_cap), cfg.t_chunk_max)
        T_chunk = min(max(t_cap, 8), max(8, _round_up(T, 8)))
        T_pad = _round_up(T, T_chunk)
        return T, T_pad, B_pad, B_blk, T_chunk

    def _swar_reverse_pl(self, tm, lnT, T_pad, B_pad, B_blk, T_chunk):
        """[T_pad // 8, G8, B_pad] uint32 hit bit-log (back-to-front walk)."""
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _swar_reverse_kernel, spec=self.sspec, accm=self._accm,
            T_chunk=T_chunk,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec(
                    (4 * G8, B_blk), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T_chunk // 8, 8 * G8, B_blk),
                    lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk // 8, G8, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad // 8, G8, B_pad), jnp.uint32
            ),
            scratch_shapes=[pltpu.VMEM((G8, B_blk), jnp.uint32)],
            interpret=_interpret(),
        )(lnT, tm)

    def reverse_hits_b(self, data, len_g):
        """[B, T] start-position hits via the SWAR reverse kernel."""
        data = jnp.asarray(data)
        B_rows0, G = len_g.shape
        B = B_rows0 * G
        L = data.shape[1]
        lengths = jnp.asarray(len_g).reshape(-1).astype(jnp.int32)
        T, T_pad, B_pad, B_blk, T_chunk = self._geom_swar(L, -(-B // RECS))
        h = self._swar_rev_call(data, lengths, T_pad, B_pad, B_blk, T_chunk)
        return h[:B, :T]

    @functools.partial(
        jax.jit,
        static_argnames=("self", "T_pad", "B_pad", "B_blk", "T_chunk"),
    )
    def _swar_rev_call(self, data, lengths, T_pad, B_pad, B_blk, T_chunk):
        R_pad = B_pad * RECS
        if lengths.shape[0] != R_pad:
            lengths = jnp.pad(lengths, (0, R_pad - lengths.shape[0]))
        tm = _swar_pack(data, T_pad, B_pad)
        lnT = _len_planes(lengths, B_pad)
        hlog = self._swar_reverse_pl(tm, lnT, T_pad, B_pad, B_blk, T_chunk)
        # unpack bit-log -> [R, T] bool in external record order
        nTw, _, Bp = hlog.shape
        ks = []
        for k in range(4):
            fk = (hlog >> (8 * k)) & jnp.uint32(0xFF)
            bits = (fk[..., None] >> jnp.arange(8, dtype=jnp.uint32)) & 1
            ks.append(
                bits.transpose(0, 3, 1, 2).reshape(nTw * 8, G8, Bp)
            )
        h = jnp.stack(ks, axis=0)  # [4, T_pad, G8, B_pad]
        return (
            h.transpose(2, 3, 0, 1).reshape(G8 * Bp * 4, nTw * 8) > 0
        )

    def lazy_spans_b(self, data, len_g, *, cap: int):
        if self.nullable or self.prog.nullable:
            return super().lazy_spans_b(data, len_g, cap=cap)
        data = jnp.asarray(data)
        B_rows0, G = len_g.shape
        B = B_rows0 * G
        L = data.shape[1]
        lengths = jnp.asarray(len_g).reshape(-1).astype(jnp.int32)
        T, T_pad, B_pad, B_blk, T_chunk = self._geom_swar_spans(
            L, -(-B // RECS)
        )
        s, e, c = self._swar_spans_call(
            data, lengths, cap, T, T_pad, B_pad, B_blk, T_chunk
        )
        return s[:B], e[:B], c[:B]

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "cap", "T", "T_pad", "B_pad", "B_blk", "T_chunk",
        ),
    )
    def _swar_spans_call(
        self, data, lengths, cap, T, T_pad, B_pad, B_blk, T_chunk
    ):
        R_pad = B_pad * RECS
        if lengths.shape[0] != R_pad:
            lengths = jnp.pad(lengths, (0, R_pad - lengths.shape[0]))
        tm = _swar_pack(data, T_pad, B_pad)
        lnT = _len_planes(lengths, B_pad)
        hlog = self._swar_reverse_pl(tm, lnT, T_pad, B_pad, B_blk, T_chunk)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _swar_span_kernel, spec=self.sspec, T_chunk=T_chunk
        )
        ev = pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec(
                    (4 * G8, B_blk), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T_chunk // 8, G8, B_blk), lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T_chunk // 8, 8 * G8, B_blk), lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, 4 * G8, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad, 4 * G8, B_pad), jnp.int32
            ),
            scratch_shapes=[
                pltpu.VMEM((G8, B_blk), jnp.uint32),
                pltpu.VMEM((4 * G8, B_blk), jnp.int32),
                pltpu.VMEM((4 * G8, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lnT, hlog, tm)
        # compaction: event stream -> fixed-capacity span buffers (same
        # formulation as the matmul _spans_call_b)
        ev2 = (
            ev[:T]
            .reshape(T, 4, G8, B_pad)
            .transpose(2, 3, 1, 0)
            .reshape(R_pad, T)
        )
        mask = ev2 > 0
        idx = jnp.cumsum(mask, axis=1) - 1
        cnt = mask.sum(axis=1)
        kk = jnp.where(mask & (idx < cap), idx, cap)
        b = jnp.arange(R_pad)[:, None]
        neg = jnp.full((R_pad, cap + 1), -1, jnp.int32)
        starts = neg.at[b, kk].max(jnp.where(mask, ev2 - 1, -1))
        e_val = jnp.minimum(jnp.arange(T)[None, :], lengths[:, None])
        ends = neg.at[b, kk].max(jnp.where(mask, e_val, -1))
        return starts[:, :cap], ends[:, :cap], cnt

    # -- anchored rescan (lazy + greedy ends) ---------------------------
    def _swar_anchor_pl(self, tm, lnT, stT, T_pad, B_pad, B_blk, T_chunk):
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _swar_anchor_kernel, spec=self.sspec, T_chunk=T_chunk
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec(
                    (4 * G8, B_blk), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (4 * G8, B_blk), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T_chunk // 8, 8 * G8, B_blk),
                    lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk // 8, G8, B_blk),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad // 8, G8, B_pad), jnp.uint32
            ),
            scratch_shapes=[pltpu.VMEM((G8, B_blk), jnp.uint32)],
            interpret=_interpret(),
        )(lnT, stT, tm)

    def anchor_end_b(self, data, len_g, starts_g, *, longest: bool):
        data = jnp.asarray(data)
        B_rows0, G = len_g.shape
        B = B_rows0 * G
        L = data.shape[1]
        lengths = jnp.asarray(len_g).reshape(-1).astype(jnp.int32)
        starts = jnp.asarray(starts_g).reshape(-1).astype(jnp.int32)
        T, T_pad, B_pad, B_blk, T_chunk = self._geom_swar(L, -(-B // RECS))
        end = self._swar_anchor_call(
            data, lengths, starts, longest, T_pad, B_pad, B_blk, T_chunk
        )
        return end[:B].reshape(B_rows0, G)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "longest", "T_pad", "B_pad", "B_blk", "T_chunk",
        ),
    )
    def _swar_anchor_call(
        self, data, lengths, starts, longest, T_pad, B_pad, B_blk, T_chunk
    ):
        R_pad = B_pad * RECS
        if lengths.shape[0] != R_pad:
            lengths = jnp.pad(lengths, (0, R_pad - lengths.shape[0]))
            starts = jnp.pad(
                starts, (0, R_pad - starts.shape[0]), constant_values=-1
            )
        tm = _swar_pack(data, T_pad, B_pad)
        lnT = _len_planes(lengths, B_pad)
        stT = _len_planes(starts, B_pad)
        log = self._swar_anchor_pl(
            tm, lnT, stT, T_pad, B_pad, B_blk, T_chunk
        )
        end = _anchor_ends(log, lengths, longest=longest)

        def ext(x):  # [4 * G8, B_pad] (k-major) -> [R] external order
            return x.reshape(4, G8, B_pad).transpose(1, 2, 0).reshape(-1)

        return ext(end)

    def greedy_spans_b(self, data, len_g, *, cap: int):
        """Greedy (leftmost-longest) spans with the SWAR reverse +
        anchored kernels inside the device-side rescan rounds (same
        round structure as the matmul greedy_spans_b)."""
        if self.nullable or self.prog.nullable:
            return super().greedy_spans_b(data, len_g, cap=cap)
        data = jnp.asarray(data)
        B_rows0, G = len_g.shape
        B = B_rows0 * G
        L = data.shape[1]
        lengths = jnp.asarray(len_g).reshape(-1).astype(jnp.int32)
        T, T_pad, B_pad, B_blk, T_chunk = self._geom_swar(L, -(-B // RECS))
        s, e, c, o = self._swar_greedy_call(
            data, lengths, cap, T, T_pad, B_pad, B_blk, T_chunk
        )
        return s[:B], e[:B], c[:B], o[:B]

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "cap", "T", "T_pad", "B_pad", "B_blk", "T_chunk",
        ),
    )
    def _swar_greedy_call(
        self, data, lengths, cap, T, T_pad, B_pad, B_blk, T_chunk
    ):
        """Greedy rounds in the SWAR k-major plane layout END TO END:
        candidate starts come straight from the reverse bit-log via a
        first-set-bit-at-or-after-pos word reduction on [4*G8, B] int32
        planes, round bookkeeping is broadcast selects on those planes,
        and the span buffers update by one-hot masking over the cap
        axis. The first cut materialized a record-major [R, T] start
        bitmap per call (a minor-axis-4 transpose — the ~30x XLA
        lowering trap this module's header documents — plus per-round
        scatters and [R, T] argmaxes) and measured 240x slower than the
        lazy kernel on the device loop; this layout-pure form is
        reverse + ~(1 + max-matches-per-record) anchored passes."""
        R_pad = B_pad * RECS
        if lengths.shape[0] != R_pad:
            lengths = jnp.pad(lengths, (0, R_pad - lengths.shape[0]))
        tm = _swar_pack(data, T_pad, B_pad)
        lnT = _len_planes(lengths, B_pad)  # [4 * G8, B] int32 planes
        hlog = self._swar_reverse_pl(tm, lnT, T_pad, B_pad, B_blk, T_chunk)
        nTw = hlog.shape[0]
        u32 = jnp.uint32
        w8 = (jnp.arange(nTw, dtype=jnp.int32) * 8)[:, None, None]
        pc = jax.lax.population_count
        # per-lane hit bytes [nTw, G8, B], extracted once; rounds re-mask
        fks = [(hlog >> (8 * k)) & u32(0xFF) for k in range(4)]

        def first_start(posP):
            """Per record (plane layout): the first candidate start
            s = max(t - 1, 0) with s >= pos and s <= len, from the first
            reverse-hit step t >= thr (thr = pos + 1 for pos > 0, else
            0 — steps 0 and 1 both map to start 0); BIG when none."""
            outs = []
            for k in range(4):
                sl = slice(k * G8, (k + 1) * G8)
                posk = posP[sl]
                thr = jnp.where(posk > 0, posk + 1, 0)  # [G8, B]
                rel = jnp.clip(thr[None] - w8, 0, 8)  # [nTw, G8, B]
                keep = fks[k] & jnp.where(
                    rel >= 8, u32(0), u32(0xFF) << rel.astype(u32)
                )
                nz = keep != 0
                ctz = pc((keep & (~keep + u32(1))) - u32(1))
                t = jnp.where(nz, w8 + ctz.astype(jnp.int32), BIG).min(
                    axis=0
                )
                s0 = jnp.maximum(t - 1, 0)
                outs.append(
                    jnp.where((t < BIG) & (s0 <= lnT[sl]), s0, BIG)
                )
            return jnp.concatenate(outs, axis=0)  # [4 * G8, B]

        neg3 = jnp.full((cap, 4 * G8, B_pad), -1, jnp.int32)
        kio = jnp.arange(cap, dtype=jnp.int32)[:, None, None]

        def cond(st):
            k, posP, activeP, _, _, kiP = st
            return jnp.any(activeP) & (k < cap)

        def body(st):
            k, posP, activeP, sbuf, ebuf, kiP = st
            sP = first_start(posP)
            activeP = activeP & (sP < BIG)
            sP = jnp.where(activeP, sP, -1)
            log = self._swar_anchor_pl(
                tm, lnT, sP, T_pad, B_pad, B_blk, T_chunk
            )
            eP = _anchor_ends(log, lengths, longest=True)
            emitP = activeP & (eP >= sP)
            onehot = (kio == kiP[None]) & emitP[None]
            sbuf = jnp.where(onehot, sP[None], sbuf)
            ebuf = jnp.where(onehot, eP[None], ebuf)
            posP = jnp.where(emitP, jnp.maximum(eP, sP + 1), posP)
            kiP = kiP + emitP.astype(jnp.int32)
            activeP = emitP & (posP <= lnT)
            return k + 1, posP, activeP, sbuf, ebuf, kiP

        st = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.asarray(0, jnp.int32),
                jnp.zeros((4 * G8, B_pad), jnp.int32),
                jnp.ones((4 * G8, B_pad), bool),
                neg3,
                neg3,
                jnp.zeros((4 * G8, B_pad), jnp.int32),
            ),
        )
        _, _, activeP, sbuf, ebuf, kiP = st
        # one tiny re-layout to external record order at the very end
        # (fusion-cut like _swar_stats so it can't poison the loop)
        activeP, sbuf, ebuf, kiP = jax.lax.optimization_barrier(
            (activeP, sbuf, ebuf, kiP)
        )

        def ext1(x):  # [4 * G8, B] (k-major) -> [R_pad] external
            return x.reshape(4, G8, B_pad).transpose(1, 2, 0).reshape(-1)

        def ext2(x):  # [cap, 4 * G8, B] -> [R_pad, cap] external
            return (
                x.reshape(cap, 4, G8, B_pad)
                .transpose(2, 3, 1, 0)
                .reshape(R_pad, cap)
            )

        return ext2(sbuf), ext2(ebuf), ext1(kiP), ext1(activeP)

    def _run_swar_multi(
        self, tm, lnT, seeded, T_pad, B_pad, B_blk, T_chunk, mspec
    ):
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _swar_multi_kernel, spec=mspec, seeded=seeded, T_chunk=T_chunk
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec(
                    (4 * G8, B_blk), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T_chunk // 8, 8 * G8, B_blk),
                    lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk // 8, G8, B_blk),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad // 8, G8, B_pad), jnp.uint32
            ),
            scratch_shapes=[
                pltpu.VMEM((G8, B_blk), jnp.uint32),
                pltpu.VMEM((G8, B_blk), jnp.uint32),
            ],
            interpret=_interpret(),
        )(lnT, tm)

    def _run_swar(self, tm, lnT, seeded, T_pad, B_pad, B_blk, T_chunk):
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _swar_kernel, spec=self.sspec, seeded=seeded, T_chunk=T_chunk
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec(
                    (4 * G8, B_blk), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (T_chunk // 8, 8 * G8, B_blk),
                    lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk // 8, G8, B_blk),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad // 8, G8, B_pad), jnp.uint32
            ),
            scratch_shapes=[
                pltpu.VMEM((G8, B_blk), jnp.uint32),
                pltpu.VMEM((G8, B_blk), jnp.uint32),
            ],
            interpret=_interpret(),
        )(lnT, tm)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk", "lead",
        ),
    )
    def _swar_call(
        self, data, lengths, seeded, T_pad, B_pad, B_blk, T_chunk,
        lead: int = 0,
    ):
        R_pad = B_pad * RECS
        if lengths.shape[0] != R_pad:
            lengths = jnp.pad(lengths, (0, R_pad - lengths.shape[0]))
        tm = _swar_pack(data, T_pad, B_pad)
        lnT = _len_planes(lengths, B_pad)
        log = self._run_swar(tm, lnT, seeded, T_pad, B_pad, B_blk, T_chunk)
        cnt, first, last, full, _ = _swar_stats(
            log, lengths, nullable=self.nullable, seeded=seeded, lead=lead
        )
        return cnt, first, last, full

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "k", "w", "h", "T_pad", "B_pad", "B_blk", "T_chunk",
        ),
    )
    def _swar_call_win(
        self, data, lengths, k, w, h, T_pad, B_pad, B_blk, T_chunk
    ):
        """Windowed scan: [B, L] records -> [B * k, w + h] overlapped
        windows, lead = h flags suppressed, per-record reduction of the
        per-window stats. The window field is built from two slices
        (heads = the previous window's tail, window 0's head dead-filled)
        — no strided gathers."""
        B, L = data.shape
        main = jnp.pad(data, ((0, 0), (0, k * w - L))).reshape(B, k, w)
        heads = jnp.concatenate(
            [
                jnp.full((B, 1, h), 0xFF, jnp.uint8),
                main[:, : k - 1, w - h :],
            ],
            axis=1,
        )
        wind = jnp.concatenate([heads, main], axis=2).reshape(B * k, w + h)
        off = jnp.arange(k, dtype=jnp.int32)[None, :] * w
        lnw = jnp.clip(lengths[:, None] + h - off, 0, w + h).reshape(-1)
        R_pad = B_pad * RECS
        if lnw.shape[0] != R_pad:
            lnw = jnp.pad(lnw, (0, R_pad - lnw.shape[0]))
        tm = _swar_pack(wind, T_pad, B_pad)
        lnT = _len_planes(lnw, B_pad)
        log = self._run_swar(tm, lnT, True, T_pad, B_pad, B_blk, T_chunk)
        cnt, first, last, _, _ = _swar_stats(
            log, lnw, nullable=False, seeded=True, lead=h
        )
        cnt = cnt[: B * k].reshape(B, k)
        first = first[: B * k].reshape(B, k)
        last = last[: B * k].reshape(B, k)
        cnt_rec = cnt.sum(axis=1)
        fg = jnp.where(first >= 0, first - h + off, BIG)
        fmin = fg.min(axis=1)
        first_rec = jnp.where(fmin >= BIG, -1, fmin)
        lg = jnp.where(last >= 0, last - h + off, -1)
        last_rec = lg.max(axis=1)
        # seeded 'full' = some match ends at len = the max end hits len
        full_rec = (cnt_rec > 0) & (last_rec >= lengths)
        return cnt_rec, first_rec, last_rec, full_rec


class SwarMultiScanner(PallasScanner):
    """Multi-pattern SWAR scanner: up to 4 patterns share one u32 byte
    lane each (SwarMultiSpec), so the combined grep scan keeps the SWAR
    tier's density instead of dropping to one record per u32 lane (the
    WordScanner fallback for combined automata). The record's byte
    stream is replicated across its quad; per-slot gates keep the
    sub-automata independent. Only match_stats_b runs slotted — flags /
    reverse / anchored rescans inherit the combined-automaton matmul
    kernels (PallasScanner with the engine's accept-channel map).

    Reference analog: one pass over the text answering P patterns at
    once — the multi-pattern grep the reference would need P full runs
    for (regex.h:225-227 is single-pattern)."""

    def __init__(self, prog, ptables, mspec: SwarMultiSpec, P: int,
                 nullable=None):
        super().__init__(prog, ptables, nullable=nullable)
        self.mspec = mspec
        self.P = P

    _geom_swar = SwarScanner._geom_swar
    _run_swar_multi = SwarScanner._run_swar_multi

    def match_stats_b(self, data, len_g, *, seeded: bool, lead: int = 0):
        if lead:
            return super().match_stats_b(data, len_g, seeded=seeded, lead=lead)
        data = jnp.asarray(data)
        B_rows0, G = len_g.shape
        B = B_rows0 * G
        L = data.shape[1]
        lengths = jnp.asarray(len_g).reshape(-1).astype(jnp.int32)
        T, T_pad, B_pad, B_blk, T_chunk = self._geom_swar(
            L, -(-(B * 4) // RECS)
        )
        cnt, first, last, full = self._swar_multi_call(
            data, lengths, seeded, T_pad, B_pad, B_blk, T_chunk
        )
        P = self.P

        def sl(x):  # [R_swar] -> [B_rows0, G*P], channel c = g*P + p
            return (
                x[: B * 4]
                .reshape(B_rows0, G, 4)[:, :, :P]
                .reshape(B_rows0, G * P)
            )

        cnt = sl(cnt)
        return cnt, sl(first), sl(last), sl(full), cnt > 0

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk",
        ),
    )
    def _swar_multi_call(
        self, data, lengths, seeded, T_pad, B_pad, B_blk, T_chunk
    ):
        dr = jnp.repeat(data, 4, axis=0)
        lr = jnp.repeat(lengths, 4)
        R_pad = B_pad * RECS
        if lr.shape[0] != R_pad:
            lr = jnp.pad(lr, (0, R_pad - lr.shape[0]))
        tm = _swar_pack(dr, T_pad, B_pad)
        lnT = _len_planes(lr, B_pad)
        log = self._run_swar_multi(
            tm, lnT, seeded, T_pad, B_pad, B_blk, T_chunk, self.mspec
        )
        cnt, first, last, full, _ = _swar_stats(
            log, lr, nullable=False, seeded=seeded
        )
        return cnt, first, last, full
