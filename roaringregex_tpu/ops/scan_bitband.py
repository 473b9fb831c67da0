"""Bit-packed band+rank-1 Pallas scan for the sparse (>1024-state) tier.

The container kernels (ops/scan_pallas.py, SparseScanner) apply the
block-sparse follow matrix as explicit 128x128 MXU matmuls — one bf16 lane
per NFA state, ~``npart * 16384`` MACs per corpus byte. For the
repetition-blowup family the sparse tier exists for (the reference's
CRoaring tier, Parser.cpp:165-168), that representation wastes the machine:
a ``x(ab|c){400,520}y`` automaton's follow matrix is a 3-diagonal band plus
one high-in-degree accept column, so the per-byte step is a handful of
**bit-shift / AND / OR ops on u32-packed state words**, not 40 matmuls.

This module is that decomposition made into kernels:

* state vector ``v``: [W, B] uint32, bit ``s % 32`` of word ``s // 32`` =
  state s active (32 states per u32 lane; W = ceil(s_pad/32) padded to a
  multiple of 8 sublanes). The SWAR idea (ops/scan_swar.py) scaled from
  8-state records to >1024-state automata: one record spans W words
  instead of 4 records sharing one word.
* **band**: edges sharing the offset ``d = dst - src`` collapse to
  ``y |= shift_up(v, d) & dmask_d`` — a cross-word funnel shift plus an
  AND with the diagonal's destination mask. A 1560-state counting chain
  is 3 such ops per byte regardless of state count.
* **rank-1 columns**: residual high-in-degree destinations (accept
  states of ``{m,n}`` exits, loop-back targets of ``{m,}``) become
  ``y[dst] |= any(v & rowmask)`` — an AND plus an OR-fold over the W
  sublane rows, one per column.
* byte->mask translation stays in-kernel (byte runs -> packed mask
  words, same plan as scan_pallas.byte_spec) so no [T, W, B] mask stream
  ever touches HBM.

Programs whose residual structure does not fit (``> max_diags`` distinct
offsets after peeling ``<= max_rank1`` heavy columns) keep the container
kernels; ``bitband_spec`` returns None and the engine routes as before.
RRX_BITBAND=0 restores the container kernels everywhere for A/B diagnosis.

Reference behavior being reproduced: the per-byte state-set union
(NFA.cc:72-102) on the >256-state tier (Parser.cpp:165-168) — here at
word-tier throughput instead of the reference's heap-allocating
``Roaring::fastunion`` per byte (NFA.cc:77-85).
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
    SparseScanner,
    _full_spec,
    _interpret,
    _round_up,
    _time_major,
)


class BitbandSpec(NamedTuple):
    """Static per-program plan (hashable: jit/pallas static arg)."""

    W: int  # padded word count (multiple of 8)
    diags: Tuple[int, ...]  # band offsets d = dst - src
    rank1: Tuple[Tuple[int, int], ...]  # (dst_word, dst_bit) per column term
    tri_gaps: Tuple[int, ...]  # triangle families (one exit set E; per
    # family gap g: target p receives any exit q with q < p - g)
    tri_win: Tuple[int, int]  # word range [lo_w, hi_w) holding E and all
    # targets — the prefix-OR runs on this slice, not all W words
    runs: Tuple[Tuple[int, int], ...]  # byte runs (lo, hi)
    bos_nz: bool  # BOS mask has any bit (^ patterns)
    eos_nz: bool  # EOS mask has any bit ($ patterns)


MAX_TRI_FAMILIES = 6


def bitband_spec(
    prog: DeviceProgram,
    max_diags: Optional[int] = None,
    max_rank1: Optional[int] = None,
) -> Optional[BitbandSpec]:
    """Band + rank-1 + triangle decomposition of the follow matrix, or
    None when the structure does not fit.

    1. **Diagonals**: offsets ``d = dst - src`` carrying >= max(8, S/8)
       edges (the within-copy transitions of repetition chains).
    2. **Triangle**: the residual edges of an ``X{m,n}`` optional tail
       form "every exit of copy i reaches every first of copy j > i" —
       a triangular pattern applied exactly as one exclusive prefix-OR
       over the exit set plus a per-target-family gap shift (gap =
       how many positions below a target its own copy's exits sit).
       Verified numerically: every (exit, target) pair the prefix would
       light up must be a real follow edge.
    3. **Rank-1 columns**: destinations that defeat the triangle check
       (loop-back targets, stray accept columns) fall back to exact
       per-column terms ``y[dst] |= any(v & in_edges(dst))``.
    """
    if prog.tier not in ("sparse", "multiblock"):
        # dense128/256 tiers have cheaper lane-packed paths
        return None
    from ..utils.config import get_config

    cfg = get_config()
    if max_diags is None:
        max_diags = cfg.bitband_max_diags
    if max_rank1 is None:
        max_rank1 = cfg.bitband_max_rank1
    if max_diags <= 0:
        return None
    e = prog.nfa.get_edges()
    if len(e) == 0:
        return None
    src = e[:, 0].astype(np.int64)
    dst = e[:, 1].astype(np.int64)
    S = prog.n_states
    offs_all, cnt_all = np.unique(dst - src, return_counts=True)
    thr = max(8, S // 8)
    big = offs_all[cnt_all >= thr]
    if len(big) > max_diags:
        order = np.argsort(-cnt_all[cnt_all >= thr])
        big = big[order[:max_diags]]
    elif len(big) == 0 and len(offs_all) <= max_diags:
        big = offs_all  # small automata: everything fits on diagonals
    diags = tuple(sorted(int(d) for d in big))
    resid = ~np.isin(dst - src, big)
    rank1: list = []
    tri_gaps: Tuple[int, ...] = ()
    tri_exits = tri_fams = None
    if resid.any():
        F = prog.nfa.follow_matrix
        rank1_set: set = set()
        while True:
            keep = resid & ~np.isin(dst, sorted(rank1_set))
            rs, rd = src[keep], dst[keep]
            if len(rs) == 0:
                break
            E = np.unique(rs)
            fams: dict = {}
            bad_dst = None
            for p in np.unique(rd):
                rin = rs[rd == p]
                g = int(p - rin.max() - 1)
                elow = E[E < p - g]
                if not F[elow, p].all():
                    bad_dst = int(p)
                    break
                fams.setdefault(g, []).append(int(p))
            if bad_dst is None and len(fams) <= MAX_TRI_FAMILIES:
                tri_gaps = tuple(sorted(fams))
                tri_exits = E
                tri_fams = fams
                break
            if bad_dst is None:
                # too many families: demote the smallest family
                g_small = min(fams, key=lambda g: len(fams[g]))
                bad = fams[g_small]
            else:
                bad = [bad_dst]
            rank1_set.update(bad)
            if len(rank1_set) > max_rank1:
                return None
        rank1 = sorted(rank1_set)
    W = _round_up(max(1, prog.s_pad // 32), 8)
    lo, hi, _cl = prog.byte_runs
    runs = tuple((int(l), int(h)) for l, h in zip(lo, hi))
    bos_nz = bool(np.asarray(prog.Bc_words[prog.bos_class]).any())
    eos_nz = bool(np.asarray(prog.Bc_words[prog.eos_class]).any())
    tri_win = (0, W)
    if tri_gaps:
        members = np.concatenate(
            [tri_exits] + [np.asarray(v) for v in tri_fams.values()]
        )
        lo_w = (int(members.min()) // 32) // 8 * 8
        hi_w = min(W, -(-(int(members.max()) // 32 + 1) // 8) * 8)
        tri_win = (lo_w, hi_w)
    del tri_exits, tri_fams  # recomputed deterministically at table build
    return BitbandSpec(
        W=W,
        diags=diags,
        rank1=tuple((int(c) // 32, int(c) % 32) for c in rank1),
        tri_gaps=tri_gaps,
        tri_win=tri_win,
        runs=runs,
        bos_nz=bos_nz,
        eos_nz=eos_nz,
    )


def _tri_structure(prog: DeviceProgram, spec: BitbandSpec):
    """(exit positions E, {gap: [target positions]}) of the triangle term,
    recomputed from the spec (same arithmetic as bitband_spec — the spec
    is the sole source of truth for which edges are residual)."""
    e = prog.nfa.get_edges()
    src = e[:, 0].astype(np.int64)
    dst = e[:, 1].astype(np.int64)
    r1cols = [w * 32 + b for (w, b) in spec.rank1]
    keep = ~np.isin(dst - src, spec.diags) & ~np.isin(dst, r1cols)
    rs, rd = src[keep], dst[keep]
    E = np.unique(rs)
    fams: dict = {g: [] for g in spec.tri_gaps}
    for p in np.unique(rd):
        rin = rs[rd == p]
        g = int(p - rin.max() - 1)
        fams[g].append(int(p))
    return E, fams


# ---------------------------------------------------------------------------
# Packed-table construction (host-side numpy)
# ---------------------------------------------------------------------------


def _pack_states(cols: np.ndarray, W: int) -> np.ndarray:
    out = np.zeros(W, np.uint32)
    for c in cols:
        out[int(c) // 32] |= np.uint32(1) << np.uint32(int(c) % 32)
    return out


def _pack_words(words: np.ndarray, W: int) -> np.ndarray:
    out = np.zeros(W, np.uint32)
    out[: len(words)] = words
    return out


def build_bitband_tables(
    prog: DeviceProgram, spec: BitbandSpec, accept_np: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(tabs_f, tabs_r): stacked [K*W, 1] uint32 mask tables.

    Forward layout (row blocks of W words each):
        0: BOS mask | 1: EOS mask | 2: seed (initial states)
        3 .. 3+n_runs: per-run symbol masks
        then len(diags) forward diagonal masks (destination-indexed)
        then len(rank1) row masks (source-indexed)
        then (when tri_gaps): exit mask E + one target mask per family
        then C accept-channel masks.
    Reverse layout: same header/runs, then reverse diagonal masks
    (source-indexed), then the same rank-1 row masks + triangle masks,
    then 1 accept-seed mask (states that re-enter each reverse step) and
    1 initial-state mask (the reverse hit detector).
    """
    W = spec.W
    e = prog.nfa.get_edges()
    src = e[:, 0].astype(np.int64) if len(e) else np.zeros(0, np.int64)
    dst = e[:, 1].astype(np.int64) if len(e) else np.zeros(0, np.int64)
    r1cols = [w * 32 + b for (w, b) in spec.rank1]

    Bw = prog.Bc_words  # [c_pad, Wt] uint32
    _lo, _hi, cl = prog.byte_runs
    header = [
        _pack_words(np.asarray(Bw[prog.bos_class]), W),
        _pack_words(np.asarray(Bw[prog.eos_class]), W),
        _pack_states(np.nonzero(np.asarray(prog.seed_row))[0], W),
    ]
    run_masks = [
        _pack_words(np.asarray(Bw[int(c)]), W) for c in cl
    ]

    fdiag, rdiag = [], []
    for d in spec.diags:
        on = dst - src == d
        fdiag.append(_pack_states(dst[on], W))
        rdiag.append(_pack_states(src[on], W))
    rmasks = [_pack_states(src[dst == c], W) for c in r1cols]
    tri_masks = []
    if spec.tri_gaps:
        E, fams = _tri_structure(prog, spec)
        tri_masks.append(_pack_states(E, W))
        for g in spec.tri_gaps:
            tri_masks.append(_pack_states(np.asarray(fams[g]), W))

    acc_rows = [
        _pack_states(np.nonzero(accept_np[:, c])[0], W)
        for c in range(accept_np.shape[1])
    ]
    tabs_f = np.concatenate(
        header + run_masks + fdiag + rmasks + tri_masks + acc_rows
    )
    acc_seed = _pack_states(np.nonzero(np.asarray(prog.accept))[0], W)
    init_mask = _pack_states(np.nonzero(np.asarray(prog.seed_row))[0], W)
    tabs_r = np.concatenate(
        header + run_masks + rdiag + rmasks + tri_masks
        + [acc_seed, init_mask]
    )
    return tabs_f[:, None], tabs_r[:, None]


# ---------------------------------------------------------------------------
# In-kernel helpers (all shapes [W, B] uint32)
# ---------------------------------------------------------------------------


def _blk(tabs_ref, k: int, W: int, B: int):
    """Row block k of a stacked mask table, broadcast to [W, B]."""
    return jnp.broadcast_to(tabs_ref[k * W : (k + 1) * W], (W, B))


def _shift_up(v, d: int, B: int):
    """Bit-shift the packed state vector by +d states (toward higher
    indices); d may be negative or exceed 32 (cross-word funnel)."""
    W = v.shape[0]
    if d == 0:
        return v
    if d < 0:
        return _shift_down(v, -d, B)
    dw, db = d // 32, d % 32
    if dw >= W:
        return jnp.zeros((W, B), jnp.uint32)
    main = _roll_up(v, dw, B)
    if db == 0:
        return main
    if dw + 1 >= W:
        return main << db
    carry = _roll_up(v, dw + 1, B)
    return (main << db) | (carry >> (32 - db))


def _roll_up(v, dw: int, B: int):
    """Shift words toward higher indices by ``dw`` rows, zero-filling."""
    if dw == 0:
        return v
    W = v.shape[0]
    z = jnp.zeros((dw, B), jnp.uint32)
    return jnp.concatenate([z, v[: W - dw]], axis=0)


def _roll_down(v, dw: int, B: int):
    if dw == 0:
        return v
    W = v.shape[0]
    z = jnp.zeros((dw, B), jnp.uint32)
    return jnp.concatenate([v[dw:], z], axis=0)


def _shift_down(v, d: int, B: int):
    W = v.shape[0]
    if d < 0:
        return _shift_up(v, -d, B)
    dw, db = d // 32, d % 32
    if dw >= W:
        return jnp.zeros((W, B), jnp.uint32)
    main = _roll_down(v, dw, B)
    if db == 0:
        return main
    if dw + 1 >= W:
        return main >> db
    carry = _roll_down(v, dw + 1, B)
    return (main >> db) | (carry << (32 - db))


def _prefix_excl(x, B: int, ltri=None):
    """Exclusive bit-position prefix-OR: out bit p = OR of x bits q < p,
    across the whole packed vector.

    In-word layer: the upward inclusive prefix-OR of a u32 equals
    "every bit at or above the lowest set bit", which is ``x | (0 - x)``
    — two VPU ops instead of a 10-op Hillis-Steele ladder; ``<< 1``
    makes it exclusive (bit 0 of each word has an empty in-word prefix).
    Cross-word layer: word w needs "any bit in a strictly-lower word" —
    with ``ltri`` (a strictly-lower-triangular [W, W] bf16 matrix) that
    is one MXU matmul over the word-any vector, essentially free next to
    the VPU budget; without it (interpret mode), a log-depth roll scan."""
    W = x.shape[0]
    e_in = (x | (jnp.uint32(0) - x)) << 1
    if W <= 16:
        ltri = None  # a 4-round roll scan beats the MXU round trip
    if ltri is not None:
        # f32 keeps the (8, 128) tile of the u32 domain — a bf16 matmul
        # here costs more in layout conversion than it saves on the MXU
        wf = jnp.where(x != 0, 1.0, 0.0).astype(jnp.float32)
        c = jnp.dot(ltri, wf, preferred_element_type=jnp.float32)
        c_excl = jnp.where(c > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    else:
        wany = jnp.where(x != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        c = _roll_up(wany, 1, B)
        k = 1
        while k < W:
            c = c | _roll_up(c, min(k, W - 1), B)
            k <<= 1
        c_excl = c
    return e_in | c_excl


def _suffix_excl(x, B: int, utri=None):
    """Exclusive suffix-OR: out bit p = OR of x bits q > p (mirror of
    _prefix_excl; ``utri`` = strictly-upper-triangular [W, W] bf16).
    The in-word layer has no negation shortcut downward, so it keeps the
    doubling ladder."""
    W = x.shape[0]
    a = x
    for s in (1, 2, 4, 8, 16):
        a = a | (a >> s)
    e_in = a >> 1
    if W <= 16:
        utri = None  # a 4-round roll scan beats the MXU round trip
    if utri is not None:
        wf = jnp.where(x != 0, 1.0, 0.0).astype(jnp.float32)
        c = jnp.dot(utri, wf, preferred_element_type=jnp.float32)
        c_excl = jnp.where(c > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    else:
        wany = jnp.where(x != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        c = _roll_down(wany, 1, B)
        k = 1
        while k < W:
            c = c | _roll_down(c, min(k, W - 1), B)
            k <<= 1
        c_excl = c
    return e_in | c_excl


def _or_fold(t):
    """[W, B] -> [1, B] OR-reduction over the sublane rows (log-depth
    static halving; Mosaic-safe, no cross-lane reduce ops)."""
    h = t.shape[0]
    while h > 1:
        half = h // 2
        t2 = t[:half] | t[half : 2 * half]
        if h - 2 * half:
            first = t2[:1] | t[2 * half :]
            t2 = (
                first
                if half == 1
                else jnp.concatenate([first, t2[1:]], axis=0)
            )
        t = t2
        h = half
    return t


def _acc_off(spec: BitbandSpec) -> int:
    """Row-block index of the first accept mask (after header, runs,
    diagonals, rank-1 rows and triangle masks)."""
    n_tri = (1 + len(spec.tri_gaps)) if spec.tri_gaps else 0
    return 3 + len(spec.runs) + len(spec.diags) + len(spec.rank1) + n_tri


def _load_tables(tabs_ref, spec: BitbandSpec, *, C: int, B: int, acc: bool):
    """Broadcast every mask block to [W, B] once per kernel invocation —
    loop-invariant, so the per-byte step pays zero broadcast cost."""
    W = spec.W
    g = lambda k: _blk(tabs_ref, k, W, B)
    t = {"seed": g(2)}
    if spec.bos_nz:
        t["bos"] = g(0)
    if spec.eos_nz:
        t["eos"] = g(1)
    t["runs"] = [g(3 + i) for i in range(len(spec.runs))]
    d0 = 3 + len(spec.runs)
    t["diags"] = [g(d0 + i) for i in range(len(spec.diags))]
    r0 = d0 + len(spec.diags)
    t["rank1"] = [g(r0 + i) for i in range(len(spec.rank1))]
    t0 = r0 + len(spec.rank1)
    if spec.tri_gaps:
        t["E"] = g(t0)
        t["fams"] = [g(t0 + 1 + i) for i in range(len(spec.tri_gaps))]
    if acc:
        t["acc"] = [g(_acc_off(spec) + c) for c in range(C)]
    return t


def _mask_words(d, tg, lens, t, spec: BitbandSpec, *, B: int):
    """[1, B] raw bytes at stream step tg -> [W, B] packed symbol mask.
    Step semantics match scan_pallas._bits_from_bytes: tg == 0 is BOS,
    byte position j = tg - 1; j == len is EOS, j > len is dead. The
    liveness gate (dead padding bytes, j >= len) folds into the [1, B]
    run compares, so anchor-free programs pay no [W, B] boundary selects."""
    W = spec.W
    dd = d.astype(jnp.int32)
    j = tg - 1
    alive = (j >= 0) & (j < lens)  # [1, B]
    mw = None
    for (lo, hi), wr in zip(spec.runs, t["runs"]):
        hit = (dd >= lo) & (dd <= hi) & alive
        c = jnp.where(hit, wr, jnp.uint32(0))
        mw = c if mw is None else mw | c
    if mw is None:
        mw = jnp.zeros((W, B), jnp.uint32)
    if spec.eos_nz:
        mw = jnp.where(j == lens, t["eos"], mw)
    if spec.bos_nz:
        mw = jnp.where(j < 0, t["bos"], mw)
    return mw


def _shift_up_r1(v, d: int, roll1, B: int):
    """shift_up for 0 < d < 32 with a shared one-row roll of v."""
    return (v << d) | (roll1 >> (32 - d))


def _expand(v, t, spec: BitbandSpec, *, B: int, rev: bool, tri=None):
    """One automaton step y = F^T @ v (or F @ v when ``rev``) in the bit
    domain: band diagonals as funnel shifts (sharing one word-roll of v
    across all sub-word offsets) + rank-1 column terms + the triangle
    prefix/suffix term. ``tri`` = strictly-triangular [W, W] bf16 matrix
    for the MXU cross-word scan (None in interpret mode)."""
    W = v.shape[0]
    y = None
    roll_u = roll_d = None
    for d, m in zip(spec.diags, t["diags"]):
        dd = -d if rev else d
        if dd == 0:
            sh = v
        elif 0 < dd < 32:
            if roll_u is None:
                roll_u = _roll_up(v, 1, B)
            sh = _shift_up_r1(v, dd, roll_u, B)
        elif -32 < dd < 0:
            if roll_d is None:
                roll_d = _roll_down(v, 1, B)
            sh = (v >> -dd) | (roll_d << (32 + dd))
        else:
            sh = _shift_up(v, dd, B)
        s = sh & m
        y = s if y is None else y | s
    if spec.rank1:
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
        for (wj, bj), rm in zip(spec.rank1, t["rank1"]):
            if rev:
                # F: every source in rowmask sees dst's bit
                bit = (v[wj : wj + 1] >> bj) & jnp.uint32(1)  # [1, B]
                s = jnp.where(bit > 0, rm, jnp.uint32(0))
            else:
                # F^T: dst bit = any(v & rowmask)
                anyb = _or_fold(v & rm)  # [1, B]
                hasb = (anyb != 0).astype(jnp.uint32) << bj
                s = jnp.where(iota_w == wj, hasb, jnp.uint32(0))
            y = s if y is None else y | s
    if spec.tri_gaps:
        # the triangle lives in the {m,n} tail's word window — slice it
        # out so every prefix/suffix/shift op runs on (hi-lo) sublane
        # rows instead of all W (exits below / targets above the window
        # do not exist, so zero-fill at the slice edges is exact)
        lo, hi = spec.tri_win
        vs = v[lo:hi]
        Eb = t["E"][lo:hi]
        trs = tri[lo:hi, lo:hi] if tri is not None else None
        if rev:
            # F: exit q receives any target p with p > q + g
            acc = None
            for g, Tb in zip(spec.tri_gaps, t["fams"]):
                s = _suffix_excl(vs & Tb[lo:hi], B, trs)
                s = _shift_down(s, g, B) if g else s
                acc = s if acc is None else acc | s
            s = Eb & acc
        else:
            # F^T: target p receives any exit q with q < p - g
            P = _prefix_excl(vs & Eb, B, trs)
            roll_p = None
            acc = None
            for g, Tb in zip(spec.tri_gaps, t["fams"]):
                if g == 0:
                    s = P
                elif 0 < g < 32:
                    if roll_p is None:
                        roll_p = _roll_up(P, 1, B)
                    s = _shift_up_r1(P, g, roll_p, B)
                else:
                    s = _shift_up(P, g, B)
                s = Tb[lo:hi] & s
                acc = s if acc is None else acc | s
            s = acc
        parts = []
        if lo:
            parts.append(jnp.zeros((lo, B), jnp.uint32))
        parts.append(s)
        if hi < spec.W:
            parts.append(jnp.zeros((spec.W - hi, B), jnp.uint32))
        s = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        y = s if y is None else y | s
    if y is None:
        y = jnp.zeros((W, B), jnp.uint32)
    return y


def _accept_flags(v, t, spec: BitbandSpec, *, C: int, B: int, acc_static):
    """[C, B] bool accept flags from the packed state vector. With few
    accepting words (``acc_static`` = per-channel ((word, mask), ...)),
    static row slices replace the [W, B] AND + OR-fold."""
    if acc_static is not None:
        rows = []
        for words in acc_static:
            fl = None
            for (w, msk) in words:
                x = v[w : w + 1] & jnp.uint32(msk)
                fl = x if fl is None else fl | x
            if fl is None:
                fl = jnp.zeros((1, B), jnp.uint32)
            rows.append(fl)
        fl = rows[0] if C == 1 else jnp.concatenate(rows, axis=0)
        return fl != 0
    rows = [_or_fold(v & t["acc"][c]) for c in range(C)]
    fl = rows[0] if C == 1 else jnp.concatenate(rows, axis=0)
    return fl != 0


# ---------------------------------------------------------------------------
# Kernels (byte path; layouts identical to the sparse container kernels)
# ---------------------------------------------------------------------------


def _bitband_match_kernel_b(
    len_ref,  # [1, B]
    data_ref,  # [T_chunk // r, r, B] uint8
    tabs_ref,  # [K*W, 1] uint32
    tri_ref,  # [W, W] f32 strictly-lower-triangular (MXU word scan)
    cnt_out,
    first_out,
    last_out,
    full_out,  # [C, B] int32
    v_s,  # [W, B] uint32
    cnt_s,
    first_s,
    last_s,
    full_s,
    *,
    spec: BitbandSpec,
    seeded: bool,
    nullable: bool,
    n_seed: int,
    T_chunk: int,
    r: int,
    C: int,
    acc_static,
):
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    B = v_s.shape[1]
    lens = len_ref[:]
    lenc = jnp.broadcast_to(lens, (C, B)) if C > 1 else lens
    t = _load_tables(tabs_ref, spec, C=C, B=B, acc=acc_static is None)
    tri = tri_ref[:] if spec.tri_gaps else None
    seedb = t["seed"]
    W = spec.W

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((W, B), jnp.uint32)
        if nullable:
            if seeded:
                cnt_s[:] = lenc + 1
                last_s[:] = lenc
            else:
                cnt_s[:] = jnp.ones_like(lenc)
                last_s[:] = jnp.zeros_like(lenc)
            first_s[:] = jnp.zeros_like(lenc)
        else:
            cnt_s[:] = jnp.zeros_like(lenc)
            first_s[:] = jnp.full_like(lenc, -1)
            last_s[:] = jnp.full_like(lenc, -1)
        full_s[:] = (
            (lenc == 0).astype(jnp.int32) if nullable else jnp.zeros_like(lenc)
        )

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m : m + 1]
            tg = j * T_chunk + i * r + m
            if seeded:
                v = v | seedb
            else:
                v = jnp.where(tg < n_seed, v | seedb, v)
            y = _expand(v, t, spec, B=B, rev=False, tri=tri)
            mw = _mask_words(d, tg, lens, t, spec, B=B)
            v = y & mw
            fl = _accept_flags(v, t, spec, C=C, B=B, acc_static=acc_static)
            e = jnp.minimum(tg, lenc)
            if not (nullable and seeded):
                new = fl & (e != last_s[:])
                cnt_s[:] = cnt_s[:] + new.astype(jnp.int32)
            first_s[:] = jnp.where((first_s[:] < 0) & fl, e, first_s[:])
            last_s[:] = jnp.where(fl, e, last_s[:])
            full_s[:] = full_s[:] | (fl & (tg >= lenc)).astype(jnp.int32)
        v_s[:] = v
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        cnt_out[:] = cnt_s[:]
        first_out[:] = first_s[:]
        last_out[:] = last_s[:]
        full_out[:] = full_s[:]


def _bitband_flags_kernel_b(
    len_ref,
    data_ref,
    tabs_ref,
    tri_ref,
    flags_out,  # [T_chunk, C, B] int8
    v_s,
    *,
    spec: BitbandSpec,
    seeded: bool,
    n_seed: int,
    T_chunk: int,
    r: int,
    C: int,
    acc_static,
):
    j = pl.program_id(1)
    W = spec.W
    B = v_s.shape[1]
    lens = len_ref[:]
    t = _load_tables(tabs_ref, spec, C=C, B=B, acc=acc_static is None)
    tri = tri_ref[:] if spec.tri_gaps else None
    seedb = t["seed"]

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((W, B), jnp.uint32)

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m : m + 1]
            tg = j * T_chunk + i * r + m
            if seeded:
                v = v | seedb
            else:
                v = jnp.where(tg < n_seed, v | seedb, v)
            y = _expand(v, t, spec, B=B, rev=False, tri=tri)
            mw = _mask_words(d, tg, lens, t, spec, B=B)
            v = y & mw
            fl = _accept_flags(v, t, spec, C=C, B=B, acc_static=acc_static)
            flags_out[i * r + m] = fl.astype(jnp.int8)
        v_s[:] = v
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _bitband_anchor_kernel_b(
    len_ref,  # [1, B]
    starts_ref,  # [1, B] int32 (-1 inactive)
    data_ref,  # [T_chunk // r, r, B] uint8
    tabs_ref,
    tri_ref,
    end_out,  # [1, B] int32
    v_s,
    end_s,
    *,
    spec: BitbandSpec,
    longest: bool,
    T_chunk: int,
    r: int,
    acc_static,
):
    """Anchored rescan: seed each record's automaton only at its given
    start (matmul _anchor_end_kernel_b semantics: seed at step start+1,
    or steps <= 1 when start == 0); emit the first (lazy) or last
    (greedy leftmost-longest) accepting end, -1 when none."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    W = spec.W
    B = v_s.shape[1]
    lens = len_ref[:]
    starts = starts_ref[:]
    t = _load_tables(tabs_ref, spec, C=1, B=B, acc=acc_static is None)
    tri = tri_ref[:] if spec.tri_gaps else None
    seedb = t["seed"]

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((W, B), jnp.uint32)
        end_s[:] = jnp.full((1, B), -1, jnp.int32)

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m : m + 1]
            tg = j * T_chunk + i * r + m
            gate = ((starts == tg - 1) | ((starts == 0) & (tg <= 1))) & (
                starts >= 0
            )  # [1, B]
            v = jnp.where(gate, v | seedb, v)
            y = _expand(v, t, spec, B=B, rev=False, tri=tri)
            mw = _mask_words(d, tg, lens, t, spec, B=B)
            v = y & mw
            fl = _accept_flags(v, t, spec, C=1, B=B, acc_static=acc_static)
            e = jnp.minimum(tg, lens)
            ok = fl & (e >= starts)
            if longest:
                end_s[:] = jnp.where(ok, e, end_s[:])
            else:
                end_s[:] = jnp.where(ok & (end_s[:] < 0), e, end_s[:])
        v_s[:] = v
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        end_out[:] = end_s[:]


def _bitband_reverse_kernel_b(
    len_ref,
    data_ref,
    tabs_ref,
    tri_ref,  # [W, W] f32 strictly-upper-triangular
    hits_out,  # [T_chunk, 1, B] int8
    r_s,
    *,
    spec: BitbandSpec,
    T_chunk: int,
    r: int,
):
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    W = spec.W
    B = r_s.shape[1]
    lens = len_ref[:]
    t = _load_tables(tabs_ref, spec, C=1, B=B, acc=False)
    tri = tri_ref[:] if spec.tri_gaps else None
    a0 = _acc_off(spec)
    accb = _blk(tabs_ref, a0, W, B)
    initb = _blk(tabs_ref, a0 + 1, W, B)

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((W, B), jnp.uint32)

    def body(i, _):
        iq = T_chunk // r - 1 - i
        slab = data_ref[iq]
        R = r_s[:]
        for m in reversed(range(r)):
            d = slab[m : m + 1]
            tg = (nT - 1 - j) * T_chunk + iq * r + m
            R = R | accb
            mw = _mask_words(d, tg, lens, t, spec, B=B)
            R = _expand(R & mw, t, spec, B=B, rev=True, tri=tri)
            hit = _or_fold(R & initb) != 0  # [1, B]
            hits_out[iq * r + m] = hit.astype(jnp.int8)
        r_s[:] = R
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


# ---------------------------------------------------------------------------
# Scanner
# ---------------------------------------------------------------------------


class BitbandScanner(SparseScanner):
    """Sparse-tier scanner over the band+rank-1 bit decomposition.

    Inherits SparseScanner's stream wrappers and container kernels (used
    by the mask-stream layout paths); overrides the fused byte-path calls
    — the production route — with the bit-packed kernels."""

    def __init__(
        self,
        prog: DeviceProgram,
        ptables,
        spec: BitbandSpec,
        accept_map=None,
        nullable=None,
    ):
        super().__init__(
            prog, ptables, accept_map=accept_map, nullable=nullable
        )
        self.bspec = spec
        if accept_map is not None:
            acc_np = np.asarray(accept_map)
        else:
            acc = np.zeros(self.lanes, np.uint8)
            acc[: len(prog.accept)] = prog.accept
            acc_np = acc[:, None]
        tf, tr = build_bitband_tables(prog, spec, acc_np)
        self.btabs_f = jnp.asarray(tf)
        self.btabs_r = jnp.asarray(tr)
        W = spec.W
        lt = np.tril(np.ones((W, W), np.float32), -1)
        self.ltri = jnp.asarray(lt, jnp.float32)
        self.utri = jnp.asarray(lt.T, jnp.float32)
        # static accept rows: skip the [W, B] AND + OR-fold when the
        # accepting states concentrate in a few words (the typical case:
        # a handful of exit positions near the end of the chain)
        accs = []
        total = 0
        for c in range(acc_np.shape[1]):
            aw = _pack_states(np.nonzero(acc_np[:, c])[0], W)
            nz = np.nonzero(aw)[0]
            total += len(nz)
            accs.append(tuple((int(w), int(aw[w])) for w in nz))
        self.acc_static = tuple(accs) if total <= 8 else None
        # anchored rescans + device span rounds: per-record (C == 1),
        # program-accept semantics, non-nullable policy handled by api
        paw = _pack_states(np.nonzero(np.asarray(prog.accept))[0], W)
        pnz = np.nonzero(paw)[0]
        self._anchor_acc_static = (
            (tuple((int(w), int(paw[w])) for w in pnz),)
            if len(pnz) <= 8
            else None
        )
        self.has_anchor = acc_np.shape[1] == 1 and not self.nullable
        self.at = self.at1  # api guards read .at on anchored scanners

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r",
            "K", "lead",
        ),
    )
    def _match_call_b(
        self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r, K=1,
        lead=0,
    ):
        assert K == 1 and lead == 0
        C = self.at1.shape[0]
        spec = self.bspec
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _bitband_match_kernel_b,
            spec=spec,
            seeded=seeded,
            nullable=self.nullable,
            n_seed=2,
            T_chunk=T_chunk,
            r=r,
            C=C,
            acc_static=self.acc_static,
        )
        gspec = pl.BlockSpec(
            (1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (C, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec(tuple(self.btabs_f.shape)),
                _full_spec((spec.W, spec.W)),
            ],
            out_specs=(cspec,) * 4,
            out_shape=tuple(
                jax.ShapeDtypeStruct((C, B_pad), jnp.int32) for _ in range(4)
            ),
            scratch_shapes=[pltpu.VMEM((spec.W, B_blk), jnp.uint32)]
            + [pltpu.VMEM((C, B_blk), jnp.int32)] * 4,
            interpret=_interpret(),
        )(lenT, tm, self.btabs_f, self.ltri)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _flags_call_b(
        self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r
    ):
        C = self.at1.shape[0]
        spec = self.bspec
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _bitband_flags_kernel_b,
            spec=spec,
            seeded=seeded,
            n_seed=2,
            T_chunk=T_chunk,
            r=r,
            C=C,
            acc_static=self.acc_static,
        )
        gspec = pl.BlockSpec(
            (1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec(tuple(self.btabs_f.shape)),
                _full_spec((spec.W, spec.W)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, C, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, C, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((spec.W, B_blk), jnp.uint32)],
            interpret=_interpret(),
        )(lenT, tm, self.btabs_f, self.ltri)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _reverse_call_b(self, data, lenT, L, T_pad, B_pad, B_blk, T_chunk, r):
        spec = self.bspec
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _bitband_reverse_kernel_b, spec=spec, T_chunk=T_chunk, r=r
        )
        gspec = pl.BlockSpec(
            (1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r, B_blk),
            lambda i, j, nT=nT: (nT - 1 - j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec(tuple(self.btabs_r.shape)),
                _full_spec((spec.W, spec.W)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, 1, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, 1, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((spec.W, B_blk), jnp.uint32)],
            interpret=_interpret(),
        )(lenT, tm, self.btabs_r, self.utri)

    # -- anchored rescan + device-side span rounds ----------------------
    # has_anchor is set per-instance in __init__: True for single-channel
    # non-nullable programs, enabling the O(1)-dispatch finditer path
    # (api._finditer_device) that the container scanner never had.

    def anchor_end_b(self, data, len_g, starts_g, *, longest: bool):
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(L, B_rows)
        lenT = self._lenT(len_g, B_pad)
        startsT = jnp.pad(
            jnp.transpose(jnp.asarray(starts_g), (1, 0)),
            ((0, 0), (0, B_pad - B_rows)),
            constant_values=-1,
        )
        end = self._bb_anchor_call(
            data, lenT, startsT, longest, L, T_pad, B_pad, B_blk, T_chunk, r
        )
        return jnp.transpose(end[:, :B_rows], (1, 0))

    def _bb_anchor_pl(
        self, tm, lenT, startsT, longest, T_pad, B_pad, B_blk, T_chunk, r
    ):
        spec = self.bspec
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _bitband_anchor_kernel_b,
            spec=spec,
            longest=longest,
            T_chunk=T_chunk,
            r=r,
            acc_static=self._anchor_acc_static,
        )
        gspec = pl.BlockSpec(
            (1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                gspec,
                dspec,
                _full_spec(tuple(self.btabs_f.shape)),
                _full_spec((spec.W, spec.W)),
            ],
            out_specs=gspec,
            out_shape=jax.ShapeDtypeStruct((1, B_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((spec.W, B_blk), jnp.uint32),
                pltpu.VMEM((1, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, startsT, tm, self.btabs_f, self.ltri)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "longest", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _bb_anchor_call(
        self, data, lenT, startsT, longest, L, T_pad, B_pad, B_blk, T_chunk, r
    ):
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        return self._bb_anchor_pl(
            tm, lenT, startsT, longest, T_pad, B_pad, B_blk, T_chunk, r
        )

    def lazy_spans_b(self, data, len_g, *, cap: int):
        s, e, c, _ = self._bb_spans(data, len_g, cap, longest=False)
        return s, e, c

    def greedy_spans_b(self, data, len_g, *, cap: int):
        return self._bb_spans(data, len_g, cap, longest=True)

    def _bb_spans(self, data, len_g, cap, *, longest: bool):
        """Span rounds on device (reverse pass -> while_loop of anchored
        rescans, the scan_packed.spans_rounds structure with the bit
        kernels). Non-nullable only (has_anchor gates the callers)."""
        assert not self.nullable
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(L, B_rows)
        lenT = self._lenT(len_g, B_pad)
        return self._bb_spans_call(
            data, lenT, cap, longest, L, T, T_pad, B_pad, B_blk, T_chunk, r
        )

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "cap", "longest", "L", "T", "T_pad", "B_pad", "B_blk",
            "T_chunk", "r",
        ),
    )
    def _bb_spans_call(
        self, data, lenT, cap, longest, L, T, T_pad, B_pad, B_blk, T_chunk, r
    ):
        Bn = data.shape[0]
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        hits = self._bb_reverse_pl(tm, lenT, T_pad, B_pad, B_blk, T_chunk, r)
        h2 = jnp.transpose(hits[:T, 0, :Bn], (1, 0)) > 0  # [Bn, T]
        lens = lenT[0, :Bn]
        sbm = jnp.zeros((Bn, L + 1), bool)
        s_of_col = jnp.minimum(jnp.maximum(jnp.arange(T) - 1, 0), L)
        sbm = sbm.at[jnp.arange(Bn)[:, None], s_of_col[None, :]].max(h2)
        cols = jnp.arange(L + 1)[None, :]
        neg = jnp.full((Bn, cap + 1), -1, jnp.int32)

        def cond(st):
            k, pos, active, _, _, ki = st
            return jnp.any(active) & (k < cap)

        def body(st):
            k, pos, active, sbuf, ebuf, ki = st
            m = sbm & (cols >= pos[:, None]) & (cols <= lens[:, None])
            m = m & active[:, None]
            has = m.any(axis=1)
            s = jnp.where(has, jnp.argmax(m, axis=1), -1).astype(jnp.int32)
            active = active & has
            sT = jnp.pad(
                s[None, :], ((0, 0), (0, B_pad - Bn)), constant_values=-1
            )
            e = self._bb_anchor_pl(
                tm, lenT, sT, longest, T_pad, B_pad, B_blk, T_chunk, r
            )
            e = e[0, :Bn]
            emit = active & (e >= s)
            kk = jnp.where(emit, ki, cap)
            bb = jnp.arange(Bn)
            sbuf = sbuf.at[bb, kk].set(jnp.where(emit, s, -1))
            ebuf = ebuf.at[bb, kk].set(jnp.where(emit, e, -1))
            pos = jnp.where(emit, jnp.maximum(e, s + 1), pos)
            ki = ki + emit.astype(jnp.int32)
            active = active & emit & (pos <= lens)
            return k + 1, pos, active, sbuf, ebuf, ki

        st = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.asarray(0, jnp.int32),
                jnp.zeros(Bn, jnp.int32),
                jnp.ones(Bn, bool),
                neg,
                neg,
                jnp.zeros(Bn, jnp.int32),
            ),
        )
        _, _, active, sbuf, ebuf, ki = st
        return sbuf[:, :cap], ebuf[:, :cap], ki, active

    def _bb_reverse_pl(self, tm, lenT, T_pad, B_pad, B_blk, T_chunk, r):
        """Reverse pallas_call from an already-built time-major array
        (shared by the span rounds; _reverse_call_b wraps it)."""
        spec = self.bspec
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _bitband_reverse_kernel_b, spec=spec, T_chunk=T_chunk, r=r
        )
        gspec = pl.BlockSpec(
            (1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r, B_blk),
            lambda i, j, nT=nT: (nT - 1 - j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec(tuple(self.btabs_r.shape)),
                _full_spec((spec.W, spec.W)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, 1, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, 1, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((spec.W, B_blk), jnp.uint32)],
            interpret=_interpret(),
        )(lenT, tm, self.btabs_r, self.utri)
