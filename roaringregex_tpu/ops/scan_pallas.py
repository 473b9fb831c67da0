"""Pallas TPU kernels for the lane-packed NFA scan.

The whole per-record byte loop runs *inside one kernel*: the reachable-state
vectors live in VMEM scratch across grid steps, the block-diagonal follow
matmul feeds the MXU every step, and the bit-packed mask stream is unpacked
with two VPU ops — no per-step XLA dispatch, no HBM round-trips for the
carry. This is the TPU replacement for the reference's per-byte
``Processor::shift`` hot loop (NFA.cc:72-102, SURVEY.md §2.6).

Layout (transposed vs. ops/scan_packed.py — lanes want the batch minor):

* state vectors ``v``: [lanes, B_blk]  (lanes = 128, or 256 on dense256)
* mask stream: [T_pad, W, B_rows_pad] uint32, W = lanes/32
* matmuls: y^T = F^T @ v^T, so the kernel holds ``FT = F_bd.T``

Grid = (row-blocks, T-chunks); T-chunks iterate innermost so the VMEM
carry walks each row-block's full stream before moving on. Stream padding
uses all-zero mask words, which kill every state — semantically inert.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.program import DeviceProgram

DTYPE = jnp.bfloat16

# Match-stats kernel: no big outputs, so large batch blocks win (VMEM
# budget ~= stream block * 2 buffers). Flags/reverse kernels write a
# [T_chunk, G, B_blk] block per step, so they run smaller batches.
B_BLK_MAX = 2048
T_CHUNK_MAX = 128
B_BLK_FLAGS = 1024
# the span kernel adds a [T_chunk, G, B_blk] int32 event block + the int8
# hits block on top of the byte slab; 1024-column blocks exceed the 16 MB
# scoped-VMEM limit on large batches (observed at B_pad = 5120)
B_BLK_SPANS = 512
STREAM_VMEM_BUDGET = 2 * 1024 * 1024  # bytes per stream block (x2 buffers)


def _pow2_floor(x: int) -> int:
    return 1 << max(0, x.bit_length() - 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _unpack_bits(words, lanes: int, B: int):
    """[W, B] uint32 -> [lanes, B] bool (lane l = 32*(l//32) + l%32)."""
    W = lanes // 32
    bitmask = (jnp.uint32(1) << jax.lax.broadcasted_iota(
        jnp.uint32, (W, 32, B), 1
    ))
    bits = (words[:, None, :] & bitmask) != 0
    return bits.reshape(lanes, B)


def _match_kernel(
    len_ref,  # [G, B] int32
    stream_ref,  # [T_chunk, W, B] uint32
    ft_ref,  # [lanes, lanes] bf16 (F_bd^T)
    at_ref,  # [G, lanes] bf16
    seed_ref,  # [lanes, 1] bf16
    cnt_out,  # [G, B] int32
    first_out,  # [G, B] int32
    v_s,  # scratch [lanes, B] bf16
    cnt_s,
    first_s,
    last_s,  # scratch [G, B] int32
    *,
    seeded: bool,
    nullable: bool,
    n_seed: int,
    T_chunk: int,
    lanes: int,
):
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    B = v_s.shape[1]
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col
        if nullable:
            if seeded:
                cnt_s[:] = lens + 1
                last_s[:] = lens
            else:
                cnt_s[:] = jnp.ones_like(lens)
                last_s[:] = jnp.zeros_like(lens)
            first_s[:] = jnp.zeros_like(lens)
        else:
            cnt_s[:] = jnp.zeros_like(lens)
            first_s[:] = jnp.full_like(lens, -1)
            last_s[:] = jnp.full_like(lens, -1)

    def body(t, _):
        tg = j * T_chunk + t
        v = v_s[:]
        if not seeded:
            v = jnp.where(tg < n_seed, jnp.maximum(v, seed_col), v)
        else:
            v = jnp.maximum(v, seed_col)
        y = jnp.dot(
            ft_ref[:], v, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        bits = _unpack_bits(stream_ref[t], lanes, B)
        v2 = ((y > 0) & bits).astype(DTYPE)
        v_s[:] = v2
        fl = (
            jnp.dot(at_ref[:], v2, preferred_element_type=jnp.float32).astype(
                jnp.float32
            )
            > 0
        )  # [G, B]
        e = jnp.minimum(tg, lens)
        if nullable and seeded:
            pass  # every end pre-counted at init
        else:
            new = fl & (e != last_s[:])
            cnt_s[:] = cnt_s[:] + new.astype(jnp.int32)
        first_s[:] = jnp.where((first_s[:] < 0) & fl, e, first_s[:])
        last_s[:] = jnp.where(fl, e, last_s[:])
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        cnt_out[:] = cnt_s[:]
        first_out[:] = first_s[:]


def _flags_kernel(
    stream_ref,  # [T_chunk, W, B] uint32
    ft_ref,
    at_ref,
    seed_ref,
    flags_out,  # [T_chunk, G, B] int8 (per-step accept flags)
    v_s,
    *,
    seeded: bool,
    n_seed: int,
    T_chunk: int,
    lanes: int,
):
    j = pl.program_id(1)
    B = v_s.shape[1]
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col

    def body(t, _):
        tg = j * T_chunk + t
        v = v_s[:]
        if not seeded:
            v = jnp.where(tg < n_seed, jnp.maximum(v, seed_col), v)
        else:
            v = jnp.maximum(v, seed_col)
        y = jnp.dot(
            ft_ref[:], v, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        bits = _unpack_bits(stream_ref[t], lanes, B)
        v2 = ((y > 0) & bits).astype(DTYPE)
        v_s[:] = v2
        fl = (
            jnp.dot(at_ref[:], v2, preferred_element_type=jnp.float32).astype(
                jnp.float32
            )
            > 0
        )
        flags_out[t] = fl.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)


def _reverse_kernel(
    stream_ref,  # [T_chunk, W, B] uint32 (chunk j' = nT-1-j of the stream)
    f_ref,  # [lanes, lanes] bf16 (F_bd, untransposed: Rn^T = F @ masked^T)
    sg_ref,  # [G, lanes] bf16 (seed_groups^T)
    acc_ref,  # [lanes, 1] bf16 (accept_lanes)
    hits_out,  # [T_chunk, G, B] int8
    r_s,  # scratch [lanes, B] bf16
    *,
    T_chunk: int,
    lanes: int,
):
    j = pl.program_id(1)
    B = r_s.shape[1]
    acc_col = jnp.broadcast_to(acc_ref[:], (lanes, B)).astype(DTYPE)

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((lanes, B), DTYPE)

    def body(t, _):
        # walk the chunk backwards
        tr = T_chunk - 1 - t
        R = jnp.maximum(r_s[:], acc_col)
        bits = _unpack_bits(stream_ref[tr], lanes, B)
        masked = ((R.astype(jnp.float32) > 0) & bits).astype(DTYPE)
        Rn = jnp.dot(
            f_ref[:], masked, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        Rn = (Rn > 0).astype(DTYPE)
        r_s[:] = Rn
        hit = (
            jnp.dot(sg_ref[:], Rn, preferred_element_type=jnp.float32).astype(
                jnp.float32
            )
            > 0
        )
        hits_out[tr] = hit.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)


# ---------------------------------------------------------------------------
# Block-sparse kernels (S > 1024: the roaring-container tier)
#
# The follow matrix is applied as static per-pattern structure: partial
# ("bitmap") blocks are explicit 128x128 MXU matmuls; all-ones ("run")
# blocks reduce to a rank-1 any-reduce through the tiny U map — the TPU
# translation of CRoaring's run/bitmap container dichotomy (SURVEY.md §2.2).
# ---------------------------------------------------------------------------


def _sparse_expand(v, pbt_ref, ut_ref, bsum_ref, groups, nb, B):
    """y^T = F^T @ v^T via containers. ``groups[c]`` = ((r, k), ...) static.
    Returns list of per-col-block boolean f32 accumulators [128, B]."""
    a = (
        jnp.dot(bsum_ref[:], v, preferred_element_type=jnp.float32).astype(
            jnp.float32
        )
        > 0
    ).astype(DTYPE)  # [nb, B] block-any of v
    fullc = jnp.dot(
        ut_ref[:], a, preferred_element_type=jnp.float32
    ).astype(jnp.float32)  # [nb, B]
    outs = []
    for c in range(nb):
        acc = jnp.broadcast_to(fullc[c : c + 1, :], (128, B))
        for (r, k) in groups[c]:
            acc = acc + jnp.dot(
                pbt_ref[k], v[r * 128 : (r + 1) * 128, :],
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        outs.append(acc)
    return outs


def _sparse_expand_batched(v, pbt_ref, ut_ref, bsum_ref, groups, prow, nb, B):
    """Container expansion with the partial blocks applied as ONE batched
    dot_general ([np,128,128] x [np,128,B]) instead of a Python-unrolled
    dot per block — O(np) fewer MXU ops to schedule, which is what made
    the sparse tier's Mosaic compile take minutes (VERDICT r1 weak #8).
    Returns [lanes, B] f32 count accumulator (not per-block lists)."""
    npart = len(prow)
    a = (
        jnp.dot(bsum_ref[:], v, preferred_element_type=jnp.float32).astype(
            jnp.float32
        )
        > 0
    ).astype(DTYPE)  # [nb, B]
    fullc = jnp.dot(
        ut_ref[:], a, preferred_element_type=jnp.float32
    ).astype(jnp.float32)  # [nb, B]
    vsel = jnp.stack(
        [v[r * 128 : (r + 1) * 128, :] for r in prow], axis=0
    )  # [np, 128, B]
    res = jax.lax.dot_general(
        pbt_ref[:], vsel,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [np, 128, B]
    cols = []
    for c in range(nb):
        acc = jnp.broadcast_to(fullc[c : c + 1, :], (128, B))
        for (_, k) in groups[c]:
            acc = acc + res[k]
        cols.append(acc)
    return jnp.concatenate(cols, axis=0)  # [lanes, B] f32


def _sparse_match_kernel(
    len_ref,  # [1, B]
    stream_ref,  # [T_chunk, W, B]
    pbt_ref,  # [np, 128, 128] bf16 (transposed partial blocks)
    ut_ref,  # [nb, nb] bf16 (U^T)
    bsum_ref,  # [nb, lanes] bf16 (block membership)
    at_ref,  # [1, lanes] bf16 (accept lanes)
    seed_ref,  # [lanes, 1]
    cnt_out,
    first_out,  # [1, B]
    v_s,  # [lanes, B] bf16
    cnt_s,
    first_s,
    last_s,  # [1, B] int32
    *,
    seeded: bool,
    nullable: bool,
    n_seed: int,
    T_chunk: int,
    lanes: int,
    groups,
):
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    B = v_s.shape[1]
    nb = lanes // 128
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col
        if nullable:
            if seeded:
                cnt_s[:] = lens + 1
                last_s[:] = lens
            else:
                cnt_s[:] = jnp.ones_like(lens)
                last_s[:] = jnp.zeros_like(lens)
            first_s[:] = jnp.zeros_like(lens)
        else:
            cnt_s[:] = jnp.zeros_like(lens)
            first_s[:] = jnp.full_like(lens, -1)
            last_s[:] = jnp.full_like(lens, -1)

    def body(t, _):
        tg = j * T_chunk + t
        v = v_s[:]
        if not seeded:
            v = jnp.where(tg < n_seed, jnp.maximum(v, seed_col), v)
        else:
            v = jnp.maximum(v, seed_col)
        bits = _unpack_bits(stream_ref[t], lanes, B)
        ys = _sparse_expand(v, pbt_ref, ut_ref, bsum_ref, groups, nb, B)
        fl_acc = jnp.zeros((1, B), jnp.float32)
        for c in range(nb):
            v2c = ((ys[c] > 0) & bits[c * 128 : (c + 1) * 128, :]).astype(
                DTYPE
            )
            v_s[c * 128 : (c + 1) * 128, :] = v2c
            fl_acc = fl_acc + jnp.dot(
                at_ref[:, c * 128 : (c + 1) * 128], v2c,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        fl = fl_acc > 0  # [1, B]
        e = jnp.minimum(tg, lens)
        if not (nullable and seeded):
            new = fl & (e != last_s[:])
            cnt_s[:] = cnt_s[:] + new.astype(jnp.int32)
        first_s[:] = jnp.where((first_s[:] < 0) & fl, e, first_s[:])
        last_s[:] = jnp.where(fl, e, last_s[:])
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        cnt_out[:] = cnt_s[:]
        first_out[:] = first_s[:]


def _sparse_flags_kernel(
    stream_ref,
    pbt_ref,
    ut_ref,
    bsum_ref,
    at_ref,
    seed_ref,
    flags_out,  # [T_chunk, 1, B] int8
    v_s,
    *,
    seeded: bool,
    n_seed: int,
    T_chunk: int,
    lanes: int,
    groups,
):
    j = pl.program_id(1)
    B = v_s.shape[1]
    nb = lanes // 128
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col

    def body(t, _):
        tg = j * T_chunk + t
        v = v_s[:]
        if not seeded:
            v = jnp.where(tg < n_seed, jnp.maximum(v, seed_col), v)
        else:
            v = jnp.maximum(v, seed_col)
        bits = _unpack_bits(stream_ref[t], lanes, B)
        ys = _sparse_expand(v, pbt_ref, ut_ref, bsum_ref, groups, nb, B)
        fl_acc = jnp.zeros((1, B), jnp.float32)
        for c in range(nb):
            v2c = ((ys[c] > 0) & bits[c * 128 : (c + 1) * 128, :]).astype(
                DTYPE
            )
            v_s[c * 128 : (c + 1) * 128, :] = v2c
            fl_acc = fl_acc + jnp.dot(
                at_ref[:, c * 128 : (c + 1) * 128], v2c,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        flags_out[t] = (fl_acc > 0).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)


def _sparse_reverse_kernel(
    stream_ref,
    pb_ref,  # [np, 128, 128] bf16 (UNtransposed blocks: Rn^T = F @ m^T)
    u_ref,  # [nb, nb] bf16 (U, untransposed)
    bsum_ref,
    sg_ref,  # [1, lanes] (initial-state lanes)
    acc_ref,  # [lanes, 1]
    hits_out,  # [T_chunk, 1, B] int8
    r_s,
    *,
    T_chunk: int,
    lanes: int,
    rgroups,  # rgroups[r] = ((c, k), ...): blocks contributing to row-block r
):
    j = pl.program_id(1)
    B = r_s.shape[1]
    nb = lanes // 128
    acc_col = jnp.broadcast_to(acc_ref[:], (lanes, B)).astype(DTYPE)

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((lanes, B), DTYPE)

    def body(t, _):
        tr = T_chunk - 1 - t
        R = jnp.maximum(r_s[:], acc_col)
        bits = _unpack_bits(stream_ref[tr], lanes, B)
        masked = ((R.astype(jnp.float32) > 0) & bits).astype(DTYPE)
        ys = _sparse_expand(masked, pb_ref, u_ref, bsum_ref, rgroups, nb, B)
        hit_acc = jnp.zeros((1, B), jnp.float32)
        for r in range(nb):
            rnc = (ys[r] > 0).astype(DTYPE)
            r_s[r * 128 : (r + 1) * 128, :] = rnc
            hit_acc = hit_acc + jnp.dot(
                sg_ref[:, r * 128 : (r + 1) * 128], rnc,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        hits_out[tr] = (hit_acc > 0).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


def banded_offsets(ft: np.ndarray, max_diags: int):
    """Nonzero diagonal offsets of a transposed follow matrix, or None if
    there are more than ``max_diags`` (or none at all). Offset d means
    y[i] += ft[i, i-d] * v[i-d]. Bounded-repetition chains (a{1,300},
    (ab){1,150} — the reference's pathological tier, Parser.cpp:165-168)
    have O(1) nonzero diagonals, so F^T @ v collapses to a few static
    lane-shifts + elementwise multiplies on the VPU instead of a lanes^2
    MXU matmul."""
    if max_diags <= 0:
        return None
    ii, jj = np.nonzero(np.asarray(ft))
    if ii.size == 0:
        return None
    ks = sorted(set(int(d) for d in (ii - jj)))
    return tuple(ks) if len(ks) <= max_diags else None


def _apply_ft(v, ft_ref, dks, *, B: int):
    """One automaton step y = F^T @ v. With ``dks`` set (banded mode),
    ft_ref holds per-diagonal coefficient columns and the product is a
    sum of shifted elementwise multiplies (see banded_offsets)."""
    if dks is None:
        return jnp.dot(
            ft_ref[:], v, preferred_element_type=jnp.float32
        ).astype(DTYPE)
    lanes = v.shape[0]
    y = None
    for k, d in enumerate(dks):
        c = ft_ref[:, k : k + 1]  # [lanes, 1]
        if d > 0:
            sh = jnp.concatenate(
                [jnp.zeros((d, B), DTYPE), v[: lanes - d, :]], axis=0
            )
        elif d < 0:
            sh = jnp.concatenate(
                [v[-d:, :], jnp.zeros((-d, B), DTYPE)], axis=0
            )
        else:
            sh = v
        t = c * sh
        y = t if y is None else y + t
    return y


class PallasScanner:
    """Owns kernel-layout tables + jit caches for one compiled program."""

    has_anchor = True  # anchored-rescan / span kernels available
    byte_window_ok = True  # match_stats_b supports windowed mode (lead>0)
    flag_words_ok = True  # bit-packed flag/hit word producers available
    diag_ks = None  # banded-diagonal plan (set when the follow is banded)
    ftd = None

    def __init__(
        self,
        prog: DeviceProgram,
        ptables: Dict[str, jnp.ndarray],
        nullable: "bool | None" = None,
    ):
        assert prog.tier != "sparse"
        self.prog = prog
        self.nullable = prog.nullable if nullable is None else nullable
        self.lanes = prog.lanes
        self.G = prog.G
        self.Gp = prog.G  # packing groups (fixed; G may alias channels)
        self.W = prog.lanes // 32
        self.spec = byte_spec(prog)
        # host-side layout transforms read the program's numpy tables, NOT
        # the device copies in ptables: a device->host fetch here would
        # both waste a round trip and (on the axon tunnel) permanently
        # degrade later host->device bandwidth ~30x (see stream.py)
        ft_np = np.asarray(prog.F_bd).T
        self.ft = jnp.asarray(ft_np, DTYPE)
        self.f = ptables["F_bd"].astype(DTYPE)
        # seed count column for the counts-chain kernels: c0 = F^T @ seed
        seed_np = np.asarray(prog.seed_row, np.float32)[:, None]
        self.c0 = jnp.asarray(ft_np.astype(np.float32) @ seed_np, DTYPE)
        # mask-by-matmul tables (used on G == 1 tiers: wide lanes)
        self.cspec = cls_spec(prog) if prog.G == 1 else None
        self.bct = jnp.asarray(prog.Bc.T, DTYPE)  # [lanes, c_pad]
        # banded-diagonal plan (G == 1 tiers only: lane-packed block-diag
        # layouts scatter the band across groups)
        if prog.G == 1:
            from ..utils.config import get_config

            ks = banded_offsets(ft_np, get_config().banded_max_diags)
            if ks:
                nd_pad = max(128, _round_up(len(ks), 128))
                tbl = np.zeros((self.lanes, nd_pad), np.float32)
                for k, d in enumerate(ks):
                    i = np.arange(max(0, d), min(self.lanes, self.lanes + d))
                    tbl[i, k] = ft_np[i, i - d]
                self.diag_ks = ks
                self.ftd = jnp.asarray(tbl, DTYPE)
        # "A_np" = engine-provided numpy accept map (multi-pattern
        # channels); default = the program's per-group accept columns
        a_np = ptables.get("A_np")
        if a_np is None:
            a_np = prog.accept_groups
        self.at = jnp.asarray(np.asarray(a_np).T, DTYPE)
        sg_np = np.zeros((prog.lanes, prog.G), dtype=np.uint8)
        for g in range(prog.G):
            sg_np[g * prog.s_tile, g] = 1
        self.sg = jnp.asarray(sg_np.T, DTYPE)
        self.seed = ptables["seed_row"].astype(DTYPE)[:, None]
        self.acc = ptables["accept_lanes"].astype(DTYPE)[:, None]

    # -- stream layout ------------------------------------------------------
    def _blk_limits(self, b_blk_max: int) -> Tuple[int, int]:
        """(B_blk_cap, T_chunk_cap) scaled so a stream block fits the VMEM
        budget at this tier's lane width (W words per row-step)."""
        from ..utils.config import get_config

        cfg = get_config()
        b_blk_max = min(b_blk_max, cfg.b_blk_max)
        if self.lanes > 256:
            b_blk_max = min(b_blk_max, 512 if self.lanes <= 512 else 256)
        t_cap = STREAM_VMEM_BUDGET // (self.W * b_blk_max * 4)
        t_cap = max(8, min(cfg.t_chunk_max, T_CHUNK_MAX, _pow2_floor(t_cap)))
        return b_blk_max, t_cap

    def kernel_stream(
        self, words: jnp.ndarray, layout: str, b_blk_max: int = B_BLK_MAX
    ) -> jnp.ndarray:
        """Pad a mask stream to block multiples. ``layout``: 'kernel' for
        [T, W, B_rows] (engine fast path), 'packed' for the scan_packed
        [T, B_rows, W] layout (transposed here)."""
        T = words.shape[0]
        if layout == "packed":
            words = jnp.transpose(words, (0, 2, 1))
        else:
            assert layout == "kernel", layout
        b_cap, t_cap = self._blk_limits(b_blk_max)
        B_rows = words.shape[2]
        B_blk = min(b_cap, _round_up(B_rows, 128))
        B_pad = _round_up(B_rows, B_blk)
        T_chunk = min(t_cap, _round_up(T, 8))
        T_pad = _round_up(T, T_chunk)
        return jnp.pad(words, ((0, T_pad - T), (0, 0), (0, B_pad - B_rows)))

    def _geom(
        self, T_pad: int, B_pad: int, b_blk_max: int = B_BLK_MAX
    ) -> Tuple[int, int]:
        b_cap, t_cap = self._blk_limits(b_blk_max)
        B_blk = min(b_cap, B_pad)
        T_chunk = min(t_cap, T_pad)
        return B_blk, T_chunk

    # -- entry points -------------------------------------------------------
    def match_stats(self, words, len_g, *, seeded: bool, layout: str = "packed"):
        """words: mask stream in ``layout``; len_g [B_rows, G].
        Returns (cnt, first, any) each [B_rows, G]."""
        T = words.shape[0]
        B_rows = len_g.shape[0]
        stream = self.kernel_stream(words, layout)
        T_pad, W, B_pad = stream.shape
        B_blk, T_chunk = self._geom(T_pad, B_pad)
        lenT = jnp.pad(
            jnp.transpose(jnp.asarray(len_g), (1, 0)), ((0, 0), (0, B_pad - B_rows))
        )
        cnt, first = self._match_call(
            stream, lenT, seeded, T_pad, B_pad, B_blk, T_chunk
        )
        cnt = jnp.transpose(cnt[:, :B_rows], (1, 0))
        first = jnp.transpose(first[:, :B_rows], (1, 0))
        return cnt, first, cnt > 0

    @functools.partial(jax.jit, static_argnames=("self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk"))
    def _match_call(self, stream, lenT, seeded, T_pad, B_pad, B_blk, T_chunk):
        G, lanes, W = self.G, self.lanes, self.W
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _match_kernel,
            seeded=seeded,
            nullable=self.nullable,
            n_seed=2,
            T_chunk=T_chunk,
            lanes=lanes,
        )
        out_spec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        cnt, first = pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_chunk, W, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((lanes, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lanes, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((G, B_pad), jnp.int32),
                jax.ShapeDtypeStruct((G, B_pad), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((G, B_blk), jnp.int32),
                pltpu.VMEM((G, B_blk), jnp.int32),
                pltpu.VMEM((G, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, stream, self.ft, self.at, self.seed)
        return cnt, first

    def forward_flags(self, words, *, seeded: bool, layout: str = "packed"):
        """[B, T+1] accept flags (record r = row*G + g)."""
        T = words.shape[0]
        B_rows = words.shape[1] if layout == "packed" else words.shape[2]
        stream = self.kernel_stream(words, layout, B_BLK_FLAGS)
        T_pad, W, B_pad = stream.shape
        B_blk, T_chunk = self._geom(T_pad, B_pad, B_BLK_FLAGS)
        flags = self._flags_call(stream, seeded, T_pad, B_pad, B_blk, T_chunk)
        # [T_pad, G, B_pad] -> [B, T+1]
        fl = flags[:T, :, :B_rows].transpose(2, 1, 0).reshape(B_rows * self.G, T)
        nullable0 = bool(self.prog.nullable)
        flag0 = jnp.full((fl.shape[0], 1), nullable0, bool)
        return jnp.concatenate([flag0, fl > 0], axis=1)

    @functools.partial(jax.jit, static_argnames=("self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk"))
    def _flags_call(self, stream, seeded, T_pad, B_pad, B_blk, T_chunk):
        G, lanes, W = self.G, self.lanes, self.W
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _flags_kernel, seeded=seeded, n_seed=2, T_chunk=T_chunk, lanes=lanes
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec(
                    (T_chunk, W, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((lanes, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lanes, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, G, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, G, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(stream, self.ft, self.at, self.seed)

    def reverse_hits(self, words, *, layout: str = "packed"):
        """[B, T]: some match starts at position max(j-1, 0)."""
        T = words.shape[0]
        B_rows = words.shape[1] if layout == "packed" else words.shape[2]
        stream = self.kernel_stream(words, layout, B_BLK_FLAGS)
        T_pad, W, B_pad = stream.shape
        B_blk, T_chunk = self._geom(T_pad, B_pad, B_BLK_FLAGS)
        hits = self._reverse_call(stream, T_pad, B_pad, B_blk, T_chunk)
        h = hits[:T, :, :B_rows].transpose(2, 1, 0).reshape(B_rows * self.G, T)
        return h > 0

    @functools.partial(jax.jit, static_argnames=("self", "T_pad", "B_pad", "B_blk", "T_chunk"))
    def _reverse_call(self, stream, T_pad, B_pad, B_blk, T_chunk):
        G, lanes, W = self.G, self.lanes, self.W
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(_reverse_kernel, T_chunk=T_chunk, lanes=lanes)
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                # iterate T-chunks back to front
                pl.BlockSpec(
                    (T_chunk, W, B_blk),
                    lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((lanes, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lanes, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, G, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, G, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(stream, self.f, self.sg, self.acc)


class SparseScanner(PallasScanner):
    """Block-sparse (roaring-container) scanner for S > 1024.

    ``has_anchor = False``: anchored-rescan/span extraction falls back to
    the packed/XLA paths (engine routes around it).

    Reuses the PallasScanner stream wrappers; only the pallas_call bodies
    differ — static per-pattern container structure is baked into the
    kernel (partial-block matmul list + full-block U map)."""

    has_anchor = False
    byte_window_ok = False  # engine windowed mode is dense-tier only
    flag_words_ok = False  # packed flag words use the dense matmul refs

    def __init__(
        self,
        prog: DeviceProgram,
        ptables: Dict[str, jnp.ndarray],
        accept_map: "np.ndarray | None" = None,
        nullable: "bool | None" = None,
    ):
        # bypass PallasScanner.__init__ (it requires dense F_bd)
        self.prog = prog
        self.nullable = prog.nullable if nullable is None else nullable
        self.lanes = prog.s_pad
        self.G = 1
        self.Gp = 1
        self.W = self.lanes // 32
        self.spec = byte_spec(prog)
        nb = self.lanes // 128
        pb, prow, pcol, U = prog.sparse_partition
        self.pb = jnp.asarray(pb, DTYPE)
        self.pbt = jnp.asarray(pb.transpose(0, 2, 1), DTYPE)
        self.u = jnp.asarray(U, DTYPE)
        self.ut = jnp.asarray(U.T, DTYPE)
        bsum = np.zeros((nb, self.lanes), np.uint8)
        for b in range(nb):
            bsum[b, b * 128 : (b + 1) * 128] = 1
        self.bsum = jnp.asarray(bsum, DTYPE)
        acc = np.zeros(self.lanes, np.uint8)
        acc[: len(prog.accept)] = prog.accept
        if accept_map is not None:
            # [lanes, C] accept channels (multi-pattern) -> at rows
            self.at1 = jnp.asarray(np.asarray(accept_map).T, DTYPE)
        else:
            self.at1 = jnp.asarray(acc[None, :], DTYPE)
        sg = np.zeros((1, self.lanes), np.uint8)
        sg[0, 0] = 1
        self.sg1 = jnp.asarray(sg, DTYPE)
        seed = np.zeros((self.lanes, 1), np.uint8)
        seed[0, 0] = 1
        self.seed = jnp.asarray(seed, DTYPE)
        self.acc_col = jnp.asarray(acc[:, None], DTYPE)
        # static container structure
        groups = [[] for _ in range(nb)]
        rgroups = [[] for _ in range(nb)]
        for k in range(len(prow)):
            r, c = int(prow[k]), int(pcol[k])
            groups[c].append((r, k))
            rgroups[r].append((c, k))
        self.groups = tuple(tuple(g) for g in groups)
        self.rgroups = tuple(tuple(g) for g in rgroups)
        self.prow_t = tuple(int(x) for x in prow)
        self.cspec = cls_spec(prog)
        self.bct = jnp.asarray(prog.Bc.T, DTYPE)  # [lanes, c_pad]

    @property
    def n_partial(self) -> int:
        return int(self.pb.shape[0])

    @functools.partial(
        jax.jit,
        static_argnames=("self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk"),
    )
    def _match_call(self, stream, lenT, seeded, T_pad, B_pad, B_blk, T_chunk):
        lanes, W = self.lanes, self.W
        nb_, nT = B_pad // B_blk, T_pad // T_chunk
        npart = self.pb.shape[0]
        nbk = lanes // 128
        kernel = functools.partial(
            _sparse_match_kernel,
            seeded=seeded,
            nullable=self.nullable,
            n_seed=2,
            T_chunk=T_chunk,
            lanes=lanes,
            groups=self.groups,
        )
        full = lambda shape: pl.BlockSpec(
            shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec((1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        cnt, first = pl.pallas_call(
            kernel,
            grid=(nb_, nT),
            in_specs=[
                pl.BlockSpec((1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_chunk, W, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
                ),
                full((npart, 128, 128)),
                full((nbk, nbk)),
                full((nbk, lanes)),
                full((1, lanes)),
                full((lanes, 1)),
            ],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((1, B_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, B_pad), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((1, B_blk), jnp.int32),
                pltpu.VMEM((1, B_blk), jnp.int32),
                pltpu.VMEM((1, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, stream, self.pbt, self.ut, self.bsum, self.at1, self.seed)
        return cnt, first

    @functools.partial(
        jax.jit,
        static_argnames=("self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk"),
    )
    def _flags_call(self, stream, seeded, T_pad, B_pad, B_blk, T_chunk):
        lanes, W = self.lanes, self.W
        nb_, nT = B_pad // B_blk, T_pad // T_chunk
        npart = self.pb.shape[0]
        nbk = lanes // 128
        kernel = functools.partial(
            _sparse_flags_kernel,
            seeded=seeded,
            n_seed=2,
            T_chunk=T_chunk,
            lanes=lanes,
            groups=self.groups,
        )
        full = lambda shape: pl.BlockSpec(
            shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(nb_, nT),
            in_specs=[
                pl.BlockSpec(
                    (T_chunk, W, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
                ),
                full((npart, 128, 128)),
                full((nbk, nbk)),
                full((nbk, lanes)),
                full((1, lanes)),
                full((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, 1, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, 1, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(stream, self.pbt, self.ut, self.bsum, self.at1, self.seed)

    @functools.partial(
        jax.jit,
        static_argnames=("self", "T_pad", "B_pad", "B_blk", "T_chunk"),
    )
    def _reverse_call(self, stream, T_pad, B_pad, B_blk, T_chunk):
        lanes, W = self.lanes, self.W
        nb_, nT = B_pad // B_blk, T_pad // T_chunk
        npart = self.pb.shape[0]
        nbk = lanes // 128
        kernel = functools.partial(
            _sparse_reverse_kernel,
            T_chunk=T_chunk,
            lanes=lanes,
            rgroups=self.rgroups,
        )
        full = lambda shape: pl.BlockSpec(
            shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(nb_, nT),
            in_specs=[
                pl.BlockSpec(
                    (T_chunk, W, B_blk),
                    lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                full((npart, 128, 128)),
                full((nbk, nbk)),
                full((nbk, lanes)),
                full((1, lanes)),
                full((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, 1, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, 1, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(stream, self.pb, self.u, self.bsum, self.sg1, self.acc_col)


def _first_end_kernel(
    len_ref,  # [G, B] int32
    starts_ref,  # [G, B] int32
    stream_ref,  # [T_chunk, W, B] uint32
    ft_ref,  # [lanes, lanes]
    at_ref,  # [G, lanes]
    seed_ref,  # [lanes, 1]
    first_out,  # [G, B] int32
    v_s,  # [lanes, B] bf16
    first_s,  # [G, B] int32
    *,
    T_chunk: int,
    lanes: int,
    s_tile: int,
):
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    B = v_s.shape[1]
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]
    starts = starts_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((lanes, B), DTYPE)
        first_s[:] = jnp.full((first_s.shape[0], B), -1, jnp.int32)

    def body(t, _):
        tg = j * T_chunk + t
        gate = ((starts == tg - 1) | ((starts == 0) & (tg <= 1))) & (
            starts >= 0
        )  # [G, B]
        G_ = gate.shape[0]
        gl = jnp.broadcast_to(
            gate.astype(DTYPE)[:, None, :], (G_, s_tile, B)
        ).reshape(lanes, B)
        v = jnp.maximum(v_s[:], gl * seed_col)
        y = jnp.dot(
            ft_ref[:], v, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        bits = _unpack_bits(stream_ref[t], lanes, B)
        v2 = ((y > 0) & bits).astype(DTYPE)
        v_s[:] = v2
        fl = (
            jnp.dot(at_ref[:], v2, preferred_element_type=jnp.float32).astype(
                jnp.float32
            )
            > 0
        )
        e = jnp.minimum(tg, lens)
        ok = fl & (e >= starts) & (first_s[:] < 0)
        first_s[:] = jnp.where(ok, e, first_s[:])
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        first_out[:] = first_s[:]


def _add_first_end(cls):
    """Attach the anchored-rescan entry point to PallasScanner."""

    def first_end_from(self, words, len_g, starts_g, *, layout: str = "kernel"):
        T = words.shape[0]
        B_rows = len_g.shape[0]
        stream = self.kernel_stream(words, layout)
        T_pad, W, B_pad = stream.shape
        B_blk, T_chunk = self._geom(T_pad, B_pad)
        lenT = jnp.pad(
            jnp.transpose(jnp.asarray(len_g), (1, 0)),
            ((0, 0), (0, B_pad - B_rows)),
        )
        startsT = jnp.pad(
            jnp.transpose(jnp.asarray(starts_g), (1, 0)),
            ((0, 0), (0, B_pad - B_rows)),
            constant_values=-1,
        )
        first = self._first_end_call(
            stream, lenT, startsT, T_pad, B_pad, B_blk, T_chunk
        )
        return jnp.transpose(first[:, :B_rows], (1, 0))

    @functools.partial(
        jax.jit,
        static_argnames=("self", "T_pad", "B_pad", "B_blk", "T_chunk"),
    )
    def _first_end_call(self, stream, lenT, startsT, T_pad, B_pad, B_blk, T_chunk):
        G, lanes, W = self.G, self.lanes, self.W
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _first_end_kernel,
            T_chunk=T_chunk,
            lanes=lanes,
            s_tile=self.prog.s_tile,
        )
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                gspec,
                pl.BlockSpec(
                    (T_chunk, W, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((lanes, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, lanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lanes, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=gspec,
            out_shape=jax.ShapeDtypeStruct((G, B_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((G, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, startsT, stream, self.ft, self.at, self.seed)

    cls.first_end_from = first_end_from
    cls._first_end_call = _first_end_call


_add_first_end(PallasScanner)


# ---------------------------------------------------------------------------
# Fused byte->mask kernels (the production scan path)
#
# Instead of materializing the [T, W, B] uint32 mask stream in HBM (one
# extra write + read per corpus byte at G=16, plus a dispatch), these
# kernels take the raw corpus bytes in time-major slabs and perform the
# byte->class->mask translation *in-kernel*: the program's byte runs
# (DeviceProgram.byte_runs) and per-class mask words (Bc_words) are baked
# into the kernel as static constants, so the translation is R range
# compares + selects on [G, B]-sized registers — off the MXU-dependent
# chain and overlappable with the follow matmul.
#
# Byte layout: [T_pad // r, r * G, B_pad] uint8, row m*G + g = stream step
# q*r + m of group g. r = min(32 // G, 8) steps share one slab so the
# (32, 128) int8 VMEM tile is filled; the scan body unrolls r steps per
# fori iteration with static row slices (no dynamic sublane indexing,
# which Mosaic rejects).
# ---------------------------------------------------------------------------


def cls_spec(prog: DeviceProgram) -> tuple:
    """Static per-class byte-run plan for the mask-by-matmul path (G == 1
    tiers): (runs_by_class, bos_class, eos_class, c_pad) where
    runs_by_class[c] = ((lo, hi), ...). The kernel builds a [c_pad, B]
    class-onehot from R range compares on [1, B] rows and contracts it
    with Bc^T on the MXU — O(lanes) cheaper than per-lane word unpacking
    for wide-lane tiers."""
    lo, hi, cl = prog.byte_runs
    by_cls: dict = {}
    for l, h, c in zip(lo, hi, cl):
        by_cls.setdefault(int(c), []).append((int(l), int(h)))
    runs_by_class = tuple(
        tuple(by_cls.get(c, ())) for c in range(prog.c_pad)
    )
    return runs_by_class, prog.bos_class, prog.eos_class, prog.c_pad


def _cls_mask(d, tg, lens, cspec, bct_ref, *, B: int):
    """[1, B] bytes -> [lanes, B] {0,1} bf16 mask via class-onehot matmul
    (bct_ref = Bc^T, [lanes, c_pad]). The onehot is built by comparing a
    [1, B] class-id row against a [c_pad, B] iota (one broadcast compare),
    then contracted on the MXU — O(lanes) cheaper than per-lane word
    unpacking for wide-lane (G == 1) tiers."""
    runs_by_class, bos_c, eos_c, c_pad = cspec
    dd = d.astype(jnp.int32)
    j = tg - 1
    # class id per byte (class 0 = dead; its Bc row is all-zero)
    cid = jnp.zeros((1, B), jnp.int32)
    for c in range(c_pad):
        for (lo, hi) in runs_by_class[c]:
            cid = jnp.where((dd >= lo) & (dd <= hi), jnp.int32(c), cid)
    cid = jnp.where(
        j < lens, cid, jnp.where(j == lens, jnp.int32(eos_c), jnp.int32(0))
    )
    cid = jnp.where(j < 0, jnp.int32(bos_c), cid)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_pad, B), 0)
    oh = (iota_c == cid).astype(jnp.int32).astype(DTYPE)  # [c_pad, B]
    return jnp.dot(
        bct_ref[:], oh, preferred_element_type=jnp.float32
    ).astype(DTYPE)


def byte_spec(prog: DeviceProgram) -> tuple:
    """Static in-kernel byte->mask plan: (runs, bos, eos) where runs is
    ((lo, hi, (word, ...)), ...) over the program's byte runs and
    bos/eos are the BOS/EOS mask words, all hashable python ints."""
    lo, hi, cl = prog.byte_runs
    W = prog.Bc_words  # [c_pad, Wt] uint32
    runs = tuple(
        (int(l), int(h), tuple(int(x) for x in W[int(c)]))
        for l, h, c in zip(lo, hi, cl)
    )
    bos = tuple(int(x) for x in W[prog.bos_class])
    eos = tuple(int(x) for x in W[prog.eos_class])
    return runs, bos, eos


def _bits_from_bytes(
    d, tg, lens, spec, *, s_tile: int, G: int, B: int, dtype=None
):
    """[G, B] uint8 raw bytes at stream step ``tg`` -> [G*s_tile, B] mask
    bits (bool, or {0,1} in ``dtype``). Step semantics match
    mask_stream_from_bytes: tg == 0 is BOS, byte position j = tg - 1;
    j == len is EOS, j > len is dead (all-zero).
    """
    runs, bos, eos = spec
    Wt = max(1, s_tile // 32)
    bits_n = min(32, s_tile)
    dd = d.astype(jnp.int32)
    j = tg - 1
    hits = [(dd >= lo) & (dd <= hi) for (lo, hi, _) in runs]
    parts = []
    for wt in range(Wt):
        mw = jnp.zeros((G, B), jnp.uint32)
        for h, (_, _, words) in zip(hits, runs):
            if words[wt]:
                mw = jnp.where(h, mw | jnp.uint32(words[wt]), mw)
        mw = jnp.where(
            j < lens, mw,
            jnp.where(j == lens, jnp.uint32(eos[wt]), jnp.uint32(0)),
        )
        mw = jnp.where(j < 0, jnp.uint32(bos[wt]), mw)
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (G, bits_n, B), 1)
        parts.append((mw[:, None, :] >> shifts) & jnp.uint32(1))
    x = parts[0] if Wt == 1 else jnp.concatenate(parts, axis=1)
    if dtype is not None:
        return x.astype(jnp.int32).astype(dtype).reshape(G * s_tile, B)
    return (x > 0).reshape(G * s_tile, B)


def _match_kernel_b(
    len_ref,  # [G, B] int32
    data_ref,  # [T_chunk // r, r * G, B] uint8
    ft_ref,  # [lanes, lanes] bf16 (F_bd^T)
    c0_ref,  # [lanes, 1] bf16: ft @ seed (the seed's count contribution)
    bct_ref,  # [c_pad, lanes] bf16 (Bc; used by the cls_mode mask matmul)
    at_ref,  # [G, lanes] bf16
    seed_ref,  # [lanes, 1] bf16
    cnt_out,  # [G, B] int32
    first_out,  # [G, B] int32
    last_out,  # [G, B] int32
    full_out,  # [G, B] int32 (whole-record acceptance; needs seeded=False)
    v_s,  # scratch [lanes, B] bf16
    cnt_s,
    first_s,
    last_s,
    full_s,  # scratch [G, B] int32
    *,
    seeded: bool,
    nullable: bool,
    n_seed: int,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
    cspec=None,
    dks=None,
    K: int = 1,
    Lp: int = 0,
    lead: int = 0,
):
    """Count-semantics scan: the per-step dependent chain is just

        y = ft @ v  (+ c0 seed counts);   v = y * bits

    with one boolean renormalization per slab. Reachability only needs
    truth of v > 0, which f32->bf16 rounding and {0,1} mask multiplication
    both preserve, so the thresholds/compares of the boolean formulation
    move OFF the latency-critical chain (they gated every step at ~2x the
    cost); accept flags are taken from the counts directly (> 0 in f32).
    Counts grow by at most a factor of s_tile (+G seeds) per step, so r <= 8
    steps between renorms stay far below bf16's 3.4e38 range for every tier.

    Short-record chaining (K > 1): each lane scans K records laid out as K
    consecutive ``Lp``-step segments (BOS | bytes | EOS | dead-pad), so the
    dependent chain stays ~K*Lp steps long and per-kernel-block fixed costs
    amortize over K times more bytes. The EOS mask ends every segment with
    v within the EOS class (whose follow set is empty), so the next
    segment's BOS step re-seeds exactly like a fresh scan — no state leaks
    across records. len_ref and the stat arrays carry K stacked blocks
    ([K*G, B] / [K*C, B]); per-step stats are routed to the live segment's
    block with an iota one-hot (elementwise, off the matmul chain).
    """
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    KG = len_ref.shape[0]
    G = KG // K  # packing groups (records per row-step)
    C = at_ref.shape[0]  # accept channels (G, or G*P for multi-pattern)
    P = C // G
    KC = K * C
    B = v_s.shape[1]
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    c0 = c0_ref[:]
    zero_c0 = jnp.zeros_like(c0)
    lens_all = len_ref[:]  # [K*G, B]
    lenc_all = (
        jnp.broadcast_to(lens_all[:, None, :], (KG, P, B)).reshape(KC, B)
        if P > 1
        else lens_all
    )

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col
        if nullable:
            if seeded:
                cnt_s[:] = lenc_all + 1
                last_s[:] = lenc_all
            else:
                cnt_s[:] = jnp.ones_like(lenc_all)
                last_s[:] = jnp.zeros_like(lenc_all)
            first_s[:] = jnp.zeros_like(lenc_all)
        else:
            cnt_s[:] = jnp.zeros_like(lenc_all)
            first_s[:] = jnp.full_like(lenc_all, -1)
            last_s[:] = jnp.full_like(lenc_all, -1)
        full_s[:] = (
            (lenc_all == 0).astype(jnp.int32)
            if nullable
            else jnp.zeros_like(lenc_all)
        )

    if K > 1:
        seg_row = jax.lax.broadcasted_iota(jnp.int32, (KC, B), 0) // C

    def body(i, _):
        slab = data_ref[i]  # [r*G, B]
        v = v_s[:]
        for m in range(r):
            d = slab[m * G : (m + 1) * G]
            tg = j * T_chunk + i * r + m
            if K == 1:
                tl = tg
                lens = lens_all
                lenc = lenc_all
            else:
                seg = tg // Lp
                tl = tg - seg * Lp
                lens = lens_all[0:G]
                for k in range(1, K):
                    lens = jnp.where(
                        seg == k, lens_all[k * G : (k + 1) * G], lens
                    )
                lenc = (
                    jnp.broadcast_to(lens[:, None, :], (G, P, B)).reshape(C, B)
                    if P > 1
                    else lens
                )
            y = _apply_ft(v, ft_ref, dks, B=B)
            if seeded:
                y = y + c0
            else:
                y = y + jnp.where(tl < n_seed, c0, zero_c0)
            if cspec is not None:
                b16 = _cls_mask(d, tl, lens, cspec, bct_ref, B=B)
            else:
                b16 = _bits_from_bytes(
                    d, tl, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
                )
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )  # [C, B]
            if lead:
                # windowed batch mode: the first ``lead`` steps of each
                # segment are the overlap prefix owned by the previous
                # window -- scan them (state warm-up) but report nothing
                fl = fl & (tl > lead)
            e = jnp.minimum(tl, lenc)
            if K > 1:
                # route this step's stats to the live segment's block
                fl = (
                    jnp.broadcast_to(fl[None], (K, C, B)).reshape(KC, B)
                    & (seg_row == seg)
                )
                e = jnp.broadcast_to(e[None], (K, C, B)).reshape(KC, B)
                fin = fl & jnp.broadcast_to(
                    (tl >= lenc)[None], (K, C, B)
                ).reshape(KC, B)
            else:
                fin = fl & (tl >= lenc)
            if not (nullable and seeded):
                new = fl & (e != last_s[:])
                cnt_s[:] = cnt_s[:] + new.astype(jnp.int32)
            first_s[:] = jnp.where((first_s[:] < 0) & fl, e, first_s[:])
            last_s[:] = jnp.where(fl, e, last_s[:])
            full_s[:] = full_s[:] | fin.astype(jnp.int32)
        # renorm: counts -> booleans once per slab (bf16-range safety)
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        cnt_out[:] = cnt_s[:]
        first_out[:] = first_s[:]
        last_out[:] = last_s[:]
        full_out[:] = full_s[:]


def _flags_kernel_b(
    len_ref,  # [G, B] int32
    data_ref,  # [T_chunk // r, r * G, B] uint8
    ft_ref,
    c0_ref,  # [lanes, 1] bf16 (ft @ seed)
    at_ref,
    seed_ref,
    flags_out,  # [T_chunk, G, B] int8
    v_s,
    *,
    seeded: bool,
    n_seed: int,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
    dks=None,
):
    """Counts-chain forward scan emitting per-step accept flags (see
    _match_kernel_b for the counts formulation)."""
    j = pl.program_id(1)
    G = len_ref.shape[0]
    B = v_s.shape[1]
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    c0 = c0_ref[:]
    zero_c0 = jnp.zeros_like(c0)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m * G : (m + 1) * G]
            tg = j * T_chunk + i * r + m
            y = _apply_ft(v, ft_ref, dks, B=B)
            if seeded:
                y = y + c0
            else:
                y = y + jnp.where(tg < n_seed, c0, zero_c0)
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            flags_out[i * r + m] = fl.astype(jnp.int8)
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _flags_words_kernel_b(
    len_ref,  # [G, B] int32
    data_ref,  # [T_chunk // r, r * G, B] uint8
    ft_ref,
    c0_ref,
    at_ref,
    seed_ref,
    words_out,  # [T_chunk // 32, C, B] uint32 (bit t%32 = step t's flag)
    v_s,
    w_s,  # [C, B] uint32 word accumulator
    *,
    seeded: bool,
    n_seed: int,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
    dks=None,
):
    """_flags_kernel_b emitting BIT-PACKED accept words: 1/8 byte per
    scanned byte instead of an int8 per step, so position bitmaps never
    materialize a [T, C, B] stream in HBM (VERDICT r4 #8; the
    fullmatch_flags fused treatment applied to the flags producer).
    Requires r | 32 and 32 | T_chunk (the wrapper's geometry enforces
    both)."""
    j = pl.program_id(1)
    G = len_ref.shape[0]
    B = v_s.shape[1]
    q = 32 // r  # fori iterations per output word
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    c0 = c0_ref[:]
    zero_c0 = jnp.zeros_like(c0)
    lens = len_ref[:]
    C = at_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        local = jnp.zeros((C, B), jnp.uint32)
        for m in range(r):
            d = slab[m * G : (m + 1) * G]
            tg = j * T_chunk + i * r + m
            y = _apply_ft(v, ft_ref, dks, B=B)
            if seeded:
                y = y + c0
            else:
                y = y + jnp.where(tg < n_seed, c0, zero_c0)
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            flu = fl.astype(jnp.uint32)
            local = local | (flu << m if m else flu)
        k = i % q
        w = jnp.where(k == 0, local << (k * r), w_s[:] | (local << (k * r)))
        w_s[:] = w

        @pl.when(k == q - 1)
        def _emit():
            words_out[i // q] = w

        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _reverse_kernel_b(
    len_ref,  # [G, B] int32
    data_ref,  # [T_chunk // r, r * G, B] uint8 (chunk nT-1-j of the stream)
    f_ref,  # [lanes, lanes] bf16 (F_bd, untransposed)
    sg_ref,  # [G, lanes] bf16
    acc_ref,  # [lanes, 1] bf16
    hits_out,  # [T_chunk, G, B] int8
    r_s,
    *,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
):
    """Counts-chain reverse scan: masked = (R + acc) * bits; Rn = F @ masked
    — the per-step dependent chain is add + mul + dot, with one boolean
    renormalization per slab (see _match_kernel_b)."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    G = len_ref.shape[0]
    B = r_s.shape[1]
    acc_col = jnp.broadcast_to(acc_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((lanes, B), DTYPE)

    def body(i, _):
        iq = T_chunk // r - 1 - i
        slab = data_ref[iq]
        R = r_s[:]
        for m in reversed(range(r)):
            d = slab[m * G : (m + 1) * G]
            # grid step j processes chunk nT-1-j (back-to-front walk)
            tg = (nT - 1 - j) * T_chunk + iq * r + m
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            masked = (R + acc_col) * b16
            R = jnp.dot(
                f_ref[:], masked, preferred_element_type=jnp.float32
            ).astype(DTYPE)
            hit = (
                jnp.dot(
                    sg_ref[:], R, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            hits_out[iq * r + m] = hit.astype(jnp.int8)
        r_s[:] = (R.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _reverse_words_kernel_b(
    len_ref,  # [G, B] int32
    data_ref,  # [T_chunk // r, r * G, B] uint8 (chunk nT-1-j)
    f_ref,
    sg_ref,
    acc_ref,
    words_out,  # [T_chunk // 32, G, B] uint32 (bit t%32 = step t's hit)
    r_s,
    w_s,  # [G, B] uint32 word accumulator
    *,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
):
    """_reverse_kernel_b emitting bit-packed start-hit words (see
    _flags_words_kernel_b). The back-to-front walk fills each word from
    its high quarter down and emits when the low quarter lands."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    G = len_ref.shape[0]
    B = r_s.shape[1]
    q = 32 // r
    acc_col = jnp.broadcast_to(acc_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((lanes, B), DTYPE)

    def body(i, _):
        iq = T_chunk // r - 1 - i
        slab = data_ref[iq]
        R = r_s[:]
        local = jnp.zeros((G, B), jnp.uint32)
        for m in reversed(range(r)):
            d = slab[m * G : (m + 1) * G]
            tg = (nT - 1 - j) * T_chunk + iq * r + m
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            masked = (R + acc_col) * b16
            R = jnp.dot(
                f_ref[:], masked, preferred_element_type=jnp.float32
            ).astype(DTYPE)
            hit = (
                jnp.dot(
                    sg_ref[:], R, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            hu = hit.astype(jnp.uint32)
            local = local | (hu << m if m else hu)
        k = iq % q
        w = jnp.where(
            k == q - 1, local << (k * r), w_s[:] | (local << (k * r))
        )
        w_s[:] = w

        @pl.when(k == 0)
        def _emit():
            words_out[iq // q] = w

        r_s[:] = (R.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _anchor_end_kernel_b(
    len_ref,  # [G, B] int32
    starts_ref,  # [G, B] int32 per-record anchored start; -1 inactive
    data_ref,  # [T_chunk // r, r * G, B] uint8
    ft_ref,
    c0_ref,  # [lanes, 1] bf16 (ft @ seed)
    at_ref,
    seed_ref,
    end_out,  # [G, B] int32
    v_s,
    end_s,
    *,
    longest: bool,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
):
    """Anchored rescan: smallest (lazy) or largest (greedy leftmost-longest)
    end of a match starting exactly at ``starts`` — the two span policies
    (the reference's never-implemented greedy iterator, regex.h:150-165).
    Counts-chain formulation (see _match_kernel_b); the per-record seed
    gate folds into the post-matmul add because F_bd is block-diagonal per
    record tile."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    G = len_ref.shape[0]
    B = v_s.shape[1]
    c0_col = jnp.broadcast_to(c0_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]
    starts = starts_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((lanes, B), DTYPE)
        end_s[:] = jnp.full((end_s.shape[0], B), -1, jnp.int32)

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m * G : (m + 1) * G]
            tg = j * T_chunk + i * r + m
            gate = ((starts == tg - 1) | ((starts == 0) & (tg <= 1))) & (
                starts >= 0
            )
            gl = jnp.broadcast_to(
                gate.astype(DTYPE)[:, None, :], (G, s_tile, B)
            ).reshape(lanes, B)
            y = jnp.dot(
                ft_ref[:], v, preferred_element_type=jnp.float32
            ).astype(DTYPE)
            y = y + gl * c0_col
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            e = jnp.minimum(tg, lens)
            if longest:
                ok = fl & (e >= starts)
                end_s[:] = jnp.where(ok, e, end_s[:])
            else:
                ok = fl & (e >= starts) & (end_s[:] < 0)
                end_s[:] = jnp.where(ok, e, end_s[:])
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        end_out[:] = end_s[:]


def _span_kernel_b(
    len_ref,  # [G, B] int32
    hits_ref,  # [T_chunk, G, B] int8: candidate-start stream (reverse pass)
    data_ref,  # [T_chunk // r, r * G, B] uint8
    ft_ref,
    c0_ref,  # [lanes, 1] bf16 (ft @ seed)
    at_ref,  # [G, lanes]
    seed_ref,
    ev_out,  # [T_chunk, G, B] int32: span start + 1 at its emit step, else 0
    v_s,
    pos_s,  # [G, B] int32: next allowed start position
    cur_s,  # [G, B] int32: active anchored start (-1 idle)
    *,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
):
    """One-pass lazy (leftmost-shortest, non-overlapping) span enumeration.

    Non-overlap makes the anchored rescans of successive spans disjoint in
    time, so a single forward walk suffices: claim the first candidate
    start >= pos when idle, run the anchored automaton, emit at its first
    accept, reset, repeat — the whole per-record matching loop of
    finditer_batch inside one kernel (SURVEY.md §7.3 span extraction; the
    capability the reference's empty Iterator.cpp was meant to hold).
    Requires a non-nullable pattern (nullable lazy spans are the trivial
    all-positions set, handled by the caller).
    """
    j = pl.program_id(1)
    G = len_ref.shape[0]
    B = v_s.shape[1]
    c0_col = jnp.broadcast_to(c0_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((lanes, B), DTYPE)
        pos_s[:] = jnp.zeros((G, B), jnp.int32)
        cur_s[:] = jnp.full((G, B), -1, jnp.int32)

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m * G : (m + 1) * G]
            tg = j * T_chunk + i * r + m
            # int8 -> int32 before comparing (Mosaic lacks sub-word cmp)
            hit = hits_ref[i * r + m].astype(jnp.int32) > 0
            sp = jnp.maximum(tg - 1, 0)
            cur = cur_s[:]
            claim = (cur < 0) & hit & (sp >= pos_s[:]) & (sp <= lens)
            cur = jnp.where(claim, sp, cur)
            gate = ((cur == tg - 1) | ((cur == 0) & (tg <= 1))) & (cur >= 0)
            gl = jnp.broadcast_to(
                gate.astype(DTYPE)[:, None, :], (G, s_tile, B)
            ).reshape(lanes, B)
            y = jnp.dot(
                ft_ref[:], v, preferred_element_type=jnp.float32
            ).astype(DTYPE)
            y = y + gl * c0_col  # block-diagonal F: per-record seed add
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            e = jnp.minimum(tg, lens)
            done = fl & (cur >= 0) & (e >= cur)
            ev_out[i * r + m] = jnp.where(done, cur + 1, 0)
            pos_s[:] = jnp.where(done, jnp.maximum(e, cur + 1), pos_s[:])
            cur_s[:] = jnp.where(done, -1, cur)
            keep = jnp.broadcast_to(
                (~done).astype(DTYPE)[:, None, :], (G, s_tile, B)
            ).reshape(lanes, B)
            v = v * keep  # kill the emitted record's anchored threads
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _reverse_kernel_mb(
    len_ref,  # [G, B] int32
    data_ref,  # [T_chunk // r, r * G, B] uint8 (chunk nT-1-j of the stream)
    f_ref,  # [lanes, lanes] bf16 (F_bd, untransposed)
    sgm_ref,  # [C, lanes] bf16: per-channel first-position projection
    acc_ref,  # [lanes, 1] bf16
    hits_out,  # [T_chunk, C, B] int8: per-channel candidate starts
    r_s,
    *,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
):
    """Per-channel reverse scan for the multi-pattern combined automaton.

    The single-channel kernel's hit = sg @ (F @ masked) factors as
    (sg @ F) @ masked; with disjoint per-pattern position sets the row
    sg @ F = first-set indicator splits by pattern, so ONE reverse pass
    yields P candidate-start streams: hit_c = sgm_c @ masked where
    sgm_(g,p) = F[0, :] restricted to pattern p's positions in group g
    (api.MultiPattern builds sgm). Everything else matches
    _reverse_kernel_b."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    G = len_ref.shape[0]
    B = r_s.shape[1]
    acc_col = jnp.broadcast_to(acc_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((lanes, B), DTYPE)

    def body(i, _):
        iq = T_chunk // r - 1 - i
        slab = data_ref[iq]
        R = r_s[:]
        for m in reversed(range(r)):
            d = slab[m * G : (m + 1) * G]
            tg = (nT - 1 - j) * T_chunk + iq * r + m
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            masked = (R + acc_col) * b16
            hit = (
                jnp.dot(
                    sgm_ref[:], masked, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            R = jnp.dot(
                f_ref[:], masked, preferred_element_type=jnp.float32
            ).astype(DTYPE)
            hits_out[iq * r + m] = hit.astype(jnp.int8)
        r_s[:] = (R.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _span_kernel_mb(
    len_ref,  # [G, B] int32
    hits_ref,  # [T_chunk, C, B] int8: per-channel candidate-start stream
    data_ref,  # [T_chunk // r, r * G, B] uint8
    ft_ref,
    c0m_ref,  # [lanes, P] bf16: per-pattern seed columns (ft @ seed) * posm
    at_ref,  # [C, lanes]
    posm_ref,  # [lanes, P] bf16: per-pattern position-lane masks
    ev_out,  # [T_chunk, C, B] int32: span start + 1 at its emit step
    v_s,
    pos_s,  # [C, B] int32: next allowed start position per channel
    cur_s,  # [C, B] int32: active anchored start per channel (-1 idle)
    *,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    P: int,
    spec,
):
    """Multi-channel lazy span enumeration: P patterns' claim/anchor/emit
    loops run concurrently in ONE forward walk — each pattern's anchored
    threads live in its own (disjoint) position subspace of the shared
    combined automaton, so the two matmuls are shared and only the
    per-channel bookkeeping (claim, seed gate, emit, kill) multiplies by
    P. Nullable channels' outputs are garbage by design (their empty-
    match policy is closed-form host-side); callers ignore them."""
    j = pl.program_id(1)
    G = len_ref.shape[0]
    C = G * P
    B = v_s.shape[1]
    lens = len_ref[:]
    # per-channel lengths: channel (g, p) scans record g
    lensC = jnp.broadcast_to(lens[:, None, :], (G, P, B)).reshape(C, B)

    @pl.when(j == 0)
    def _init():
        v_s[:] = jnp.zeros((lanes, B), DTYPE)
        pos_s[:] = jnp.zeros((C, B), jnp.int32)
        cur_s[:] = jnp.full((C, B), -1, jnp.int32)

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m * G : (m + 1) * G]
            tg = j * T_chunk + i * r + m
            hit = hits_ref[i * r + m].astype(jnp.int32) > 0
            sp = jnp.maximum(tg - 1, 0)
            cur = cur_s[:]
            claim = (cur < 0) & hit & (sp >= pos_s[:]) & (sp <= lensC)
            cur = jnp.where(claim, sp, cur)
            gate = ((cur == tg - 1) | ((cur == 0) & (tg <= 1))) & (cur >= 0)
            gr = gate.astype(DTYPE).reshape(G, P, B)
            y = jnp.dot(
                ft_ref[:], v, preferred_element_type=jnp.float32
            ).astype(DTYPE)
            for p in range(P):
                glp = jnp.broadcast_to(
                    gr[:, p][:, None, :], (G, s_tile, B)
                ).reshape(lanes, B)
                y = y + glp * jnp.broadcast_to(
                    c0m_ref[:, p : p + 1], (lanes, B)
                )
            b16 = _bits_from_bytes(
                d, tg, lens, spec, s_tile=s_tile, G=G, B=B, dtype=DTYPE
            )
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            e = jnp.minimum(tg, lensC)
            done = fl & (cur >= 0) & (e >= cur)
            ev_out[i * r + m] = jnp.where(done, cur + 1, 0)
            pos_s[:] = jnp.where(done, jnp.maximum(e, cur + 1), pos_s[:])
            cur_s[:] = jnp.where(done, -1, cur)
            dr = done.astype(DTYPE).reshape(G, P, B)
            km = None
            for p in range(P):
                kp = jnp.broadcast_to(
                    dr[:, p][:, None, :], (G, s_tile, B)
                ).reshape(lanes, B) * jnp.broadcast_to(
                    posm_ref[:, p : p + 1], (lanes, B)
                )
                km = kp if km is None else km + kp
            v = v * (1 - km)  # kill the emitted channels' threads
        v_s[:] = v
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _sparse_match_kernel_b(
    len_ref,  # [1, B]
    data_ref,  # [T_chunk // r, r, B] uint8 (G = 1)
    pbt_ref,
    ut_ref,
    bsum_ref,
    bct_ref,  # [lanes, c_pad] (Bc^T, mask-by-matmul)
    at_ref,  # [C, lanes]
    seed_ref,
    cnt_out,
    first_out,
    last_out,
    full_out,  # [C, B]
    v_s,
    cnt_s,
    first_s,
    last_s,
    full_s,
    *,
    seeded: bool,
    nullable: bool,
    n_seed: int,
    T_chunk: int,
    r: int,
    lanes: int,
    groups,
    prow,
    cspec,
):
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    C = at_ref.shape[0]
    B = v_s.shape[1]
    nb = lanes // 128
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]
    lenc = jnp.broadcast_to(lens, (C, B)) if C > 1 else lens

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col
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
            # counts-chain seed injection (see _match_kernel_b)
            if seeded:
                v = v + seed_col
            else:
                v = jnp.where(tg < n_seed, v + seed_col, v)
            y = _sparse_expand_batched(
                v, pbt_ref, ut_ref, bsum_ref, groups, prow, nb, B
            )
            msk = _cls_mask(d, tg, lens, cspec, bct_ref, B=B)
            v = y.astype(DTYPE) * msk
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )  # [C, B]
            e = jnp.minimum(tg, lenc)
            if not (nullable and seeded):
                new = fl & (e != last_s[:])
                cnt_s[:] = cnt_s[:] + new.astype(jnp.int32)
            first_s[:] = jnp.where((first_s[:] < 0) & fl, e, first_s[:])
            last_s[:] = jnp.where(fl, e, last_s[:])
            full_s[:] = full_s[:] | (fl & (tg >= lenc)).astype(jnp.int32)
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        cnt_out[:] = cnt_s[:]
        first_out[:] = first_s[:]
        last_out[:] = last_s[:]
        full_out[:] = full_s[:]


def _sparse_flags_kernel_b(
    len_ref,
    data_ref,
    pbt_ref,
    ut_ref,
    bsum_ref,
    at_ref,
    seed_ref,
    flags_out,  # [T_chunk, C, B] int8
    v_s,
    *,
    seeded: bool,
    n_seed: int,
    T_chunk: int,
    r: int,
    lanes: int,
    groups,
    spec,
):
    j = pl.program_id(1)
    C = at_ref.shape[0]
    B = v_s.shape[1]
    nb = lanes // 128
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = seed_col

    def body(i, _):
        slab = data_ref[i]
        for m in range(r):
            d = slab[m : m + 1]
            tg = j * T_chunk + i * r + m
            v = v_s[:]
            if not seeded:
                v = jnp.where(tg < n_seed, jnp.maximum(v, seed_col), v)
            else:
                v = jnp.maximum(v, seed_col)
            bits = _bits_from_bytes(d, tg, lens, spec, s_tile=lanes, G=1, B=B)
            ys = _sparse_expand(v, pbt_ref, ut_ref, bsum_ref, groups, nb, B)
            fl_acc = jnp.zeros((C, B), jnp.float32)
            for c in range(nb):
                v2c = ((ys[c] > 0) & bits[c * 128 : (c + 1) * 128, :]).astype(
                    DTYPE
                )
                v_s[c * 128 : (c + 1) * 128, :] = v2c
                fl_acc = fl_acc + jnp.dot(
                    at_ref[:, c * 128 : (c + 1) * 128], v2c,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32)
            flags_out[i * r + m] = (fl_acc > 0).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _sparse_reverse_kernel_b(
    len_ref,
    data_ref,
    pb_ref,
    u_ref,
    bsum_ref,
    sg_ref,  # [1, lanes]
    acc_ref,  # [lanes, 1]
    hits_out,  # [T_chunk, 1, B] int8
    r_s,
    *,
    T_chunk: int,
    r: int,
    lanes: int,
    rgroups,
    spec,
):
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    B = r_s.shape[1]
    nb = lanes // 128
    acc_col = jnp.broadcast_to(acc_ref[:], (lanes, B)).astype(DTYPE)
    lens = len_ref[:]

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((lanes, B), DTYPE)

    def body(i, _):
        iq = T_chunk // r - 1 - i
        slab = data_ref[iq]
        for m in reversed(range(r)):
            d = slab[m : m + 1]
            # grid step j processes chunk nT-1-j (back-to-front walk)
            tg = (nT - 1 - j) * T_chunk + iq * r + m
            R = jnp.maximum(r_s[:], acc_col)
            bits = _bits_from_bytes(d, tg, lens, spec, s_tile=lanes, G=1, B=B)
            masked = ((R.astype(jnp.float32) > 0) & bits).astype(DTYPE)
            ys = _sparse_expand(masked, pb_ref, u_ref, bsum_ref, rgroups, nb, B)
            hit_acc = jnp.zeros((1, B), jnp.float32)
            for rb in range(nb):
                rnc = (ys[rb] > 0).astype(DTYPE)
                r_s[rb * 128 : (rb + 1) * 128, :] = rnc
                hit_acc = hit_acc + jnp.dot(
                    sg_ref[:, rb * 128 : (rb + 1) * 128], rnc,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32)
            hits_out[iq * r + m] = (hit_acc > 0).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


# ---------------------------------------------------------------------------
# Byte-path wrappers (attached to PallasScanner / SparseScanner)
# ---------------------------------------------------------------------------


def _time_major(data, G: int, L: int, T_pad: int, B_pad: int, r: int):
    """[B_rows*G, L] uint8 -> [T_pad // r, r*G, B_pad] slab layout; slab
    row m*G + g = stream step q*r + m (step 0 = BOS reads a dead row —
    overridden in-kernel)."""
    B_rows = data.shape[0] // G
    d = data.reshape(B_rows, G, L).transpose(2, 1, 0)
    d = jnp.pad(d, ((1, T_pad - L - 1), (0, 0), (0, B_pad - B_rows)))
    return d.reshape(T_pad // r, r * G, B_pad)


def _time_major_chained(
    data, G: int, L: int, K: int, T_pad: int, B_pad: int, r: int
):
    """[B_rows*G*K, L] uint8 -> [T_pad // r, r*G, B_pad] slab layout with K
    records chained per lane: record b = (row*G + g)*K + k occupies stream
    steps [k*Lp, (k+1)*Lp) of lane (g, row), Lp = L + 3 (BOS | bytes | EOS |
    dead guard; the non-byte rows read dead bytes, overridden in-kernel).
    The trailing all-dead step zeroes the state vector so no follow edge —
    not even an EOS-position's (``a$^b`` has follow($) = {^}) — can leak
    into the next segment's BOS re-seed."""
    B_rows = data.shape[0] // (G * K)
    d = data.reshape(B_rows, G, K, L).transpose(2, 3, 1, 0)  # [K, L, G, Br]
    d = jnp.pad(d, ((0, 0), (1, 2), (0, 0), (0, B_pad - B_rows)))
    d = d.reshape(K * (L + 3), G, B_pad)
    d = jnp.pad(d, ((0, T_pad - K * (L + 3)), (0, 0), (0, 0)))
    return d.reshape(T_pad // r, r * G, B_pad)


def _full_spec(shape):
    return pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _add_byte_path(cls):
    def _geom_b(
        self, L: int, B_rows: int, b_blk_max: int = B_BLK_MAX, K: int = 1
    ):
        """Byte-slab geometry. Unlike the mask-stream path (W uint32 words
        per row-step), the fused byte path carries 1 byte per record-step,
        so wide-lane tiers (multiblock) keep full-size batch blocks — the
        VMEM budget is set by the int8 slab (sublane-padded to 32 rows).
        K > 1 = short-record chaining (K Lp-step segments per lane,
        Lp = L + 3: BOS | bytes | EOS | dead guard)."""
        from ..utils.config import get_config

        cfg = get_config()
        T = L + 2 if K == 1 else K * (L + 3)
        b_cap = min(b_blk_max, cfg.b_blk_max)
        if self.lanes > 512:
            b_cap = min(b_cap, 1024)  # state vector [lanes, B] VMEM bound
        # pick B_blk so the last batch block is full (or nearly so): split
        # B_rows into ceil(B_rows / b_cap) equal blocks instead of padding
        # up to a multiple of b_cap (a 2560-row batch runs as 2x1280, not
        # 2x2048 with 37% dead columns)
        br = max(B_rows, 1)
        nb = -(-br // b_cap)
        B_blk = min(b_cap, _round_up(-(-br // nb), 128))
        B_pad = _round_up(br, B_blk)
        # deeper unroll amortizes per-step loop overhead: r=8 measured
        # +13% at 10 MB and +15% at 64 MB over the tile-minimum r=32//G
        r = cfg.slab_r or 8
        rows = max(32, r * max(self.Gp, 1))
        t_cap = max(r, STREAM_VMEM_BUDGET * r // (rows * B_blk))
        t_cap = min(_pow2_floor(t_cap), cfg.t_chunk_max, T_CHUNK_MAX)
        T_chunk = min(max(t_cap, r), max(r, _round_up(T, 8)))
        T_chunk = _round_up(T_chunk, r)
        T_pad = _round_up(T, T_chunk)
        return T, T_pad, B_pad, B_blk, T_chunk, r

    def _lenT(self, len_g, B_pad):
        B_rows = len_g.shape[0]
        return jnp.pad(
            jnp.transpose(jnp.asarray(len_g), (1, 0)),
            ((0, 0), (0, B_pad - B_rows)),
        )

    def _chain_k(self, L: int, n_rec: int) -> int:
        """Chain factor for short records (K Lp-step segments per lane):
        amortizes per-block fixed costs and batch-padding waste over a
        ~chain_target-step dependent chain. 1 = no chaining."""
        from ..utils.config import get_config

        cfg = get_config()
        Lp = L + 3
        G = max(1, self.Gp)
        C = self.at.shape[0]
        if not cfg.chain_target or Lp >= cfg.chain_target:
            return 1
        K = min(cfg.chain_target // Lp, 8, max(64 // C, 1))
        # keep enough chains per block to fill the batch lanes
        while K > 1 and n_rec < K * G * 512:
            K -= 1
        return max(K, 1)

    # -- match stats -----------------------------------------------------
    def match_stats_b(self, data, len_g, *, seeded: bool, lead: int = 0):
        """Raw bytes [B, L] + len_g [B_rows, G] -> per accept channel
        (cnt, first, last, full, any), each [B_rows, C].

        ``lead`` > 0 = windowed batch mode (engine._window_plan): each
        record is an overlapped window slice whose first ``lead`` byte
        steps only warm the state up; accepts there belong to the
        previous window and are suppressed in every stat."""
        data = jnp.asarray(data)
        L = data.shape[1]
        G = max(1, self.Gp)
        B_rows0, B = len_g.shape[0], len_g.shape[0] * G
        K = 1 if lead else self._chain_k(L, B)
        if K == 1:
            T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(L, B_rows0)
            lenT = self._lenT(len_g, B_pad)
            cnt, first, last, full = self._match_call_b(
                data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r, 1,
                lead,
            )
            tr = lambda x: jnp.transpose(x[:, :B_rows0], (1, 0))
            cnt, first, last, full = tr(cnt), tr(first), tr(last), tr(full)
            return cnt, first, last, full > 0, cnt > 0
        # chained: regroup records as [B_rows, G, K]; record b = (row*G+g)*K+k
        P = self.at.shape[0] // G
        lens_flat = jnp.asarray(len_g).reshape(-1)
        Bp = _round_up(B, G * K)
        if Bp != B:
            data = jnp.pad(data, ((0, Bp - B), (0, 0)))
            lens_flat = jnp.pad(lens_flat, (0, Bp - B))
        B_rows = Bp // (G * K)
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(L, B_rows, K=K)
        lk = lens_flat.reshape(B_rows, G, K).transpose(2, 1, 0).reshape(
            K * G, B_rows
        )
        lenT = jnp.pad(lk.astype(jnp.int32), ((0, 0), (0, B_pad - B_rows)))
        cnt, first, last, full = self._match_call_b(
            data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r, K, 0
        )

        def un(x):  # [K*C, B_pad] -> [B_rows0, G*P] in external record order
            o = x[:, :B_rows].reshape(K, G, P, B_rows).transpose(3, 1, 0, 2)
            return o.reshape(Bp, P)[:B].reshape(B_rows0, G * P)

        cnt, first, last, full = un(cnt), un(first), un(last), un(full)
        return cnt, first, last, full > 0, cnt > 0

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r",
            "K", "lead",
        ),
    )
    def _match_call_b(
        self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r, K,
        lead=0,
    ):
        G, lanes = self.Gp, self.lanes
        C = self.at.shape[0]
        if K == 1:
            tm = _time_major(data, G, L, T_pad, B_pad, r)
        else:
            tm = _time_major_chained(data, G, L, K, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _match_kernel_b,
            seeded=seeded,
            nullable=self.nullable,
            n_seed=2,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
            cspec=self.cspec,
            dks=self.diag_ks,
            K=K,
            Lp=L + 3,
            lead=lead,
        )
        fttab = self.ftd if self.diag_ks else self.ft
        gspec = pl.BlockSpec(
            (K * G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (K * C, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec(tuple(fttab.shape)),
                _full_spec((lanes, 1)),
                _full_spec(tuple(self.bct.shape)),
                _full_spec((C, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=(cspec,) * 4,
            out_shape=tuple(
                jax.ShapeDtypeStruct((K * C, B_pad), jnp.int32)
                for _ in range(4)
            ),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)]
            + [pltpu.VMEM((K * C, B_blk), jnp.int32)] * 4,
            interpret=_interpret(),
        )(lenT, tm, fttab, self.c0, self.bct, self.at, self.seed)

    # -- forward flags ---------------------------------------------------
    def forward_flags_b(self, data, len_g, *, seeded: bool):
        """[B*C//G, T+1] accept flags per channel (flag0 prepended)."""
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(
            L, B_rows, B_BLK_FLAGS
        )
        lenT = self._lenT(len_g, B_pad)
        flags = self._flags_call_b(
            data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r
        )  # [T_pad, C, B_pad]
        C = flags.shape[1]
        fl = flags[:T, :, :B_rows].transpose(2, 1, 0).reshape(B_rows * C, T)
        flag0 = jnp.full((fl.shape[0], 1), bool(self.prog.nullable), bool)
        return jnp.concatenate([flag0, fl > 0], axis=1)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _flags_call_b(self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r):
        G, lanes = self.Gp, self.lanes
        C = self.at.shape[0]
        tm = _time_major(data, G, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _flags_kernel_b,
            seeded=seeded,
            n_seed=2,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
            dks=self.diag_ks,
        )
        fttab = self.ftd if self.diag_ks else self.ft
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec(tuple(fttab.shape)),
                _full_spec((lanes, 1)),
                _full_spec((C, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, C, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, C, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(lenT, tm, fttab, self.c0, self.at, self.seed)

    # -- bit-packed flag/hit words (no [T, C, B] stream in HBM) -----------
    def _geom_words(self, L: int, B_rows: int, b_blk_max: int):
        g = self._geom_b(L, B_rows, b_blk_max)
        T, T_pad, B_pad, B_blk, T_chunk, r = g
        if 32 % r:
            return None  # unroll must divide a u32
        T_chunk = _round_up(T_chunk, 32)
        T_pad = _round_up(T, T_chunk)
        return T, T_pad, B_pad, B_blk, T_chunk, r

    def flags_words_b(self, data, len_g, *, seeded: bool):
        """([B*C//G, Wt] uint32, T): bit t of a record's words = step t's
        accept flag — the bit-packed producer behind ends_bitmap. None
        when the slab unroll doesn't divide 32 (caller falls back)."""
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        geom = self._geom_words(L, B_rows, B_BLK_FLAGS)
        if geom is None:
            return None
        T, T_pad, B_pad, B_blk, T_chunk, r = geom
        lenT = self._lenT(len_g, B_pad)
        words = self._flags_words_call_b(
            data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r
        )  # [T_pad // 32, C, B_pad]
        C = words.shape[1]
        w = (
            words[:, :, :B_rows]
            .transpose(2, 1, 0)
            .reshape(B_rows * C, T_pad // 32)
        )
        return w, T

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _flags_words_call_b(
        self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r
    ):
        G, lanes = self.Gp, self.lanes
        C = self.at.shape[0]
        tm = _time_major(data, G, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _flags_words_kernel_b,
            seeded=seeded,
            n_seed=2,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
            dks=self.diag_ks,
        )
        fttab = self.ftd if self.diag_ks else self.ft
        gspec = pl.BlockSpec(
            (G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec(tuple(fttab.shape)),
                _full_spec((lanes, 1)),
                _full_spec((C, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk // 32, C, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad // 32, C, B_pad), jnp.uint32
            ),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((C, B_blk), jnp.uint32),
            ],
            interpret=_interpret(),
        )(lenT, tm, fttab, self.c0, self.at, self.seed)

    def hits_words_b(self, data, len_g):
        """([B, Wt] uint32, T): bit t = reverse start hit at step t (the
        bit-packed producer behind starts_bitmap), or None."""
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        geom = self._geom_words(L, B_rows, B_BLK_FLAGS)
        if geom is None:
            return None
        T, T_pad, B_pad, B_blk, T_chunk, r = geom
        lenT = self._lenT(len_g, B_pad)
        words = self._hits_words_call_b(
            data, lenT, L, T_pad, B_pad, B_blk, T_chunk, r
        )
        G = max(1, self.Gp)
        w = (
            words[:, :, :B_rows]
            .transpose(2, 1, 0)
            .reshape(B_rows * G, T_pad // 32)
        )
        return w, T

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _hits_words_call_b(
        self, data, lenT, L, T_pad, B_pad, B_blk, T_chunk, r
    ):
        G, lanes = self.Gp, self.lanes
        tm = _time_major(data, G, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _reverse_words_kernel_b,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
        )
        gspec = pl.BlockSpec(
            (G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk),
            lambda i, j, nT=nT: (nT - 1 - j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec((lanes, lanes)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk // 32, G, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (T_pad // 32, G, B_pad), jnp.uint32
            ),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((G, B_blk), jnp.uint32),
            ],
            interpret=_interpret(),
        )(lenT, tm, self.f, self.sg, self.acc)

    # -- reverse hits ----------------------------------------------------
    def reverse_hits_b(self, data, len_g):
        """[B, T]: some match starts at position max(j-1, 0)."""
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(
            L, B_rows, B_BLK_FLAGS
        )
        lenT = self._lenT(len_g, B_pad)
        hits = self._reverse_call_b(
            data, lenT, L, T_pad, B_pad, B_blk, T_chunk, r
        )  # [T_pad, G, B_pad]
        G = hits.shape[1]
        h = hits[:T, :, :B_rows].transpose(2, 1, 0).reshape(B_rows * G, T)
        return h > 0

    def _reverse_pl(self, tm, lenT, T_pad, B_pad, B_blk, T_chunk, r):
        """Traced reverse pallas_call from an already time-major array."""
        G, lanes = self.Gp, self.lanes
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _reverse_kernel_b,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
        )
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk),
            lambda i, j, nT=nT: (nT - 1 - j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec,
                _full_spec((lanes, lanes)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, G, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, G, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(lenT, tm, self.f, self.sg, self.acc)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _reverse_call_b(self, data, lenT, L, T_pad, B_pad, B_blk, T_chunk, r):
        tm = _time_major(data, self.Gp, L, T_pad, B_pad, r)
        return self._reverse_pl(tm, lenT, T_pad, B_pad, B_blk, T_chunk, r)

    # -- anchored rescan (lazy first end / greedy last end) --------------
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
        end = self._anchor_call_b(
            data, lenT, startsT, longest, L, T_pad, B_pad, B_blk, T_chunk, r
        )
        return jnp.transpose(end[:, :B_rows], (1, 0))

    def _anchor_pl(
        self, tm, lenT, startsT, longest, T_pad, B_pad, B_blk, T_chunk, r
    ):
        """Traced anchored-rescan pallas_call from a time-major array."""
        G, lanes = self.Gp, self.lanes
        assert self.at.shape[0] == G, "anchored rescan is per-record"
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _anchor_end_kernel_b,
            longest=longest,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
        )
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                gspec,
                dspec,
                _full_spec((lanes, lanes)),
                _full_spec((lanes, 1)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=gspec,
            out_shape=jax.ShapeDtypeStruct((G, B_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((G, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, startsT, tm, self.ft, self.c0, self.at, self.seed)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "longest", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _anchor_call_b(
        self, data, lenT, startsT, longest, L, T_pad, B_pad, B_blk, T_chunk, r
    ):
        tm = _time_major(data, self.Gp, L, T_pad, B_pad, r)
        return self._anchor_pl(
            tm, lenT, startsT, longest, T_pad, B_pad, B_blk, T_chunk, r
        )

    # -- device-side span enumeration ------------------------------------
    def lazy_spans_b(self, data, len_g, *, cap: int):
        """Lazy non-overlapping spans, fully on device in O(1) dispatches:
        one reverse pass (candidate starts), one span pass (claim/anchor/
        emit in-kernel), one XLA compaction into fixed-capacity buffers.

        Returns (starts [B, cap], ends [B, cap], count [B]) — count is the
        exact total, so count > cap signals the caller to re-run with a
        larger cap. Non-nullable patterns only.
        """
        assert not self.nullable, "nullable lazy spans are trivial"
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(
            L, B_rows, B_BLK_SPANS
        )
        lenT = self._lenT(len_g, B_pad)
        return self._spans_call_b(
            data, lenT, cap, L, T, T_pad, B_pad, B_blk, T_chunk, r
        )

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "cap", "L", "T", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _spans_call_b(
        self, data, lenT, cap, L, T, T_pad, B_pad, B_blk, T_chunk, r
    ):
        G, lanes = self.Gp, self.lanes
        B_rows = data.shape[0] // G
        tm = _time_major(data, G, L, T_pad, B_pad, r)
        hits = self._reverse_pl(tm, lenT, T_pad, B_pad, B_blk, T_chunk, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _span_kernel_b,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
        )
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec(
            (T_chunk, G, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        ev = pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                hspec,
                dspec,
                _full_spec((lanes, lanes)),
                _full_spec((lanes, 1)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, G, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, G, B_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((G, B_blk), jnp.int32),
                pltpu.VMEM((G, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, hits, tm, self.ft, self.c0, self.at, self.seed)
        # compaction: event stream -> fixed-capacity span buffers
        Bn = B_rows * G
        ev2 = ev[:T, :, :B_rows].transpose(2, 1, 0).reshape(Bn, T)
        lens = jnp.asarray(lenT)[:, :B_rows].transpose(1, 0).reshape(Bn)
        mask = ev2 > 0
        idx = jnp.cumsum(mask, axis=1) - 1
        cnt = mask.sum(axis=1)
        kk = jnp.where(mask & (idx < cap), idx, cap)
        b = jnp.arange(Bn)[:, None]
        neg = jnp.full((Bn, cap + 1), -1, jnp.int32)
        starts = neg.at[b, kk].max(jnp.where(mask, ev2 - 1, -1))
        e_val = jnp.minimum(jnp.arange(T)[None, :], lens[:, None])
        ends = neg.at[b, kk].max(jnp.where(mask, e_val, -1))
        return starts[:, :cap], ends[:, :cap], cnt

    def set_span_channels(self, sgm: np.ndarray, posm: np.ndarray, P: int):
        """Install the per-pattern span-channel tables (api.MultiPattern):
        ``sgm`` [C, lanes] first-position projections, ``posm`` [lanes, P]
        position-lane masks. Enables lazy_spans_mb."""
        self.sgm = jnp.asarray(sgm, DTYPE)
        self.posm = jnp.asarray(posm, DTYPE)
        c0m = np.asarray(self.c0, np.float32) * np.asarray(posm, np.float32)
        self.c0m = jnp.asarray(c0m, DTYPE)
        self.spanP = P

    def lazy_spans_mb(self, data, len_g, *, cap: int):
        """Per-channel lazy spans from ONE combined scan: one channel
        reverse pass + one channel span pass + compaction, dispatch count
        independent of P (VERDICT r3 #2). Returns (starts [Bn, P, cap],
        ends [Bn, P, cap], count [Bn, P]); nullable channels' rows are
        meaningless (caller substitutes the closed-form empty-match
        spans)."""
        assert getattr(self, "spanP", None), "set_span_channels first"
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(
            L, B_rows, B_BLK_SPANS
        )
        lenT = self._lenT(len_g, B_pad)
        return self._spans_call_mb(
            data, lenT, cap, L, T, T_pad, B_pad, B_blk, T_chunk, r
        )

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "cap", "L", "T", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _spans_call_mb(
        self, data, lenT, cap, L, T, T_pad, B_pad, B_blk, T_chunk, r
    ):
        G, lanes, P = self.Gp, self.lanes, self.spanP
        C = G * P
        B_rows = data.shape[0] // G
        tm = _time_major(data, G, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        rkernel = functools.partial(
            _reverse_kernel_mb,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
        )
        gspec = pl.BlockSpec(
            (G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec_rev = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk),
            lambda i, j, nT=nT: (nT - 1 - j, 0, i),
            memory_space=pltpu.VMEM,
        )
        hits = pl.pallas_call(
            rkernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                dspec_rev,
                _full_spec((lanes, lanes)),
                _full_spec((C, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, C, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, C, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(lenT, tm, self.f, self.sgm, self.acc)
        skernel = functools.partial(
            _span_kernel_mb,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            P=P,
            spec=self.spec,
        )
        hspec = pl.BlockSpec(
            (T_chunk, C, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        ev = pl.pallas_call(
            skernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                hspec,
                dspec,
                _full_spec((lanes, lanes)),
                _full_spec((lanes, P)),
                _full_spec((C, lanes)),
                _full_spec((lanes, P)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, C, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, C, B_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((C, B_blk), jnp.int32),
                pltpu.VMEM((C, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, hits, tm, self.ft, self.c0m, self.at, self.posm)
        # compaction per (record, pattern) channel
        Bn = B_rows * G
        ev2 = (
            ev[:T, :, :B_rows]
            .reshape(T, G, P, B_rows)
            .transpose(3, 1, 2, 0)
            .reshape(Bn * P, T)
        )
        lens = jnp.asarray(lenT)[:, :B_rows].transpose(1, 0).reshape(Bn)
        lensP = jnp.repeat(lens, P)
        mask = ev2 > 0
        idx = jnp.cumsum(mask, axis=1) - 1
        cnt = mask.sum(axis=1)
        kk = jnp.where(mask & (idx < cap), idx, cap)
        b = jnp.arange(Bn * P)[:, None]
        neg = jnp.full((Bn * P, cap + 1), -1, jnp.int32)
        starts = neg.at[b, kk].max(jnp.where(mask, ev2 - 1, -1))
        e_val = jnp.minimum(jnp.arange(T)[None, :], lensP[:, None])
        ends = neg.at[b, kk].max(jnp.where(mask, e_val, -1))
        return (
            starts[:, :cap].reshape(Bn, P, cap),
            ends[:, :cap].reshape(Bn, P, cap),
            cnt.reshape(Bn, P),
        )

    def greedy_spans_b(self, data, len_g, *, cap: int):
        """Greedy (leftmost-longest) spans on device: one reverse pass for
        the candidate-start bitmap, then a lax.while_loop of anchored
        longest-end rescans — O(1) host dispatches, rounds on device.

        Returns (starts [B, cap], ends [B, cap], count [B], overflow [B]);
        overflow records still had active scans when cap was reached.
        """
        data = jnp.asarray(data)
        B_rows = len_g.shape[0]
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk, r = self._geom_b(
            L, B_rows, B_BLK_SPANS
        )
        lenT = self._lenT(len_g, B_pad)
        return self._greedy_call_b(
            data, lenT, cap, L, T, T_pad, B_pad, B_blk, T_chunk, r
        )

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "cap", "L", "T", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _greedy_call_b(
        self, data, lenT, cap, L, T, T_pad, B_pad, B_blk, T_chunk, r
    ):
        G = self.Gp
        B_rows = data.shape[0] // G
        Bn = B_rows * G
        tm = _time_major(data, G, L, T_pad, B_pad, r)
        hits = self._reverse_pl(tm, lenT, T_pad, B_pad, B_blk, T_chunk, r)
        h2 = hits[:T, :, :B_rows].transpose(2, 1, 0).reshape(Bn, T) > 0
        lens = jnp.asarray(lenT)[:, :B_rows].transpose(1, 0).reshape(Bn)
        # starts bitmap: hit at stream col j = start at max(j-1, 0)
        sbm = jnp.zeros((Bn, L + 1), bool)
        s_of_col = jnp.minimum(jnp.maximum(jnp.arange(T) - 1, 0), L)
        sbm = sbm.at[jnp.arange(Bn)[:, None], s_of_col[None, :]].max(h2)
        if self.nullable:
            sbm = sbm | (jnp.arange(L + 1)[None, :] <= lens[:, None])
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
                s.reshape(B_rows, G).transpose(1, 0),
                ((0, 0), (0, B_pad - B_rows)),
                constant_values=-1,
            )
            e = self._anchor_pl(
                tm, lenT, sT, True, T_pad, B_pad, B_blk, T_chunk, r
            )
            e = jnp.transpose(e[:, :B_rows], (1, 0)).reshape(Bn)
            if self.nullable:
                e = jnp.where(e < s, s, e)  # empty match fallback
            emit = active & (e >= s)
            kk = jnp.where(emit, ki, cap)
            bb = jnp.arange(Bn)
            sbuf = sbuf.at[bb, kk].set(jnp.where(emit, s, -1))
            ebuf = ebuf.at[bb, kk].set(jnp.where(emit, e, -1))
            pos = jnp.where(emit, jnp.maximum(e, s + 1), pos)
            ki = ki + emit.astype(jnp.int32)
            active = active & emit & (pos <= lens)
            return k + 1, pos, active, sbuf, ebuf, ki

        k0 = jnp.asarray(0, jnp.int32)
        pos0 = jnp.zeros(Bn, jnp.int32)
        act0 = jnp.ones(Bn, bool)
        st = jax.lax.while_loop(
            cond, body, (k0, pos0, act0, neg, neg, jnp.zeros(Bn, jnp.int32))
        )
        _, _, active, sbuf, ebuf, ki = st
        return sbuf[:, :cap], ebuf[:, :cap], ki, active

    cls._geom_b = _geom_b
    cls._lenT = _lenT
    cls._chain_k = _chain_k
    cls.match_stats_b = match_stats_b
    cls._match_call_b = _match_call_b
    cls.forward_flags_b = forward_flags_b
    cls._flags_call_b = _flags_call_b
    cls._geom_words = _geom_words
    cls.flags_words_b = flags_words_b
    cls._flags_words_call_b = _flags_words_call_b
    cls.hits_words_b = hits_words_b
    cls._hits_words_call_b = _hits_words_call_b
    cls.reverse_hits_b = reverse_hits_b
    cls._reverse_pl = _reverse_pl
    cls._reverse_call_b = _reverse_call_b
    cls.anchor_end_b = anchor_end_b
    cls._anchor_pl = _anchor_pl
    cls._anchor_call_b = _anchor_call_b
    cls.lazy_spans_b = lazy_spans_b
    cls._spans_call_b = _spans_call_b
    cls.set_span_channels = set_span_channels
    cls.lazy_spans_mb = lazy_spans_mb
    cls._spans_call_mb = _spans_call_mb
    cls.greedy_spans_b = greedy_spans_b
    cls._greedy_call_b = _greedy_call_b


def _add_sparse_byte_path(cls):
    """Sparse-tier overrides of the jitted byte-path calls (the wrappers
    above are inherited; only the pallas_call bodies differ)."""

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
        assert K == 1, "record chaining is a dense-tier optimization"
        assert lead == 0, "windowed batch mode is a dense-tier optimization"
        lanes = self.lanes
        C = self.at1.shape[0]
        npart = self.pb.shape[0]
        nbk = lanes // 128
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _sparse_match_kernel_b,
            seeded=seeded,
            nullable=self.nullable,
            n_seed=2,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            groups=self.groups,
            prow=self.prow_t,
            cspec=self.cspec,
        )
        gspec = pl.BlockSpec((1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((C, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
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
                _full_spec((npart, 128, 128)),
                _full_spec((nbk, nbk)),
                _full_spec((nbk, lanes)),
                _full_spec(tuple(self.bct.shape)),
                _full_spec((C, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=(cspec,) * 4,
            out_shape=tuple(
                jax.ShapeDtypeStruct((C, B_pad), jnp.int32) for _ in range(4)
            ),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)]
            + [pltpu.VMEM((C, B_blk), jnp.int32)] * 4,
            interpret=_interpret(),
        )(lenT, tm, self.pbt, self.ut, self.bsum, self.bct, self.at1, self.seed)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _flags_call_b(self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, r):
        lanes = self.lanes
        C = self.at1.shape[0]
        npart = self.pb.shape[0]
        nbk = lanes // 128
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _sparse_flags_kernel_b,
            seeded=seeded,
            n_seed=2,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            groups=self.groups,
            spec=self.spec,
        )
        gspec = pl.BlockSpec((1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
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
                _full_spec((npart, 128, 128)),
                _full_spec((nbk, nbk)),
                _full_spec((nbk, lanes)),
                _full_spec((C, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, C, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, C, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(lenT, tm, self.pbt, self.ut, self.bsum, self.at1, self.seed)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "L", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _reverse_call_b(self, data, lenT, L, T_pad, B_pad, B_blk, T_chunk, r):
        lanes = self.lanes
        npart = self.pb.shape[0]
        nbk = lanes // 128
        tm = _time_major(data, 1, L, T_pad, B_pad, r)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _sparse_reverse_kernel_b,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            rgroups=self.rgroups,
            spec=self.spec,
        )
        gspec = pl.BlockSpec((1, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
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
                _full_spec((npart, 128, 128)),
                _full_spec((nbk, nbk)),
                _full_spec((nbk, lanes)),
                _full_spec((1, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, 1, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, 1, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(lenT, tm, self.pb, self.u, self.bsum, self.sg1, self.acc_col)

    cls._match_call_b = _match_call_b
    cls._flags_call_b = _flags_call_b
    cls._reverse_call_b = _reverse_call_b
    cls._chain_k = lambda self, L, n_rec: 1  # chaining is dense-tier only


_add_byte_path(PallasScanner)
_add_sparse_byte_path(SparseScanner)


# ---------------------------------------------------------------------------
# Long-string kernels: packed scans with caller-provided initial states
# (pass 1 carries block-summary pseudo-records; pass 2 replays real blocks)
# ---------------------------------------------------------------------------


def _bits_from_bytes_g(d, tg, bosr, eosr, spec, *, s_tile: int, Q: int, B: int,
                       dtype=None):
    """[Q, B] raw bytes at scalar stream step ``tg`` with per-column GLOBAL
    stream geometry -> [Q * s_tile, B] mask bits. Unlike _bits_from_bytes
    (record-local steps: tg == 0 is always BOS), each column carries its own
    window into one long global stream:

      ``bosr[q, b]``: first byte step of the window (BOS fires exactly at
      step bosr - 1; steps before that are dead — a window starting
      mid-stream never sees a BOS, so ^-anchors cannot fire at block
      boundaries);
      ``eosr[q, b]``: the EOS step (text length in window-local steps);
      steps past it are dead.
    """
    runs, bos, eos = spec
    Wt = max(1, s_tile // 32)
    bits_n = min(32, s_tile)
    dd = d.astype(jnp.int32)
    hits = [(dd >= lo) & (dd <= hi) for (lo, hi, _) in runs]
    parts = []
    for wt in range(Wt):
        mw = jnp.zeros((Q, B), jnp.uint32)
        for h, (_, _, words) in zip(hits, runs):
            if words[wt]:
                mw = jnp.where(h, mw | jnp.uint32(words[wt]), mw)
        mw = jnp.where(
            tg < eosr, mw,
            jnp.where(tg == eosr, jnp.uint32(eos[wt]), jnp.uint32(0)),
        )
        mw = jnp.where(
            tg < bosr,
            jnp.where(tg == bosr - 1, jnp.uint32(bos[wt]), jnp.uint32(0)),
            mw,
        )
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (Q, bits_n, B), 1)
        parts.append((mw[:, None, :] >> shifts) & jnp.uint32(1))
    x = parts[0] if Wt == 1 else jnp.concatenate(parts, axis=1)
    if dtype is not None:
        return x.astype(jnp.int32).astype(dtype).reshape(Q * s_tile, B)
    return (x > 0).reshape(Q * s_tile, B)


def _carry_kernel_lb(
    v0_ref,  # [lanes, B] bf16 initial states
    gate_ref,  # [G, B] bf16: slots receiving seed injections
    bos_ref,  # [Q, B] int32 window geometry (see _bits_from_bytes_g)
    eos_ref,  # [Q, B] int32
    data_ref,  # [T_chunk // r, r * Q, B] uint8: Q byte rows per step, each
    #            broadcast to G // Q contiguous slots
    ft_ref,
    seed_ref,  # [lanes, 1]
    vout_ref,  # [lanes, B] bf16 final states
    v_s,
    *,
    seeded: bool,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
    dks=None,
):
    """Long-string carry pass, counts-chain form with in-kernel byte->mask
    encoding (no HBM mask stream). Seed injection is folded into the chain
    as a per-column constant c0g = F^T @ (gates * seed), computed once per
    grid cell — off the dependent chain, like _match_kernel_b's c0."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    B = v_s.shape[1]
    Q = bos_ref.shape[0]
    G_ = gate_ref.shape[0]
    R = G_ // Q
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    gl = jnp.broadcast_to(
        gate_ref[:][:, None, :], (G_, s_tile, B)
    ).reshape(lanes, B)
    c0g = _apply_ft(gl * seed_col, ft_ref, dks, B=B)
    zero = jnp.zeros_like(c0g)
    bosr = bos_ref[:]
    eosr = eos_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = v0_ref[:]

    def body(i, _):
        slab = data_ref[i]  # [r * Q, B]
        v = v_s[:]
        for m in range(r):
            d = slab[m * Q : (m + 1) * Q]
            tg = j * T_chunk + i * r + m
            y = _apply_ft(v, ft_ref, dks, B=B)
            if seeded:
                y = y + c0g
            else:
                y = y + jnp.where(tg < 2, c0g, zero)
            b16 = _bits_from_bytes_g(
                d, tg, bosr, eosr, spec, s_tile=s_tile, Q=Q, B=B, dtype=DTYPE
            )
            if R > 1:
                b16 = jnp.broadcast_to(
                    b16.reshape(Q, 1, s_tile, B), (Q, R, s_tile, B)
                ).reshape(lanes, B)
            v = y * b16
        # renorm: counts -> booleans once per slab (bf16-range safety)
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        vout_ref[:] = v_s[:]


def _flags_v0_kernel_lb(
    v0_ref,  # [lanes, B]
    gate_ref,  # [G, B]
    bos_ref,  # [Q, B] int32
    eos_ref,  # [Q, B] int32
    data_ref,  # [T_chunk // r, r * Q, B] uint8
    ft_ref,
    at_ref,  # [G, lanes]
    seed_ref,
    flags_out,  # [T_chunk, G, B] int8
    v_s,
    *,
    seeded: bool,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
    dks=None,
):
    """Custom-v0 forward scan emitting per-step accept flags; byte-fused
    counts-chain twin of _carry_kernel_lb."""
    j = pl.program_id(1)
    B = v_s.shape[1]
    Q = bos_ref.shape[0]
    G_ = gate_ref.shape[0]
    R = G_ // Q
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    gl = jnp.broadcast_to(
        gate_ref[:][:, None, :], (G_, s_tile, B)
    ).reshape(lanes, B)
    c0g = _apply_ft(gl * seed_col, ft_ref, dks, B=B)
    zero = jnp.zeros_like(c0g)
    bosr = bos_ref[:]
    eosr = eos_ref[:]

    @pl.when(j == 0)
    def _init():
        v_s[:] = v0_ref[:]

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m * Q : (m + 1) * Q]
            tg = j * T_chunk + i * r + m
            y = _apply_ft(v, ft_ref, dks, B=B)
            if seeded:
                y = y + c0g
            else:
                y = y + jnp.where(tg < 2, c0g, zero)
            b16 = _bits_from_bytes_g(
                d, tg, bosr, eosr, spec, s_tile=s_tile, Q=Q, B=B, dtype=DTYPE
            )
            if R > 1:
                b16 = jnp.broadcast_to(
                    b16.reshape(Q, 1, s_tile, B), (Q, R, s_tile, B)
                ).reshape(lanes, B)
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            flags_out[i * r + m] = fl.astype(jnp.int8)
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _reverse_kernel_lb(
    bos_ref,  # [G, B] int32 window geometry (see _bits_from_bytes_g)
    eos_ref,  # [G, B] int32
    data_ref,  # [T_chunk // r, r * G, B] uint8 (chunk nT-1-j of the window)
    f_ref,  # [lanes, lanes] bf16 (F_bd, untransposed)
    sg_ref,  # [G, lanes] bf16
    acc_ref,  # [lanes, 1] bf16
    hits_out,  # [T_chunk, G, B] int8
    r_s,
    *,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
):
    """Overlapped-window reverse scan (start hits) with global stream
    offsets: counts-chain twin of _reverse_kernel_b, but each window
    carries its own view into one long stream. Windows start from the
    zero reverse state; the o-step suffix overlap makes hits in the
    output region exact for bounded-horizon patterns (the reverse
    influence of anything past the window dies within ``horizon`` steps,
    ops/longstring.py)."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    G = bos_ref.shape[0]
    B = r_s.shape[1]
    acc_col = jnp.broadcast_to(acc_ref[:], (lanes, B)).astype(DTYPE)
    bosr = bos_ref[:]
    eosr = eos_ref[:]

    @pl.when(j == 0)
    def _init():
        r_s[:] = jnp.zeros((lanes, B), DTYPE)

    def body(i, _):
        iq = T_chunk // r - 1 - i
        slab = data_ref[iq]
        R = r_s[:]
        for m in reversed(range(r)):
            d = slab[m * G : (m + 1) * G]
            tg = (nT - 1 - j) * T_chunk + iq * r + m
            b16 = _bits_from_bytes_g(
                d, tg, bosr, eosr, spec, s_tile=s_tile, Q=G, B=B, dtype=DTYPE
            )
            masked = (R + acc_col) * b16
            R = jnp.dot(
                f_ref[:], masked, preferred_element_type=jnp.float32
            ).astype(DTYPE)
            hit = (
                jnp.dot(
                    sg_ref[:], R, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            hits_out[iq * r + m] = hit.astype(jnp.int8)
        r_s[:] = (R.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)


def _count_v0_kernel_lb(
    v0_ref,  # [lanes, B]
    gate_ref,  # [G, B]
    bos_ref,  # [Q, B] int32
    eos_ref,  # [Q, B] int32
    data_ref,  # [T_chunk // r, r * Q, B] uint8
    ft_ref,
    at_ref,  # [G, lanes]
    seed_ref,
    cnt_out,  # [G, B] int32: accept steps with global byte index < n
    tail_out,  # [G, B] int32: any accept at the EOS-side steps (n, n+1)
    v_s,
    cnt_s,
    tail_s,
    *,
    seeded: bool,
    T_chunk: int,
    r: int,
    lanes: int,
    s_tile: int,
    spec,
    out_lo: int,
    out_hi: int,
    dks=None,
):
    """Window-reduced twin of _flags_v0_kernel_lb: instead of writing the
    [T, G, B] flag stream to HBM (1 byte out per byte in), accumulate the
    scalar statistics in VMEM. Each window owns the output step range
    [out_lo, out_hi) (windows tile the global stream exactly, so every
    global step is counted by exactly one window); body steps are those
    with global byte index < n (i.e. t < eosr - 1), EOS-side accepts
    (global n / n+1) are OR-accumulated separately and merged host-side —
    the same (body, tail) split as FastLongScanner._tail."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    B = v_s.shape[1]
    Q = bos_ref.shape[0]
    G_ = gate_ref.shape[0]
    R = G_ // Q
    seed_col = jnp.broadcast_to(seed_ref[:], (lanes, B)).astype(DTYPE)
    gl = jnp.broadcast_to(
        gate_ref[:][:, None, :], (G_, s_tile, B)
    ).reshape(lanes, B)
    c0g = _apply_ft(gl * seed_col, ft_ref, dks, B=B)
    zero = jnp.zeros_like(c0g)
    bosr = bos_ref[:]
    eosr = eos_ref[:]
    eosl = jnp.broadcast_to(
        eosr[:, None, :], (Q, R, B)
    ).reshape(G_, B)

    @pl.when(j == 0)
    def _init():
        v_s[:] = v0_ref[:]
        cnt_s[:] = jnp.zeros((G_, B), jnp.int32)
        tail_s[:] = jnp.zeros((G_, B), jnp.int32)

    def body(i, _):
        slab = data_ref[i]
        v = v_s[:]
        for m in range(r):
            d = slab[m * Q : (m + 1) * Q]
            tg = j * T_chunk + i * r + m
            y = _apply_ft(v, ft_ref, dks, B=B)
            if seeded:
                y = y + c0g
            else:
                y = y + jnp.where(tg < 2, c0g, zero)
            b16 = _bits_from_bytes_g(
                d, tg, bosr, eosr, spec, s_tile=s_tile, Q=Q, B=B, dtype=DTYPE
            )
            if R > 1:
                b16 = jnp.broadcast_to(
                    b16.reshape(Q, 1, s_tile, B), (Q, R, s_tile, B)
                ).reshape(lanes, B)
            v = y * b16
            fl = (
                jnp.dot(
                    at_ref[:], v, preferred_element_type=jnp.float32
                ).astype(jnp.float32)
                > 0
            )
            win = (tg >= out_lo) & (tg < out_hi)
            cnt_s[:] = cnt_s[:] + (
                fl & win & (tg < eosl - 1)
            ).astype(jnp.int32)
            tail_s[:] = tail_s[:] | (
                fl & win & ((tg == eosl - 1) | (tg == eosl))
            ).astype(jnp.int32)
        v_s[:] = (v.astype(jnp.float32) > 0).astype(DTYPE)
        return 0

    jax.lax.fori_loop(0, T_chunk // r, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        cnt_out[:] = cnt_s[:]
        tail_out[:] = tail_s[:]


def _count_v0_final_kernel_lb(
    v0_ref, gate_ref, bos_ref, eos_ref, data_ref, ft_ref, at_ref, seed_ref,
    cnt_out, tail_out, vf_out,  # vf_out [lanes, B]: final reachable set
    v_s, cnt_s, tail_s,
    **kw,
):
    """_count_v0_kernel_lb + the window's FINAL state vector as a third
    output — the speculative long-string mode validates its guessed
    entries against these exits (exit_w must equal entry_{w+1})."""
    _count_v0_kernel_lb(
        v0_ref, gate_ref, bos_ref, eos_ref, data_ref, ft_ref, at_ref,
        seed_ref, cnt_out, tail_out, v_s, cnt_s, tail_s, **kw,
    )
    j = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(j == nT - 1)
    def _vf():
        vf_out[:] = v_s[:]


def _add_longstring_calls(cls):
    """Attach the custom-v0, global-offset entry points used by the
    long-string mode (ops/longstring.py FastLongScanner)."""

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk", "r", "Q"
        ),
    )
    def _carry_call_b(
        self, data_tm, v0, gates, bosr, eosr, seeded,
        T_pad, B_pad, B_blk, T_chunk, r, Q,
    ):
        G, lanes = self.Gp, self.lanes
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _carry_kernel_lb,
            seeded=seeded,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
            dks=self.diag_ks,
        )
        fttab = self.ftd if self.diag_ks else self.ft
        lspec = pl.BlockSpec((lanes, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        qspec = pl.BlockSpec((Q, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * Q, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                lspec, gspec, qspec, qspec, dspec,
                _full_spec(tuple(fttab.shape)),
                _full_spec((lanes, 1)),
            ],
            out_specs=lspec,
            out_shape=jax.ShapeDtypeStruct((lanes, B_pad), DTYPE),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(v0, gates, bosr, eosr, data_tm, fttab, self.seed)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk", "r", "Q"
        ),
    )
    def _flags_v0_call_b(
        self, data_tm, v0, gates, bosr, eosr, seeded,
        T_pad, B_pad, B_blk, T_chunk, r, Q,
    ):
        G, lanes = self.Gp, self.lanes
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _flags_v0_kernel_lb,
            seeded=seeded,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
            dks=self.diag_ks,
        )
        fttab = self.ftd if self.diag_ks else self.ft
        lspec = pl.BlockSpec((lanes, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        qspec = pl.BlockSpec((Q, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * Q, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                lspec, gspec, qspec, qspec, dspec,
                _full_spec(tuple(fttab.shape)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, G, B_blk), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, G, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(v0, gates, bosr, eosr, data_tm, fttab, self.at, self.seed)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk", "r", "Q",
            "out_lo", "out_hi",
        ),
    )
    def _count_v0_call_b(
        self, data_tm, v0, gates, bosr, eosr, seeded,
        T_pad, B_pad, B_blk, T_chunk, r, Q, out_lo, out_hi,
    ):
        G, lanes = self.Gp, self.lanes
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _count_v0_kernel_lb,
            seeded=seeded,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
            out_lo=out_lo,
            out_hi=out_hi,
            dks=self.diag_ks,
        )
        fttab = self.ftd if self.diag_ks else self.ft
        lspec = pl.BlockSpec((lanes, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        qspec = pl.BlockSpec((Q, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * Q, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                lspec, gspec, qspec, qspec, dspec,
                _full_spec(tuple(fttab.shape)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=(gspec, gspec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((G, B_pad), jnp.int32) for _ in range(2)
            ),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((G, B_blk), jnp.int32),
                pltpu.VMEM((G, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(v0, gates, bosr, eosr, data_tm, fttab, self.at, self.seed)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "T_pad", "B_pad", "B_blk", "T_chunk", "r"
        ),
    )
    def _rev_call_b(
        self, data_tm, bosr, eosr, T_pad, B_pad, B_blk, T_chunk, r
    ):
        G, lanes = self.Gp, self.lanes
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _reverse_kernel_lb,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
        )
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * G, B_blk),
            lambda i, j, nT=nT: (nT - 1 - j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                gspec,
                gspec,
                dspec,
                _full_spec((lanes, lanes)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=pl.BlockSpec(
                (T_chunk, G, B_blk),
                lambda i, j, nT=nT: (nT - 1 - j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T_pad, G, B_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((lanes, B_blk), DTYPE)],
            interpret=_interpret(),
        )(bosr, eosr, data_tm, self.f, self.sg, self.acc)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "T_pad", "B_pad", "B_blk", "T_chunk", "r", "Q",
            "out_lo", "out_hi",
        ),
    )
    def _count_v0f_call_b(
        self, data_tm, v0, gates, bosr, eosr, seeded,
        T_pad, B_pad, B_blk, T_chunk, r, Q, out_lo, out_hi,
    ):
        """_count_v0_call_b variant that also returns each window's final
        state [lanes, B_pad] (speculative-mode exit validation)."""
        G, lanes = self.Gp, self.lanes
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _count_v0_final_kernel_lb,
            seeded=seeded,
            T_chunk=T_chunk,
            r=r,
            lanes=lanes,
            s_tile=self.prog.s_tile,
            spec=self.spec,
            out_lo=out_lo,
            out_hi=out_hi,
            dks=self.diag_ks,
        )
        fttab = self.ftd if self.diag_ks else self.ft
        lspec = pl.BlockSpec((lanes, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((G, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        qspec = pl.BlockSpec((Q, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (T_chunk // r, r * Q, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[
                lspec, gspec, qspec, qspec, dspec,
                _full_spec(tuple(fttab.shape)),
                _full_spec((G, lanes)),
                _full_spec((lanes, 1)),
            ],
            out_specs=(gspec, gspec, lspec),
            out_shape=(
                jax.ShapeDtypeStruct((G, B_pad), jnp.int32),
                jax.ShapeDtypeStruct((G, B_pad), jnp.int32),
                jax.ShapeDtypeStruct((lanes, B_pad), DTYPE),
            ),
            scratch_shapes=[
                pltpu.VMEM((lanes, B_blk), DTYPE),
                pltpu.VMEM((G, B_blk), jnp.int32),
                pltpu.VMEM((G, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(v0, gates, bosr, eosr, data_tm, fttab, self.at, self.seed)

    cls._carry_call_b = _carry_call_b
    cls._flags_v0_call_b = _flags_v0_call_b
    cls._count_v0_call_b = _count_v0_call_b
    cls._count_v0f_call_b = _count_v0f_call_b
    cls._rev_call_b = _rev_call_b


_add_longstring_calls(PallasScanner)


# ---------------------------------------------------------------------------
# Counting tier: single-class bounded repetition X{m,n}
# ---------------------------------------------------------------------------


def counting_plan(prog: DeviceProgram):
    """Detect ``X{m,n}`` where X is a fixed-length body — a sequence of
    symbol classes (``a{3,1200}``, ``(ab){2,600}``, ``([a-c][0-9]){4,}``)
    or an alternation of equal-length such sequences
    (``(ab|cd){1,400}``) — and return the run-length plan
    ``(m, n_or_0, branches)``: branches is a tuple of R <= 4 branch
    bodies, each a tuple of per-position byte-run tuples, all the same
    length k <= 8. Returns None when the pattern has another shape.

    The Glushkov follow matrix of such patterns is a dense triangle
    (every repetition past the m-th is optional, so each position follows
    all earlier ones), which forces a lanes^2 matmul per byte on the
    matrix tiers — the family the reference's Roaring tier exists for
    (Parser.cpp:165-168, regex.h:34). But because every body copy has
    fixed length k, the reachable state sets are suffix intervals and the
    whole subset simulation collapses to one integer per record: the
    number of consecutive body copies ending at the cursor (a run-length
    recurrence at stride k), with accept iff run >= m. Body occurrence is
    tracked with R*(k-1) rolling per-branch prefix-progress bits — no
    follow matmul. (For X{m,n} with a fixed-length body, any chain of
    r >= m consecutive copies ending at e contains a min(r, n)-copy
    suffix chain, so the n bound never changes the seeded ends set —
    only the anchored/unseeded gates use it.)"""
    from ..compiler.parser import BOS, EOS, Alt, Concat, Lit, Repeat, parse

    try:
        node = parse(prog.pattern)
    except Exception:
        return None
    while isinstance(node, Concat) and len(node.parts) == 1:
        node = node.parts[0]
    if not isinstance(node, Repeat):
        return None
    child = node.child
    while isinstance(child, Concat) and len(child.parts) == 1:
        child = child.parts[0]
    alts = list(child.parts) if isinstance(child, Alt) else [child]
    if not 1 <= len(alts) <= 4:
        return None

    def branch_body(b):
        while isinstance(b, Concat) and len(b.parts) == 1:
            b = b.parts[0]
        parts = list(b.parts) if isinstance(b, Concat) else [b]
        if not 1 <= len(parts) <= 8:
            return None
        body = []
        for p in parts:
            while isinstance(p, Concat) and len(p.parts) == 1:
                p = p.parts[0]
            if not isinstance(p, Lit):
                return None
            syms = p.syms
            if BOS in syms or EOS in syms:
                return None
            bs = sorted(syms)
            runs = []
            lo = prev = bs[0]
            for b2 in bs[1:]:
                if b2 == prev + 1:
                    prev = b2
                else:
                    runs.append((lo, prev))
                    lo = prev = b2
            runs.append((lo, prev))
            body.append(tuple(runs))
        return tuple(body)

    branches = []
    for a in alts:
        bb = branch_body(a)
        if bb is None:
            return None
        branches.append(bb)
    k = len(branches[0])
    if any(len(b) != k for b in branches[1:]):
        return None  # unequal branch lengths: stride-k chain breaks
    branches = tuple(dict.fromkeys(branches))  # dedup identical branches
    if k == 1:
        # single-position branches are one merged class (OR of runs)
        branches = (tuple(r for b in branches for r in b[0]),)
        branches = ((branches[0],),)
    n = 0 if node.hi is None else int(node.hi)
    return int(node.lo), n, branches


def _in_class(d, runs):
    x = None
    for lo, hi in runs:
        t = (d >= lo) & (d <= hi)
        x = t if x is None else (x | t)
    return x


def _count_step(rb_s, pb_s, hits, GC, k, cap):
    """Shared stride-k run-length step: body-occurrence from rolling
    per-branch prefix-progress bits, run from the k-lagged buffer.
    ``hits[r][q]`` = byte matches branch r's position-q class. Returns
    (occ, run) and rotates both buffers. pb_s layout is branch-major:
    branch r's bits p_1..p_{k-1} live at rows [r*(k-1)*GC, (r+1)*(k-1)*GC)."""
    R = len(hits)
    if k == 1:
        occ = hits[0][0]
        for br in range(1, R):
            occ = occ | hits[br][0]
        r_lag = rb_s[:]
    else:
        pb = pb_s[:]  # per-branch p_1..p_{k-1} of the previous step
        occ = None
        new_p = []
        for br in range(R):
            base = br * (k - 1) * GC
            o = (
                pb[base + (k - 2) * GC : base + (k - 1) * GC] > 0
            ) & hits[br][k - 1]
            occ = o if occ is None else (occ | o)
            new_p.append(hits[br][0].astype(jnp.int32))
            for q in range(2, k):
                new_p.append(
                    (
                        (pb[base + (q - 2) * GC : base + (q - 1) * GC] > 0)
                        & hits[br][q - 1]
                    ).astype(jnp.int32)
                )
        pb_s[:] = jnp.concatenate(new_p, axis=0)
        r_lag = rb_s[0:GC]  # r[tg - k]
    r = jnp.where(occ, jnp.minimum(r_lag + 1, cap), 0)
    if k == 1:
        rb_s[:] = r
    else:
        rb_s[:] = jnp.concatenate([rb_s[GC:], r], axis=0)
    return occ, r


def _count_unseeded_fl(ab_s, occ, tg, lens, GC, k, mm, n):
    """Shared unseeded (anchored-prefix) accept flag: rotates the
    anchored-run lag buffer and applies the all-copies-from-BOS gates."""
    ap_lag = ab_s[0:GC] if k > 1 else ab_s[:]
    ap = jnp.where(
        tg < 1,
        jnp.ones_like(ap_lag),
        jnp.where(occ, ap_lag, 0),
    )
    if k == 1:
        # dead tail passes through (matches the matrix tiers' frozen
        # post-EOS state; values past lens are never read)
        ap = jnp.where(tg > lens, ap_lag, ap)
        ab_s[:] = ap
    else:
        ab_s[:] = jnp.concatenate([ab_s[GC:], ap], axis=0)
    fl = (ap > 0) & (tg >= mm * k) & (tg <= lens)
    if k > 1:
        fl = fl & (tg % k == 0)
    if n:
        fl = fl & (tg <= n * k)
    return fl


def _count_match_kernel(
    len_ref,  # [GC, B] int32
    data_ref,  # [T_chunk, GC, B] uint8
    cnt_out,
    first_out,
    last_out,
    full_out,  # [GC, B] int32
    rb_s,  # [k*GC, B] int32: last k body-run lengths (stride-k lag buffer)
    ab_s,  # [k*GC, B] int32: last k anchored-prefix flags (unseeded runs)
    pb_s,  # [max(k-1,1)*GC, B] int32: body prefix-progress bits p_1..p_{k-1}
    cnt_s,
    first_s,
    last_s,
    full_s,
    *,
    seeded: bool,
    nullable: bool,
    m: int,
    n: int,
    body_runs,
    T_chunk: int,
    lead: int = 0,
):
    """Counting-tier scan: per-step state is one int32 run length per
    record — r' = occ(body ends here) ? min(r[t-k]+1, cap) : 0, accept iff
    r >= m, where k = len(body). Body occurrence is tracked with k-1
    rolling prefix bits; for k == 1 this degenerates to the single-class
    X-run recurrence. Stats accumulation mirrors _match_kernel_b.

    ``lead``: ignore accepts at tg <= lead — the overlapped-window gate of
    the one-long-string mode (CountLongScanner): each window re-scans
    ``lead`` = m*k context bytes owned by the previous window, which is
    the exact horizon of the seeded accept test."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    lens = len_ref[:]
    GC = lens.shape[0]
    k = len(body_runs[0])
    R = len(body_runs)
    mm = max(m, 1)
    cap = n if n else mm

    @pl.when(j == 0)
    def _init():
        rb_s[:] = jnp.zeros(rb_s.shape, rb_s.dtype)
        ab_s[:] = jnp.ones(ab_s.shape, ab_s.dtype)
        pb_s[:] = jnp.zeros(pb_s.shape, pb_s.dtype)
        if nullable:
            if seeded:
                cnt_s[:] = lens + 1
                last_s[:] = lens
            else:
                cnt_s[:] = jnp.ones_like(lens)
                last_s[:] = jnp.zeros_like(lens)
            first_s[:] = jnp.zeros_like(lens)
        else:
            cnt_s[:] = jnp.zeros_like(lens)
            first_s[:] = jnp.full_like(lens, -1)
            last_s[:] = jnp.full_like(lens, -1)
        full_s[:] = (
            (lens == 0).astype(jnp.int32) if nullable else jnp.zeros_like(lens)
        )

    from ..utils.config import get_config

    # slab-composed run-length stepping (k == 1): the recurrence
    # r' = occ ? min(r + 1, cap) : 0 telescopes across an 8-byte slab —
    # r_m = min(all-prefix_m ? r_in + m + 1 : trailing-run_m, cap) with
    # both scans computed OFF the carry chain — and the stats
    # accumulators reduce per slab (running-last select chain, min/max/or
    # trees). Measured SLOWER than per-byte stepping on TPU (config 4:
    # 49.1 -> 32.5 GB/s): Mosaic already software-pipelines the per-byte
    # chain across loop iterations, and the slab form's extra within-slab
    # scans cost more issue slots than the chain links they remove. Kept
    # behind RRX_COUNT_SLAB=1 as the measured A/B (see config.count_slab).
    slab8 = k == 1 and T_chunk % 8 == 0 and get_config().count_slab

    def body8(i, _):
        d8 = data_ref[pl.ds(i * 8, 8)].astype(jnp.int32)  # [8, GC, B]
        base = j * T_chunk + i * 8
        rc = rb_s[:]
        occs = []
        for m in range(8):
            tg = base + m
            valid = (tg >= 1) & (tg <= lens)
            occs.append(_in_class(d8[m], body_runs[0][0]) & valid)
        fls = []
        es = []
        a = None  # all-prefix of occ
        tr = None  # within-slab trailing run
        pe = None  # prefix of occ-or-dead (unseeded anchored run)
        apc = (ab_s[:] > 0) if not seeded else None
        for m in range(8):
            tg = base + m
            a = occs[m] if a is None else (a & occs[m])
            tr = jnp.where(
                occs[m],
                (tr + 1) if tr is not None else jnp.ones_like(lens),
                0,
            )
            rm = jnp.minimum(jnp.where(a, rc + (m + 1), tr), cap)
            if seeded:
                fl = rm >= mm
            else:
                oe = occs[m] | (tg < 1) | (tg > lens)
                pe = oe if pe is None else (pe & oe)
                fl = apc & pe & (tg >= mm) & (tg <= lens)
                if n:
                    fl = fl & (tg <= n)
            if lead:
                fl = fl & (tg > lead)
            fls.append(fl)
            es.append(jnp.minimum(tg, lens))
        rb_s[:] = jnp.minimum(jnp.where(a, rc + 8, tr), cap)
        if not seeded:
            ab_s[:] = (apc & pe).astype(jnp.int32)
        if not (nullable and seeded):
            Lrun = last_s[:]
            newsum = None
            for m in range(8):
                new = (fls[m] & (es[m] != Lrun)).astype(jnp.int32)
                newsum = new if newsum is None else newsum + new
                Lrun = jnp.where(fls[m], es[m], Lrun)
            cnt_s[:] = cnt_s[:] + newsum
        fe = le = fullm = None
        for m in range(8):
            fe_m = jnp.where(fls[m], es[m], 1 << 30)
            fe = fe_m if fe is None else jnp.minimum(fe, fe_m)
            le_m = jnp.where(fls[m], es[m], -1)
            le = le_m if le is None else jnp.maximum(le, le_m)
            fm = fls[m] & (base + m >= lens)
            fullm = fm if fullm is None else (fullm | fm)
        first_s[:] = jnp.where(
            (first_s[:] < 0) & (fe < (1 << 30)), fe, first_s[:]
        )
        last_s[:] = jnp.where(le >= 0, le, last_s[:])
        full_s[:] = full_s[:] | fullm.astype(jnp.int32)
        return 0

    def body(i, _):
        d = data_ref[i].astype(jnp.int32)  # [GC, B]
        tg = j * T_chunk + i
        valid = (tg >= 1) & (tg <= lens)
        hits = [
            [_in_class(d, br[q]) & valid for q in range(k)]
            for br in body_runs
        ]
        occ, r = _count_step(rb_s, pb_s, hits, GC, k, cap)
        if seeded:
            fl = r >= mm
        else:
            fl = _count_unseeded_fl(ab_s, occ, tg, lens, GC, k, mm, n)
        if lead:
            fl = fl & (tg > lead)
        e = jnp.minimum(tg, lens)
        if not (nullable and seeded):
            new = fl & (e != last_s[:])
            cnt_s[:] = cnt_s[:] + new.astype(jnp.int32)
        first_s[:] = jnp.where((first_s[:] < 0) & fl, e, first_s[:])
        last_s[:] = jnp.where(fl, e, last_s[:])
        full_s[:] = full_s[:] | (fl & (tg >= lens)).astype(jnp.int32)
        return 0

    if slab8:
        jax.lax.fori_loop(0, T_chunk // 8, body8, 0)
    else:
        jax.lax.fori_loop(0, T_chunk, body, 0)

    @pl.when(j == nT - 1)
    def _out():
        cnt_out[:] = cnt_s[:]
        first_out[:] = first_s[:]
        last_out[:] = last_s[:]
        full_out[:] = full_s[:]


def _count_flags_kernel(
    len_ref,
    data_ref,
    flags_out,  # [T_chunk, GC, B] int8
    rb_s,
    ab_s,
    pb_s,
    *,
    seeded: bool,
    m: int,
    n: int,
    body_runs,
    T_chunk: int,
):
    j = pl.program_id(1)
    lens = len_ref[:]
    GC = lens.shape[0]
    k = len(body_runs[0])
    R = len(body_runs)
    mm = max(m, 1)
    cap = n if n else mm

    @pl.when(j == 0)
    def _init():
        rb_s[:] = jnp.zeros(rb_s.shape, rb_s.dtype)
        ab_s[:] = jnp.ones(ab_s.shape, ab_s.dtype)
        pb_s[:] = jnp.zeros(pb_s.shape, pb_s.dtype)

    from ..utils.config import get_config

    # slab-composed run-length stepping for k == 1 (see
    # _count_match_kernel): within-slab prefix/trailing-run scans off
    # the carry chain, one carry update per 8 bytes
    slab8 = k == 1 and T_chunk % 8 == 0 and get_config().count_slab

    def body8(i, _):
        d8 = data_ref[pl.ds(i * 8, 8)].astype(jnp.int32)
        base = j * T_chunk + i * 8
        rc = rb_s[:]
        fls = []
        a = tr = pe = None
        apc = (ab_s[:] > 0) if not seeded else None
        for m in range(8):
            tg = base + m
            valid = (tg >= 1) & (tg <= lens)
            occ = _in_class(d8[m], body_runs[0][0]) & valid
            a = occ if a is None else (a & occ)
            tr = jnp.where(
                occ, (tr + 1) if tr is not None else jnp.ones_like(lens), 0
            )
            rm = jnp.minimum(jnp.where(a, rc + (m + 1), tr), cap)
            if seeded:
                fl = rm >= mm
            else:
                oe = occ | (tg < 1) | (tg > lens)
                pe = oe if pe is None else (pe & oe)
                fl = apc & pe & (tg >= mm) & (tg <= lens)
                if n:
                    fl = fl & (tg <= n)
            fls.append(fl.astype(jnp.int8))
        rb_s[:] = jnp.minimum(jnp.where(a, rc + 8, tr), cap)
        if not seeded:
            ab_s[:] = (apc & pe).astype(jnp.int32)
        flags_out[pl.ds(i * 8, 8)] = jnp.stack(fls)
        return 0

    def body(i, _):
        d = data_ref[i].astype(jnp.int32)
        tg = j * T_chunk + i
        valid = (tg >= 1) & (tg <= lens)
        hits = [
            [_in_class(d, br[q]) & valid for q in range(k)]
            for br in body_runs
        ]
        occ, r = _count_step(rb_s, pb_s, hits, GC, k, cap)
        if seeded:
            fl = r >= mm
        else:
            fl = _count_unseeded_fl(ab_s, occ, tg, lens, GC, k, mm, n)
        flags_out[i] = fl.astype(jnp.int8)
        return 0

    if slab8:
        jax.lax.fori_loop(0, T_chunk // 8, body8, 0)
    else:
        jax.lax.fori_loop(0, T_chunk, body, 0)


def _count_reverse_kernel(
    len_ref,
    data_ref,  # chunk nT-1-j of the stream
    hits_out,  # [T_chunk, GC, B] int8
    rb_s,  # [k*GC, B]: next k suffix run lengths (r_rev[tg .. tg+k-1])
    pb_s,  # [max(k-1,1)*GC, B]: body suffix-progress bits q_1..q_{k-1}
    *,
    m: int,
    body_runs,
    T_chunk: int,
):
    """Backward pass: r_rev[tg] = #consecutive body copies STARTING at
    stream step tg (match-start candidates); hit iff r_rev >= m."""
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    lens = len_ref[:]
    GC = lens.shape[0]
    k = len(body_runs[0])
    R = len(body_runs)
    mm = max(m, 1)

    @pl.when(j == 0)
    def _init():
        rb_s[:] = jnp.zeros(rb_s.shape, rb_s.dtype)
        pb_s[:] = jnp.zeros(pb_s.shape, pb_s.dtype)

    def body(i, _):
        iq = T_chunk - 1 - i
        d = data_ref[iq].astype(jnp.int32)
        tg = (nT - 1 - j) * T_chunk + iq
        valid = (tg >= 1) & (tg <= lens)
        hits = [
            [_in_class(d, br[q]) & valid for q in range(k)]
            for br in body_runs
        ]
        if k == 1:
            occ = hits[0][0]
            for br in range(1, R):
                occ = occ | hits[br][0]
            r_lag = rb_s[:]
        else:
            pb = pb_s[:]  # per-branch q_1..q_{k-1} of step tg+1
            occ = None
            new_q = []
            for br in range(R):
                base = br * (k - 1) * GC
                o = hits[br][0] & (
                    pb[base + (k - 2) * GC : base + (k - 1) * GC] > 0
                )
                occ = o if occ is None else (occ | o)
                new_q.append(hits[br][k - 1].astype(jnp.int32))
                for q in range(2, k):
                    new_q.append(
                        (
                            hits[br][k - q]
                            & (pb[base + (q - 2) * GC : base + (q - 1) * GC] > 0)
                        ).astype(jnp.int32)
                    )
            pb_s[:] = jnp.concatenate(new_q, axis=0)
            r_lag = rb_s[(k - 1) * GC :]  # r_rev[tg + k]
        r = jnp.where(occ, jnp.minimum(r_lag + 1, mm), 0)
        if k == 1:
            rb_s[:] = r
        else:
            rb_s[:] = jnp.concatenate([r, rb_s[: (k - 1) * GC]], axis=0)
        hits_out[iq] = (r >= mm).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, T_chunk, body, 0)


class CountScanner:
    """Run-length scanner for fixed-length-body ``X{m,n}`` — single
    classes (``a{3,1200}``) and k-class bodies (``(ab){2,600}``) alike
    (see counting_plan). Packs
    GC = 32 records per sublane row (the int8 slab tile height), so each
    kernel step consumes 32 * B_blk corpus bytes with a handful of int32
    VPU ops — no follow matmul at all. Anchored-rescan / span kernels
    fall back to the packed/XLA paths (``has_anchor = False``)."""

    has_anchor = False
    GC = 32

    def __init__(self, prog: DeviceProgram, plan, nullable: "bool | None" = None):
        self.prog = prog
        self.m, self.n, self.body = plan  # body = R branch bodies
        self.k = len(self.body[0])
        self.R = len(self.body)
        self.nullable = prog.nullable if nullable is None else nullable

    # -- geometry ----------------------------------------------------------
    def _geom(self, L: int, B_rows: int):
        from ..utils.config import get_config

        cfg = get_config()
        T = L + 2
        b_cap = min(B_BLK_MAX, cfg.b_blk_max)
        B_blk = min(b_cap, _round_up(max(B_rows, 1), 128))
        B_pad = _round_up(max(B_rows, 1), B_blk)
        t_cap = max(8, STREAM_VMEM_BUDGET // (self.GC * B_blk))
        T_chunk = min(_pow2_floor(t_cap), cfg.t_chunk_max, T_CHUNK_MAX)
        T_chunk = min(T_chunk, max(8, _round_up(T, 8)))
        T_pad = _round_up(T, T_chunk)
        return T, T_pad, B_pad, B_blk, T_chunk

    def _pack32(self, data, len_g):
        B = len_g.shape[0] * len_g.shape[1]
        lens = jnp.asarray(len_g).reshape(-1)
        Bp = _round_up(max(B, 1), self.GC)
        data = jnp.pad(jnp.asarray(data), ((0, Bp - B), (0, 0)))
        lens = jnp.pad(lens, (0, Bp - B))
        return data, lens.reshape(Bp // self.GC, self.GC), Bp // self.GC, B

    def _lenT(self, lg, B_pad):
        B_rows = lg.shape[0]
        return jnp.pad(
            jnp.transpose(lg, (1, 0)), ((0, 0), (0, B_pad - B_rows))
        )

    # -- match stats -------------------------------------------------------
    def match_stats_b(self, data, len_g, *, seeded: bool, lead: int = 0):
        data, lg, B_rows, B = self._pack32(data, len_g)
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk = self._geom(L, B_rows)
        lenT = self._lenT(lg, B_pad)
        cnt, first, last, full = self._match_call(
            data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, lead
        )
        sl = lambda x: (
            jnp.transpose(x[:, :B_rows], (1, 0)).reshape(-1)[:B].reshape(B, 1)
        )
        cnt, first, last, full = sl(cnt), sl(first), sl(last), sl(full)
        return cnt, first, last, full > 0, cnt > 0

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk",
            "lead",
        ),
    )
    def _match_call(
        self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk, lead=0
    ):
        GC = self.GC
        tm = _time_major(data, GC, L, T_pad, B_pad, 1)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _count_match_kernel,
            seeded=seeded,
            nullable=self.nullable,
            m=self.m,
            n=self.n,
            body_runs=self.body,
            T_chunk=T_chunk,
            lead=lead,
        )
        gspec = pl.BlockSpec(
            (GC, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk, GC, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[gspec, dspec],
            out_specs=(gspec,) * 4,
            out_shape=tuple(
                jax.ShapeDtypeStruct((GC, B_pad), jnp.int32) for _ in range(4)
            ),
            scratch_shapes=[
                pltpu.VMEM((self.k * GC, B_blk), jnp.int32),  # rb
                pltpu.VMEM((self.k * GC, B_blk), jnp.int32),  # ab
                pltpu.VMEM((max(self.R * (self.k - 1), 1) * GC, B_blk), jnp.int32),  # pb
            ]
            + [pltpu.VMEM((GC, B_blk), jnp.int32)] * 4,
            interpret=_interpret(),
        )(lenT, tm)

    # -- forward flags -----------------------------------------------------
    def forward_flags_b(self, data, len_g, *, seeded: bool):
        data, lg, B_rows, B = self._pack32(data, len_g)
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk = self._geom(L, B_rows)
        lenT = self._lenT(lg, B_pad)
        flags = self._flags_call(
            data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk
        )  # [T_pad, GC, B_pad]
        fl = (
            flags[:T, :, :B_rows].transpose(2, 1, 0).reshape(-1, T)[:B]
        )
        flag0 = jnp.full((B, 1), bool(self.prog.nullable), bool)
        return jnp.concatenate([flag0, fl > 0], axis=1)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "seeded", "L", "T_pad", "B_pad", "B_blk", "T_chunk"
        ),
    )
    def _flags_call(self, data, lenT, seeded, L, T_pad, B_pad, B_blk, T_chunk):
        GC = self.GC
        tm = _time_major(data, GC, L, T_pad, B_pad, 1)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _count_flags_kernel,
            seeded=seeded,
            m=self.m,
            n=self.n,
            body_runs=self.body,
            T_chunk=T_chunk,
        )
        gspec = pl.BlockSpec(
            (GC, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk, GC, B_blk), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[gspec, dspec],
            out_specs=dspec,
            out_shape=jax.ShapeDtypeStruct((T_pad, GC, B_pad), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((self.k * GC, B_blk), jnp.int32),
                pltpu.VMEM((self.k * GC, B_blk), jnp.int32),
                pltpu.VMEM((max(self.R * (self.k - 1), 1) * GC, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, tm)

    # -- reverse hits ------------------------------------------------------
    def reverse_hits_b(self, data, len_g):
        data, lg, B_rows, B = self._pack32(data, len_g)
        L = data.shape[1]
        T, T_pad, B_pad, B_blk, T_chunk = self._geom(L, B_rows)
        lenT = self._lenT(lg, B_pad)
        hits = self._reverse_call(data, lenT, L, T_pad, B_pad, B_blk, T_chunk)
        h = hits[:T, :, :B_rows].transpose(2, 1, 0).reshape(-1, T)[:B]
        return h > 0

    @functools.partial(
        jax.jit,
        static_argnames=("self", "L", "T_pad", "B_pad", "B_blk", "T_chunk"),
    )
    def _reverse_call(self, data, lenT, L, T_pad, B_pad, B_blk, T_chunk):
        GC = self.GC
        tm = _time_major(data, GC, L, T_pad, B_pad, 1)
        nB, nT = B_pad // B_blk, T_pad // T_chunk
        kernel = functools.partial(
            _count_reverse_kernel,
            m=self.m,
            body_runs=self.body,
            T_chunk=T_chunk,
        )
        gspec = pl.BlockSpec(
            (GC, B_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (T_chunk, GC, B_blk),
            lambda i, j, nT=nT: (nT - 1 - j, 0, i),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(nB, nT),
            in_specs=[gspec, dspec],
            out_specs=dspec,
            out_shape=jax.ShapeDtypeStruct((T_pad, GC, B_pad), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((self.k * GC, B_blk), jnp.int32),
                pltpu.VMEM((max(self.R * (self.k - 1), 1) * GC, B_blk), jnp.int32),
            ],
            interpret=_interpret(),
        )(lenT, tm)
