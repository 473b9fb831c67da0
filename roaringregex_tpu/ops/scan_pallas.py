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
# Host-side wrapper
# ---------------------------------------------------------------------------


class PallasScanner:
    """Owns kernel-layout tables + jit caches for one compiled program."""

    def __init__(self, prog: DeviceProgram, ptables: Dict[str, jnp.ndarray]):
        assert prog.tier != "sparse"
        self.prog = prog
        self.lanes = prog.lanes
        self.G = prog.G
        self.W = prog.lanes // 32
        self.ft = jnp.asarray(np.asarray(ptables["F_bd"]).T, DTYPE)
        self.f = ptables["F_bd"].astype(DTYPE)
        self.at = jnp.asarray(np.asarray(ptables["A"]).T, DTYPE)
        self.sg = jnp.asarray(np.asarray(ptables["seed_groups"]).T, DTYPE)
        self.seed = ptables["seed_row"].astype(DTYPE)[:, None]
        self.acc = ptables["accept_lanes"].astype(DTYPE)[:, None]

    # -- stream layout ------------------------------------------------------
    def _blk_limits(self, b_blk_max: int) -> Tuple[int, int]:
        """(B_blk_cap, T_chunk_cap) scaled so a stream block fits the VMEM
        budget at this tier's lane width (W words per row-step)."""
        if self.lanes > 256:
            b_blk_max = min(b_blk_max, 512 if self.lanes <= 512 else 256)
        t_cap = STREAM_VMEM_BUDGET // (self.W * b_blk_max * 4)
        t_cap = max(8, min(T_CHUNK_MAX, _pow2_floor(t_cap)))
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
            nullable=self.prog.nullable,
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
