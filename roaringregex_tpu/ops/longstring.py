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


class LongScanner:
    """One-long-string scanner bound to a compiled program."""

    def __init__(self, prog: DeviceProgram, block: int = 1024):
        self.prog = prog
        self.block = block
        self.tables = sx.device_tables(prog)

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
