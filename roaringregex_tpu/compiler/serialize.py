"""Compiled-program serialization + content-addressed cache.

SURVEY.md §5 (checkpoint/resume): the reference never serializes its
compiled NFA even though the arena layout is trivially dumpable (§2.3).
Here a compiled pattern is persisted as an .npz of the logical NFA
(labels / follow edges / accept set) keyed by a content hash of
(pattern, format version), so multi-host workers can load identical
replicated tables without re-running the compiler front-end.

The device tables are *recomputed* from the logical NFA on load — they are
deterministic functions of it, and storing only the logical form keeps the
file small (edges are O(nnz), not O(S^2)) and the format stable across
kernel-layout changes.
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

from .nfa import NFA
from .parser import NSYM
from .program import DeviceProgram, compile_program

FORMAT_VERSION = 1


def _hash_key(pattern: str) -> str:
    h = hashlib.sha256()
    h.update(f"rrx-program-v{FORMAT_VERSION}:".encode())
    h.update(pattern.encode("utf-8", "surrogatepass"))
    return h.hexdigest()[:32]


def save_program(prog: DeviceProgram, path: str) -> None:
    """Serialize the logical NFA behind a compiled program."""
    nfa = prog.nfa
    S = nfa.n_states
    # follow edges as [nnz, 2] int32
    edges = nfa.get_edges()
    # per-position symbol sets, bit-packed over NSYM symbols
    nbytes = (NSYM + 7) // 8
    labels = np.zeros((S - 1, nbytes), dtype=np.uint8)
    for p, syms in enumerate(nfa.labels):
        for c in syms:
            labels[p, c // 8] |= 1 << (c % 8)
    accept = np.array(sorted(nfa.accept_set), dtype=np.int32)
    if hasattr(path, "write"):
        f = path
    else:
        f = open(path, "wb")  # noqa: SIM115 - savez appends .npz to str paths
    np.savez_compressed(
        f,
        format_version=np.int32(FORMAT_VERSION),
        pattern=np.frombuffer(
            nfa.pattern.encode("utf-8", "surrogatepass"), dtype=np.uint8
        ),
        n_states=np.int32(S),
        nullable=np.bool_(nfa.nullable),
        edges=edges,
        labels=labels,
        accept=accept,
    )
    if f is not path:
        f.close()


def load_program(path: str) -> DeviceProgram:
    """Load a serialized program; device tables are rebuilt deterministically."""
    z = np.load(path)
    ver = int(z["format_version"])
    if ver != FORMAT_VERSION:
        raise ValueError(f"unsupported program format v{ver}")
    pattern = bytes(z["pattern"].tobytes()).decode("utf-8", "surrogatepass")
    S = int(z["n_states"])
    follow_sets = [set() for _ in range(S)]
    for i, j in z["edges"]:
        follow_sets[int(i)].add(int(j))
    labels = []
    for row in z["labels"]:
        syms = set()
        for c in range(NSYM):
            if row[c // 8] & (1 << (c % 8)):
                syms.add(c)
        labels.append(frozenset(syms))
    nfa = NFA(
        pattern=pattern,
        n_states=S,
        labels=labels,
        follow_sets=follow_sets,
        accept_set=set(int(a) for a in z["accept"]),
        nullable=bool(z["nullable"]),
    )
    return compile_program(nfa)


# ---------------------------------------------------------------------------
# Content-addressed cache
# ---------------------------------------------------------------------------


def cached_compile(
    pattern: str, cache_dir: Optional[str] = None
) -> DeviceProgram:
    """compile_program with an on-disk cache keyed by (pattern, version).

    Multi-host usage: every worker hashes identically, so a shared cache
    directory yields identical replicated tables with one compile.
    """
    if cache_dir is None:
        from ..utils.config import get_config

        cache_dir = get_config().cache_dir
    if not cache_dir:
        return compile_program(pattern)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, _hash_key(pattern) + ".npz")
    if os.path.exists(path):
        try:
            return load_program(path)
        except Exception:
            pass  # corrupt/stale -> recompile below
    prog = compile_program(pattern)
    tmp = path + f".tmp{os.getpid()}"
    save_program(prog, tmp)
    os.replace(tmp, path)
    return prog
