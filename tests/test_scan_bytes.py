"""Fused byte->mask kernel parity (interpret mode on CPU).

The byte-path kernels (scan_pallas `*_b` entry points) consume raw
time-major corpus bytes and translate byte->class->mask in-kernel from
static run constants; they must agree exactly with the mask-stream kernels
(which in turn are parity-tested against the packed XLA engine and the
oracle). Also covers the greedy (leftmost-longest) anchored rescan against
a brute-force oracle walk.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_pallas as spl
from roaringregex_tpu.ops import scan_xla as sx
from roaringregex_tpu.oracle.engine import OracleEngine

PATTERNS = [
    "cat|dog",            # tile 8, G=16, r=2
    "(ab|cd)+e{2,3}fgh",  # tile 16, G=8, r=4
    "a{1,25}",            # tile 32, G=4, r=8
    "[a-f]{10,55}",       # tile 64, G=2, r=8
    "a{1,120}",           # tile 128, G=1, r=8
    "a{1,200}",           # tile 256 (dense256)
    "a{1,300}",           # tile 384 (multiblock)
    "(cat|dog)*",         # nullable
    "^ab?c$",             # anchors
]


def _setup(pattern, seed=0, n=40, maxlen=30, L=32):
    prog = compile_program(pattern)
    tab_p = sp.packed_tables(prog)
    scanner = spl.PallasScanner(prog, tab_p)
    rng = np.random.default_rng(seed)
    texts = [b"", b"cat", b"catdog", b"ababccd", b"abc", b"aaaaa"]
    for _ in range(n):
        ln = int(rng.integers(0, maxlen))
        texts.append(
            bytes(rng.choice(list(b"abcdefgcat.dog"), size=ln).astype(np.uint8))
        )
    G = prog.G
    Bp = max(G, ((len(texts) + G - 1) // G) * G)
    data = np.zeros((Bp, L), np.uint8)
    lengths = np.zeros(Bp, np.int32)
    for i, t in enumerate(texts):
        data[i, : len(t)] = np.frombuffer(t, np.uint8)
        lengths[i] = len(t)
    tab_u = sx.device_tables(prog)
    cls = sx.encode_stream(
        tab_u, jnp.asarray(data), jnp.asarray(lengths),
        prog.bos_class, prog.eos_class, prog.dead_class,
    )
    words = sp.pack_mask_stream(tab_p, cls, s_tile=prog.s_tile, G=prog.G)
    len_g = jnp.asarray(lengths).reshape(-1, prog.G)
    return prog, scanner, data, lengths, words, len_g, texts


@pytest.mark.parametrize("pattern", PATTERNS)
def test_bytes_match_stats_parity(pattern):
    prog, scanner, data, lengths, words, len_g, _ = _setup(pattern)
    for seeded in (True, False):
        cs, fs, as_ = scanner.match_stats(words, len_g, seeded=seeded)
        cb, fb, lb, fulb, ab = scanner.match_stats_b(
            jnp.asarray(data), len_g, seeded=seeded
        )
        np.testing.assert_array_equal(np.asarray(cs), np.asarray(cb), err_msg=pattern)
        np.testing.assert_array_equal(np.asarray(fs), np.asarray(fb), err_msg=pattern)
        np.testing.assert_array_equal(np.asarray(as_), np.asarray(ab), err_msg=pattern)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_bytes_flags_reverse_parity(pattern):
    prog, scanner, data, lengths, words, len_g, _ = _setup(pattern, seed=1)
    for seeded in (True, False):
        fls = np.asarray(scanner.forward_flags(words, seeded=seeded))
        flb = np.asarray(
            scanner.forward_flags_b(jnp.asarray(data), len_g, seeded=seeded)
        )
        np.testing.assert_array_equal(fls, flb, err_msg=f"{pattern} {seeded}")
    hs = np.asarray(scanner.reverse_hits(words))
    hb = np.asarray(scanner.reverse_hits_b(jnp.asarray(data), len_g))
    np.testing.assert_array_equal(hs, hb, err_msg=pattern)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_bytes_last_full_oracle(pattern):
    """The new fused outputs: last match end + whole-record acceptance."""
    prog, scanner, data, lengths, _, len_g, texts = _setup(pattern, seed=2)
    oracle = OracleEngine(prog.nfa)
    cb, fb, lb, fulb, ab = scanner.match_stats_b(
        jnp.asarray(data), len_g, seeded=True
    )
    _, _, _, full_anch, _ = scanner.match_stats_b(
        jnp.asarray(data), len_g, seeded=False
    )
    lb = np.asarray(lb).reshape(-1)
    full_anch = np.asarray(full_anch).reshape(-1)
    for i, t in enumerate(texts):
        ends = sorted(oracle.ends(t))
        want_last = ends[-1] if ends else -1
        if prog.nullable:
            want_last = len(t)  # seeded empty match at every position
        assert lb[i] == want_last, (pattern, t, lb[i], want_last)
        assert bool(full_anch[i]) == oracle.fullmatch(t), (pattern, t)


@pytest.mark.parametrize("pattern", ["cat|dog", "(ab)+", "a{2,6}", "[a-c]+x?"])
def test_greedy_anchor_end(pattern):
    """longest=True returns the largest end of a match anchored at s."""
    prog, scanner, data, lengths, _, len_g, texts = _setup(pattern, seed=3)
    oracle = OracleEngine(prog.nfa)
    rng = np.random.default_rng(5)
    starts = np.where(
        rng.random(data.shape[0]) < 0.8,
        rng.integers(0, 8, data.shape[0]),
        -1,
    ).astype(np.int32)
    starts_g = jnp.asarray(starts).reshape(-1, prog.G)
    le = np.asarray(
        scanner.anchor_end_b(jnp.asarray(data), len_g, starts_g, longest=True)
    ).reshape(-1)
    fe = np.asarray(
        scanner.anchor_end_b(jnp.asarray(data), len_g, starts_g, longest=False)
    ).reshape(-1)
    for i, t in enumerate(texts):
        s = int(starts[i])
        if s < 0 or s > len(t):
            continue
        # brute force: all ends e >= s with t[s:e] accepted
        ends = [
            e for e in range(s, len(t) + 1) if oracle.fullmatch(t[s:e])
        ]
        # oracle.fullmatch('') covers nullable; kernel reports only e > s
        # accepts for nullable (empty anchored match handled by the caller)
        ends_k = [e for e in ends if not (prog.nullable and e == s)]
        want_first = min(ends_k) if ends_k else -1
        want_last = max(ends_k) if ends_k else -1
        assert fe[i] == want_first, (pattern, t, s, fe[i], want_first)
        assert le[i] == want_last, (pattern, t, s, le[i], want_last)


def test_bytes_multi_chunk_grid():
    """T and B big enough to force several grid chunks in both dimensions —
    the reverse walk must map grid step j to chunk nT-1-j when computing
    stream positions (regression: EOS overlay landed on the wrong chunk)."""
    prog = compile_program("cat|dog")
    tab_p = sp.packed_tables(prog)
    scanner = spl.PallasScanner(prog, tab_p)
    tab_u = sx.device_tables(prog)
    rng = np.random.default_rng(3)
    G = prog.G
    B, L = 64 * G, 600  # B_rows=64, T=602 -> several T chunks
    data = rng.integers(97, 123, size=(B, L), dtype=np.uint8)
    lengths = rng.integers(0, L + 1, size=B).astype(np.int32)
    cls = sx.encode_stream(
        tab_u, jnp.asarray(data), jnp.asarray(lengths),
        prog.bos_class, prog.eos_class, prog.dead_class,
    )
    words = sp.pack_mask_stream(tab_p, cls, s_tile=prog.s_tile, G=prog.G)
    len_g = jnp.asarray(lengths).reshape(-1, G)
    cs, fs, _ = scanner.match_stats(words, len_g, seeded=True)
    cb, fb, _, _, _ = scanner.match_stats_b(jnp.asarray(data), len_g, seeded=True)
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fb))
    hs = np.asarray(scanner.reverse_hits(words))
    hb = np.asarray(scanner.reverse_hits_b(jnp.asarray(data), len_g))
    np.testing.assert_array_equal(hs, hb)
    for seeded in (True, False):
        fls = np.asarray(scanner.forward_flags(words, seeded=seeded))
        flb = np.asarray(
            scanner.forward_flags_b(jnp.asarray(data), len_g, seeded=seeded)
        )
        np.testing.assert_array_equal(fls, flb)


def test_sparse_bytes_parity():
    """Sparse-tier byte kernels vs the unpacked XLA engine."""
    prog = compile_program("a{3,1200}")
    assert prog.tier == "sparse"
    tab_s = sp.stream_tables(prog)
    scanner = spl.SparseScanner(prog, tab_s)
    tab_u = sx.device_tables(prog)
    texts = [b"", b"aa", b"aaa", b"a" * 40, b"b" + b"a" * 5]
    L = 64
    data = np.zeros((len(texts), L), np.uint8)
    lengths = np.zeros(len(texts), np.int32)
    for i, t in enumerate(texts):
        data[i, : len(t)] = np.frombuffer(t, np.uint8)
        lengths[i] = len(t)
    cls = sx.encode_stream(
        tab_u, jnp.asarray(data), jnp.asarray(lengths),
        prog.bos_class, prog.eos_class, prog.dead_class,
    )
    len_g = jnp.asarray(lengths).reshape(-1, 1)
    for seeded in (True, False):
        cu, fu, au = sx.match_stats(
            tab_u, cls, jnp.asarray(lengths), seeded=seeded,
            nullable=prog.nullable,
        )
        cb, fb, lb, fulb, ab = scanner.match_stats_b(
            jnp.asarray(data), len_g, seeded=seeded
        )
        np.testing.assert_array_equal(np.asarray(cu), np.asarray(cb).reshape(-1))
        np.testing.assert_array_equal(np.asarray(fu), np.asarray(fb).reshape(-1))


CHAIN_PATTERNS = [
    "cat|dog",        # tile 8, G=16
    "[a-z]+\\.log$",  # end anchor
    "(ab)*c+d?",      # kleene
    "a*",             # nullable
    "^ab",            # begin anchor
    "a$^b",           # adversarial: follow($) = {^} must NOT leak across
                      # the chained segment boundary (dead guard step)
    "(a$|b)c?",       # mid-pattern anchor alternation
]


@pytest.mark.parametrize("pattern", CHAIN_PATTERNS)
def test_chained_match_stats_parity(pattern):
    """Short-record chaining (K records per lane along the time axis) must
    be invisible: identical stats to the unchained kernel for every policy,
    including anchors, nullable patterns, and fullmatch (seeded=False)."""
    from roaringregex_tpu.utils.config import get_config, set_config

    prog = compile_program(pattern)
    tab_p = sp.packed_tables(prog)
    scanner = spl.PallasScanner(prog, tab_p)
    rng = np.random.default_rng(7)
    G = max(1, prog.G)
    base = get_config()
    for B, L in [(4 * G, 12), (8 * G, 30), (16 * G, 7)]:
        alpha = np.frombuffer(b"abcd. \x00xyzgtol", np.uint8)
        data = alpha[rng.integers(0, len(alpha), size=(B, L))].astype(np.uint8)
        lens = rng.integers(0, L + 1, size=B).astype(np.int32)
        len_g = lens.reshape(-1, G)
        K = min(1024 // (L + 3), 8, max(64 // scanner.at.shape[0], 1))
        assert K > 1, "test must exercise a real chain factor"
        for seeded in (True, False):
            try:
                set_config(base.with_(chain_target=0))
                ref = scanner.match_stats_b(data, len_g, seeded=seeded)
                orig = spl.PallasScanner._chain_k
                spl.PallasScanner._chain_k = lambda self, L_, n_, K=K: K
                try:
                    got = scanner.match_stats_b(data, len_g, seeded=seeded)
                finally:
                    spl.PallasScanner._chain_k = orig
            finally:
                set_config(base)
            for name, a, b in zip(
                ["cnt", "first", "last", "full", "any"], ref, got
            ):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{pattern!r} B={B} L={L} K={K} "
                            f"seeded={seeded} stat={name}",
                )
