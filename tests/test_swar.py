"""SWAR bit-packed scanner parity (interpret mode on CPU).

The SWAR path (ops/scan_swar.py) repacks s_tile == 8 programs as 4 records
per uint32 lane with sentinel-byte length encoding and reduces an accept
bit-log in XLA; it must agree exactly with the matmul PallasScanner
(itself parity-tested against the packed engine and the oracle) on every
match_stats_b output, including nullable/anchor/empty-record edges.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.engine import ScanEngine
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_pallas as spl
from roaringregex_tpu.ops import scan_swar as ssw

PATTERNS = [
    "cat|dog",
    "(ab)*c+d?",
    "(cat|dog)*",  # nullable
    "^ab?c$",  # anchors
    "[a-c]x{0,2}$",  # EOS-class gating
    "a*",  # nullable single class
    "(a|b)(c|d)",
    "a\\.b",
    "[^a-c]",  # complement class
    "a+b",
    "a.b",  # '.' position spans several byte classes
    "...",
    "(a|.)c",
    "(a|$)*",  # nullable AND '$' in the first set (empty-record EOS dedup)
    "$?",
    "(a$)?",
    "(^|a)b*",  # nullable AND '^' in the first set
]


def _batch(seed=0, n=60, maxlen=40, L=48, G=16):
    rng = np.random.default_rng(seed)
    texts = [b"", b"cat", b"catdog", b"ababccd", b"abc", b"a.b", b"zzz"]
    for _ in range(n):
        ln = int(rng.integers(0, maxlen))
        texts.append(
            bytes(rng.choice(list(b"abcdogt.caxz"), size=ln).astype(np.uint8))
        )
    Bp = ((len(texts) + G - 1) // G) * G
    data = np.zeros((Bp, L), np.uint8)
    lengths = np.zeros(Bp, np.int32)
    for i, t in enumerate(texts):
        data[i, : len(t)] = np.frombuffer(t, np.uint8)
        lengths[i] = len(t)
    return data, lengths


@pytest.mark.parametrize("pattern", PATTERNS)
@pytest.mark.parametrize("seeded", [True, False])
def test_match_stats_parity(pattern, seeded):
    prog = compile_program(pattern)
    spec = ssw.swar_spec(prog)
    assert spec is not None, "every test pattern should fit s_tile=8"
    tabs = sp.packed_tables(prog)
    ref = spl.PallasScanner(prog, tabs)
    sw = ssw.SwarScanner(prog, tabs)
    data, lengths = _batch(G=prog.G)
    len_g = lengths.reshape(-1, prog.G)
    a = ref.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=seeded)
    b = sw.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=seeded)
    for name, x, y in zip(["cnt", "first", "last", "full", "any"], a, b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=f"{pattern} {name}"
        )


@pytest.mark.parametrize("pattern", PATTERNS)
def test_reverse_hits_parity(pattern):
    prog = compile_program(pattern)
    tabs = sp.packed_tables(prog)
    ref = spl.PallasScanner(prog, tabs)
    sw = ssw.SwarScanner(prog, tabs)
    data, lengths = _batch(G=prog.G)
    len_g = jnp.asarray(lengths.reshape(-1, prog.G))
    a = np.asarray(ref.reverse_hits_b(jnp.asarray(data), len_g))
    b = np.asarray(sw.reverse_hits_b(jnp.asarray(data), len_g))
    np.testing.assert_array_equal(a, b[:, : a.shape[1]], err_msg=pattern)


@pytest.mark.parametrize(
    "pattern",
    [p for p in PATTERNS if not compile_program(p).nullable],
)
def test_lazy_spans_parity(pattern):
    prog = compile_program(pattern)
    tabs = sp.packed_tables(prog)
    ref = spl.PallasScanner(prog, tabs)
    sw = ssw.SwarScanner(prog, tabs)
    data, lengths = _batch(G=prog.G)
    len_g = jnp.asarray(lengths.reshape(-1, prog.G))
    s1, e1, c1 = ref.lazy_spans_b(jnp.asarray(data), len_g, cap=16)
    s2, e2, c2 = sw.lazy_spans_b(jnp.asarray(data), len_g, cap=16)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2), err_msg=pattern)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2), err_msg=pattern)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2), err_msg=pattern)


def test_spec_rejects_wide_tiles():
    assert ssw.swar_spec(compile_program("(ab|cd)+e{2,3}fgh")) is None
    assert ssw.swar_spec(compile_program("a{1,300}")) is None


def test_engine_selects_swar():
    eng = ScanEngine(compile_program("cat|dog"), backend="pallas")
    assert type(eng._pallas).__name__ == "SwarScanner"


def test_swar_kill_switch():
    from roaringregex_tpu.utils.config import get_config, set_config

    cfg = get_config()
    try:
        set_config(cfg.with_(swar=False))
        eng = ScanEngine(compile_program("cat|dog"), backend="pallas")
        assert type(eng._pallas).__name__ == "PallasScanner"
    finally:
        set_config(cfg)


def test_engine_window_defers_to_swar():
    # engine-level windowing must not route SwarScanner through the
    # matmul lead>0 path; SWAR windows internally instead
    from roaringregex_tpu.utils.config import get_config, set_config

    cfg = get_config()
    try:
        set_config(cfg.with_(window_cols=4096))
        eng = ScanEngine(compile_program("cat|dog"), backend="pallas")
        assert type(eng._pallas).__name__ == "SwarScanner"
        assert eng._window_plan(4096, 32, True) is None
    finally:
        set_config(cfg)
    # wide tiles (> 32 states: past the u32-word tier too) keep the
    # matmul scanner
    eng2 = ScanEngine(compile_program("a{1,40}"), backend="pallas")
    assert type(eng2._pallas).__name__ == "PallasScanner"


def test_engine_match_stats_through_swar():
    prog = compile_program("cat|dog")
    eng = ScanEngine(prog, backend="pallas")
    ref = ScanEngine(prog, backend="packed")
    data, lengths = _batch(seed=3, G=prog.G)
    a = [np.asarray(x) for x in eng.match_stats(data, lengths, seeded=True)]
    b = [np.asarray(x) for x in ref.match_stats(data, lengths, seeded=True)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(
        eng.fullmatch_flags(data, lengths), ref.fullmatch_flags(data, lengths)
    )


def test_full_length_records_no_eos_loss():
    # len == L: the EOS step is the final stream step; ensure T covers it
    prog = compile_program("ab$")
    tabs = sp.packed_tables(prog)
    ref = spl.PallasScanner(prog, tabs)
    sw = ssw.SwarScanner(prog, tabs)
    G = prog.G
    L = 8
    data = np.tile(np.frombuffer(b"zzzzzzab", np.uint8), (2 * G, 1))
    lengths = np.full(2 * G, L, np.int32)
    len_g = lengths.reshape(-1, G)
    a = ref.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=True)
    b = sw.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert np.asarray(b[4]).all()  # every record matches ...ab$


def test_windowed_parity():
    # L large + few records triggers the internal window split; results
    # must equal the unwindowed matmul scanner exactly
    from roaringregex_tpu.utils.config import get_config, set_config

    prog = compile_program("cat|dog")
    tabs = sp.packed_tables(prog)
    ref = spl.PallasScanner(prog, tabs)
    sw = ssw.SwarScanner(prog, tabs)
    G = prog.G
    rng = np.random.default_rng(7)
    B, L = 2 * G, 1024
    data = rng.choice(
        np.frombuffer(b"abcdogt.ca", np.uint8), size=(B, L)
    ).astype(np.uint8)
    data[0, 100:103] = np.frombuffer(b"cat", np.uint8)
    data[1, 510:513] = np.frombuffer(b"dog", np.uint8)  # straddles w=512?
    data[2, 253:256] = np.frombuffer(b"cat", np.uint8)  # window boundary
    lengths = np.full(B, L, np.int32)
    lengths[3] = 0
    lengths[4] = 257
    len_g = lengths.reshape(-1, G)
    assert sw._swar_window(L, B, True) is not None, "window should trigger"
    a = ref.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=True)
    b = sw.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=True)
    for name, x, y in zip(["cnt", "first", "last", "full", "any"], a, b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )
    # window knob off -> unwindowed path, same results
    old = get_config()
    try:
        set_config(old.with_(swar_window_cols=0))
        assert sw._swar_window(L, B, True) is None
        c = sw.match_stats_b(
            jnp.asarray(data), jnp.asarray(len_g), seeded=True
        )
        for x, y in zip(b, c):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    finally:
        set_config(old)


def test_high_bytes_are_dead():
    # bytes >= 0x80 must not alias the BOS/EOS/dead sentinels
    prog = compile_program("a.b")  # '.' covers 0..0x7F only
    tabs = sp.packed_tables(prog)
    sw = ssw.SwarScanner(prog, tabs)
    ref = spl.PallasScanner(prog, tabs)
    G = prog.G
    data = np.zeros((G, 8), np.uint8)
    rows = [b"a\xfeb", b"a\xffb", b"a\xfdb", b"axb"]
    lengths = np.zeros(G, np.int32)
    for i, t in enumerate(rows):
        data[i, : len(t)] = np.frombuffer(t, np.uint8)
        lengths[i] = len(t)
    len_g = lengths.reshape(-1, G)
    a = ref.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=True)
    b = sw.match_stats_b(jnp.asarray(data), jnp.asarray(len_g), seeded=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    anym = np.asarray(b[4]).reshape(-1)
    assert list(anym[:4]) == [False, False, False, True]
