"""SWAR u32-word scanner parity (interpret mode on CPU).

The word path (ops/scan_word.py) gives each record a full 32-bit state
set (9..32-state programs, multi-pattern accept channels); it must agree
exactly with the matmul PallasScanner on every match_stats_b output.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.engine import ScanEngine
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_pallas as spl
from roaringregex_tpu.ops import scan_word as ssw32

# 9..32-state patterns (s_tile 16/32) plus a couple of 8-state ones (the
# word path must be correct there too, even though the engine prefers the
# 4-records-per-u32 tier)
PATTERNS = [
    "(ab|cd)+e{2,3}fgh",
    "abcdefghij",  # 11 states, literal chain
    "[a-f]{2,6}z",
    "(cat|dog|bird)+",
    "a{10,20}",
    "^[a-z]{3,8}[.]log$",  # anchors + classes
    "(ab)*c+d?",  # 8-state
    "x(yz|zy)*x$",  # EOS
    "a*b*c*d*e*",  # nullable wide
]


def _batch(seed=0, n=60, maxlen=40, L=48, G=16):
    rng = np.random.default_rng(seed)
    texts = [
        b"", b"cat", b"catdogbird", b"ababccd", b"abcdefghij", b"xyzyx",
        b"aaaaaaaaaaaa", b"abc.log", b"ffz",
    ]
    for _ in range(n):
        ln = int(rng.integers(0, maxlen))
        texts.append(
            bytes(
                rng.choice(list(b"abcdefghijz.xylog"), size=ln).astype(
                    np.uint8
                )
            )
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
    spec = ssw32.word_spec(prog)
    assert spec is not None, f"{pattern} should fit s_tile<=32"
    tabs = sp.packed_tables(prog)
    ref = spl.PallasScanner(prog, tabs)
    sw = ssw32.WordScanner(prog, tabs)
    data, lengths = _batch(G=prog.G)
    len_g = jnp.asarray(lengths.reshape(-1, prog.G))
    a = ref.match_stats_b(jnp.asarray(data), len_g, seeded=seeded)
    b = sw.match_stats_b(jnp.asarray(data), len_g, seeded=seeded)
    for name, x, y in zip(["cnt", "first", "last", "full", "any"], a, b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=f"{pattern} {name}"
        )


def test_spec_rejects_wide():
    assert ssw32.word_spec(compile_program("a{1,300}")) is None


def test_engine_selects_word_tier():
    eng = ScanEngine(
        compile_program("(ab|cd)+e{2,3}fgh"), backend="pallas"
    )
    assert type(eng._pallas).__name__ == "WordScanner"
    # 8-state single patterns still prefer the denser 4-records/u32 tier
    eng8 = ScanEngine(compile_program("cat|dog"), backend="pallas")
    assert type(eng8._pallas).__name__ == "SwarScanner"


def test_multipattern_finditer_combined_scan():
    """finditer_batch runs ONE combined scan (lazy_spans_mb) and matches
    per-pattern extraction exactly, nullable channels included."""
    from roaringregex_tpu.api import MultiPattern, Pattern

    pats = ["cat|dog", "[0-9]{3}", "(er)*", "ab(cd)*e"]  # one nullable
    mp = MultiPattern(pats, backend="pallas")
    assert getattr(mp.engine._pallas, "spanP", None) == 4
    texts = [
        b"the cat sat on a dog", b"error 4041 erer", b"abcdcdcde abe",
        b"", b"x" * 25, b"cat999dogerer", b"abe abcde", b"dogcat",
    ]
    got = mp.finditer_batch(texts)
    for p, pat in enumerate(pats):
        want = Pattern(pat, backend="pallas").finditer_batch(texts)
        assert got[p] == want, pat


def test_multipattern_finditer_greedy_fallback():
    from roaringregex_tpu.api import MultiPattern, Pattern

    pats = ["cat|dog", "[0-9]{3}"]
    mp = MultiPattern(pats, backend="pallas")
    texts = [b"cat99 dog123", b"", b"9999"]
    got = mp.finditer_batch(texts, longest=True)
    for p, pat in enumerate(pats):
        want = Pattern(pat, backend="pallas").finditer_batch(
            texts, longest=True
        )
        assert got[p] == want, pat


def test_multipattern_channels_parity():
    """MultiPattern through the engine (WordScanner accept channels) vs
    per-pattern single scans."""
    from roaringregex_tpu.api import MultiPattern, Pattern

    # "deadbeefs|x" needs > 8 states, so the slotted multi-SWAR path
    # (which requires EVERY pattern to fit the 8-state tile) stands
    # aside and the combined word tier serves the channels
    pats = ["cat|dog", "[0-9]{3}", "deadbeefs|x", "ab(cd)*e"]
    mp = MultiPattern(pats, backend="pallas")
    assert type(mp.engine._pallas).__name__ == "WordScanner"
    texts = [
        b"the cat sat", b"deadbeefs 404", b"abcdcde", b"x" * 30, b"",
        b"dog deadbeefs 123", b"abe", b"catdog999",
    ]
    got = mp.count_batch(texts)
    for p, pat in enumerate(pats):
        want = Pattern(pat).count_batch(texts)
        np.testing.assert_array_equal(got[:, p], want, err_msg=pat)


def test_word_zero_byte_class_no_bos_phantom():
    """Classes containing byte 0 ([^a], .) must not match the BOS step's
    zero padding byte (latent round-4 bug: signed jr < lens let the
    pre-record step count as alive)."""
    from roaringregex_tpu.api import Pattern
    from roaringregex_tpu.oracle.engine import OracleEngine

    for pat in [
        "[^a]{1,3}|[ab]a{2}a?(a|bc)|0{2}(a|b)",
        ".[ab]x|q{2}[cd]y{2}z",  # leading-dot, word tier
    ]:
        p = Pattern(pat, backend="pallas")
        assert type(p.engine.device_scanner).__name__ == "WordScanner", pat
        orc = OracleEngine(p.program.nfa)
        texts = [b"", b"a", b"ab", b".abx", b"qqcyyz", b"\x00ab"]
        got = [int(x) for x in p.count_batch(texts)]
        want = [len(orc.ends(t)) for t in texts]
        assert got == want, (pat, got, want)
