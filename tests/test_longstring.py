"""Long-string (block-parallel) scan vs oracle.

The associative block-summary scheme must reproduce the oracle's ends()
and fullmatch() exactly, for every block size (including block sizes that
straddle match boundaries) and both seeded and anchored conventions.
"""
import numpy as np
import pytest

from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.ops.longstring import LongScanner
from roaringregex_tpu.oracle.engine import OracleEngine

PATTERNS = ["cat|dog", "(ab)*c+d?", "a{2,9}", "^ab", "ab$", "(cat|dog)*",
            "[a-c]+x"]


def _texts(rng, n=6, L=200):
    out = [b"", b"cat", b"catdog" * 20]
    for _ in range(n):
        ln = int(rng.integers(1, L))
        out.append(
            bytes(rng.choice(list(b"abcdtogx"), size=ln).astype(np.uint8))
        )
    return out


@pytest.mark.parametrize("pattern", PATTERNS)
@pytest.mark.parametrize("block", [16, 64, 1024])
def test_long_ends_match_oracle(pattern, block):
    prog = compile_program(pattern)
    oracle = OracleEngine(prog.nfa)
    sc = LongScanner(prog, block=block)
    rng = np.random.default_rng(5)
    for t in _texts(rng):
        exp = oracle.ends(t)
        got = set(np.nonzero(sc.ends_bitmap(t))[0].tolist())
        assert got == exp, (pattern, block, t[:40])


@pytest.mark.parametrize("pattern", PATTERNS)
def test_long_fullmatch_match_oracle(pattern):
    prog = compile_program(pattern)
    oracle = OracleEngine(prog.nfa)
    sc = LongScanner(prog, block=32)
    rng = np.random.default_rng(6)
    for t in _texts(rng):
        assert sc.fullmatch(t) == oracle.fullmatch(t), (pattern, t[:40])


def test_long_blocks_beat_sequential_equivalence():
    """A long string whose matches straddle many block boundaries."""
    prog = compile_program("ab(cd)+e")
    oracle = OracleEngine(prog.nfa)
    sc = LongScanner(prog, block=8)  # tiny blocks, matches cross boundaries
    t = (b"xx" + b"abcdcdcde" * 50)[:401]
    assert set(np.nonzero(sc.ends_bitmap(t))[0].tolist()) == oracle.ends(t)


@pytest.mark.parametrize("pattern", ["cat|dog", "(ab)*c+d?", "^ab", "ab$",
                                     "(cat|dog)*", "[a-c]+x"])
def test_fast_long_scanner_matches_oracle(pattern):
    from roaringregex_tpu.ops.longstring import FastLongScanner

    prog = compile_program(pattern)
    oracle = OracleEngine(prog.nfa)
    sc = FastLongScanner(prog, block=128)  # small blocks, many boundaries
    rng = np.random.default_rng(11)
    texts = [b"", b"cat", b"catdog" * 30, b"ab" * 100 + b"ccd"]
    for _ in range(4):
        ln = int(rng.integers(1, 500))
        texts.append(bytes(rng.choice(list(b"abcdtogx"), size=ln).astype(np.uint8)))
    for t in texts:
        got = set(np.nonzero(sc.ends_bitmap(t))[0].tolist())
        assert got == oracle.ends(t), (pattern, len(t))
        assert sc.fullmatch(t) == oracle.fullmatch(t), (pattern, len(t))


def test_make_long_scanner_dispatch():
    from roaringregex_tpu.ops.longstring import (
        FastLongScanner, LongScanner, make_long_scanner,
    )

    assert isinstance(make_long_scanner(compile_program("cat|dog")), FastLongScanner)
    assert isinstance(make_long_scanner(compile_program("a{1,300}")), LongScanner)


def test_pattern_long_api():
    import roaringregex_tpu as rrx

    p = rrx.Pattern("cat|dog")
    blob = b"x" * 5000 + b"cat" + b"y" * 5000 + b"dog"
    assert p.long.count_ends(blob) == 2
    assert p.long.search(blob) and not p.long.fullmatch(blob)
    assert p.long.fullmatch(b"cat")
