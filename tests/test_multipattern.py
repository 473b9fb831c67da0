"""Multi-pattern grep: one combined automaton, per-pattern channels."""
import numpy as np
import pytest

import roaringregex_tpu as rrx
from roaringregex_tpu.oracle.engine import OracleEngine

PATTERN_SETS = [
    ["cat", "dog", "bird"],
    ["cat|dog", "[0-9]+", "(ab)*c"],
    ["a*", "err(or)?", "^x"],          # includes a nullable pattern
    ["[a-f]{3}", "z", "foo$"],
]

TEXTS = ["catdog9", "", "bird", "abc", "ababc x", "zzz", "error!", "xfoo",
         "deadbeef", "a" * 30]


@pytest.mark.parametrize("patterns", PATTERN_SETS)
def test_multi_matches_singletons(patterns):
    mp = rrx.MultiPattern(patterns)
    assert mp._singles is None, "expected the combined fast path"
    oracles = [OracleEngine(rrx.build_nfa(p)) for p in patterns]
    got_cnt = mp.count_batch(TEXTS)
    got_hit = mp.search_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        for p, orc in enumerate(oracles):
            assert got_cnt[i, p] == len(orc.ends(t)), (patterns[p], t)
            assert bool(got_hit[i, p]) == orc.search(t), (patterns[p], t)


def test_multi_sparse_fallback():
    mp = rrx.MultiPattern(["a{2,900}", "b{2,300}"])
    # combined automaton exceeds 1024 states -> per-pattern fallback
    hits = mp.search_batch(["a" * 5, "b" * 5, "ab"])
    assert hits.tolist() == [[True, False], [False, True], [False, False]]


def test_multi_empty_and_errors():
    with pytest.raises(ValueError):
        rrx.MultiPattern([])
    with pytest.raises(rrx.RegexSyntaxError):
        rrx.MultiPattern(["a", "b{3,1}"])


def test_multipattern_sparse_single_pass():
    """Sparse-tier MultiPattern scans once through the accept-channel
    kernels (no per-pattern fallback) on the pallas backend."""
    import numpy as np

    from roaringregex_tpu.api import MultiPattern, Pattern
    from roaringregex_tpu.oracle.engine import OracleEngine

    pats = ["a{3,1200}", "b{2,4}"]
    mp = MultiPattern(pats, backend="pallas")
    assert mp.program.tier == "sparse"
    assert mp._singles is None, "sparse tier must scan in one pass"
    texts = [b"", b"aaa", b"a" * 50, b"bb", b"bbbbb", b"ab" * 5]
    cnt = mp.count_batch(texts)
    for p, pat in enumerate(pats):
        o = OracleEngine(Pattern(pat).program.nfa)
        for i, t in enumerate(texts):
            assert int(cnt[i, p]) == len(o.ends(t)), (pat, t)


def test_multipattern_no_monkey_patching():
    """The engine owns the accept channels; api must not write private
    engine state (VERDICT round 1, weak #7)."""
    from roaringregex_tpu.api import MultiPattern

    mp = MultiPattern(["cat|dog", "ab"], backend="pallas")
    eng = mp.engine
    assert eng.P == 2
    # the pallas scanner's packing G is untouched; channels live in at
    assert eng._pallas.Gp == mp.program.G
    assert eng._pallas.at.shape[0] == mp.program.G * 2


def test_multipattern_finditer_batch():
    """Per-pattern span extraction: [P][B] lists, both policies, vs the
    oracle (the non-overlap policy is per-pattern; combined-automaton
    channels only accelerate the boolean/count paths)."""
    import roaringregex_tpu as rrx
    from roaringregex_tpu.oracle.engine import OracleEngine

    mp = rrx.MultiPattern(["cat|dog", "[0-9]+", "ab"])
    texts = [b"a cat 42", b"nothing", b"dog9ab", b""]
    for longest in (False, True):
        out = mp.finditer_batch(texts, longest=longest)
        assert len(out) == mp.P
        for p, patstr in enumerate(mp.patterns):
            orc = OracleEngine.compile(patstr)
            for b, t in enumerate(texts):
                assert out[p][b] == list(orc.finditer(t, longest=longest))


def test_multipattern_swar_slotted():
    from roaringregex_tpu.api import MultiPattern
    """Patterns that all fit the 8-state SWAR tile run the combined grep
    scan as slotted SWAR (4 sub-automata per u32), with exact per-channel
    stats — including nullable and $-anchored channels."""
    import numpy as np

    from roaringregex_tpu.compiler.nfa import build_nfa
    from roaringregex_tpu.oracle.engine import OracleEngine
    from roaringregex_tpu.ops.scan_swar import SwarMultiScanner

    from roaringregex_tpu.utils.config import get_config, set_config

    pats = ["cat|dog", "[0-9]{3}", "err(or)?", "ab(cd)*e"]
    base = get_config()
    # slotted SWAR defaults off (the word tier measured faster on TPU,
    # see config.swar_multi); exactness stays covered behind the flag
    set_config(base.with_(swar_multi=True))
    try:
        mp = MultiPattern(pats, backend="pallas")
        assert isinstance(mp.engine.device_scanner, SwarMultiScanner)
        rng = np.random.default_rng(5)
        texts = ["the cat had 4215 errors", "abcdcde or err", "", "dog" * 40]
        for _ in range(8):
            ln = int(rng.integers(0, 180))
            texts.append(
                "".join(rng.choice(list("catdoger0123 abcde"), size=ln))
            )
        cnt = mp.count_batch(texts)
        for p_i, pat in enumerate(pats):
            orc = OracleEngine(build_nfa(pat))
            for t_i, t in enumerate(texts):
                assert int(cnt[t_i, p_i]) == len(orc.ends(t)), (pat, t_i)
        # fewer than 4 slots + nullable + $-anchor channels
        mp2 = MultiPattern(["a*", "x$"], backend="pallas")
        assert isinstance(mp2.engine.device_scanner, SwarMultiScanner)
        c2 = mp2.count_batch(["aaax", "x", "", "bxb"])
        for p_i, pat in enumerate(["a*", "x$"]):
            orc = OracleEngine(build_nfa(pat))
            for t_i, t in enumerate(["aaax", "x", "", "bxb"]):
                assert int(c2[t_i, p_i]) == len(orc.ends(t)), (pat, t)
    finally:
        set_config(base)


def test_multipattern_swar_vs_word_ab():
    from roaringregex_tpu.api import MultiPattern
    """RRX_SWAR=0 A/B: slotted SWAR and the combined word tier compute
    the same channel stats."""
    import numpy as np

    from roaringregex_tpu.utils.config import get_config, set_config

    pats = ["cat|dog", "ab(cd)*e"]
    texts = ["catabcde", "abcdcdcde dog", "", "xyz" * 30]
    base = get_config()
    set_config(base.with_(swar_multi=True))
    try:
        mp1 = MultiPattern(pats, backend="pallas")
        c1 = np.asarray(mp1.count_batch(texts))
    finally:
        set_config(base)
    set_config(base.with_(swar=False))
    try:
        mp0 = MultiPattern(pats, backend="pallas")
        c0 = np.asarray(mp0.count_batch(texts))
    finally:
        set_config(base)
    assert (c1 == c0).all(), (c1, c0)
