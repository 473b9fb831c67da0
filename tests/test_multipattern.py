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
