"""Block-sparse (roaring-container) pallas tier: interpret-mode parity.

S > 1024 patterns route to SparseScanner: partial 128x128 "bitmap"
containers as explicit MXU matmuls, all-ones "run" containers through the
rank-1 U map. Must agree with the oracle and the unpacked XLA engine.
"""
import numpy as np
import pytest

from roaringregex_tpu.api import Pattern
from roaringregex_tpu.oracle.engine import OracleEngine

PATTERNS = ["a{3,1200}", "(ab){10,600}", "x[a-c]{1030,1060}"]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_sparse_pallas_parity(pattern):
    p = Pattern(pattern, backend="pallas")
    assert p.tier == "sparse"
    assert p.engine.backend == "pallas", "partial-block cap too low?"
    orc = OracleEngine(p.program.nfa)
    rng = np.random.default_rng(1)
    texts = ["", "a" * 3, "ab" * 12, "a" * 1200, "ab" * 600, "x" + "abc" * 350]
    for _ in range(6):
        ln = int(rng.integers(0, 80))
        texts.append("".join(rng.choice(list("abxc"), size=ln)))
    fm = p.fullmatch_batch(texts)
    for t, f in zip(texts, fm):
        assert bool(f) == orc.fullmatch(t), (pattern, len(t))
    cnt = p.count_batch(texts)
    for t, c in zip(texts, cnt):
        assert int(c) == len(orc.ends(t)), (pattern, len(t))
    # spans on a moderate text (exercises reverse + anchored rescans)
    t = texts[5][:120]
    assert p.finditer_batch([t])[0] == orc.findall(t), pattern


def test_sparse_cap_falls_back_to_xla(caplog):
    """A structure denser than the VMEM cap falls back to XLA, correctly —
    and loudly (engine logs a warning naming the caps)."""
    import logging

    from roaringregex_tpu.utils.config import get_config, set_config

    base = get_config()
    try:
        # bitband off: the band+rank-1 bit kernels would otherwise absorb
        # this structure without touching the container caps
        set_config(base.with_(sparse_partial_max=8, bitband=False))
        with caplog.at_level(
            logging.WARNING, logger="roaringregex_tpu.engine"
        ):
            # variable-length branches: no counting plan (equal-length
            # bodies like (a|b|c){...} now route to the run-length tier)
            p = Pattern("(ab|c){520,550}", backend="pallas")
    finally:
        set_config(base)
    assert p.tier == "sparse"
    assert p.engine.backend == "xla"
    assert any(
        "sparse" in r.getMessage() and "falling back" in r.getMessage()
        for r in caplog.records
    ), [r.getMessage() for r in caplog.records]
    orc = OracleEngine(p.program.nfa)
    ts = ["a" * 1039, "abc" * 350, "ab" * 520]
    fm = p.fullmatch_batch(ts)
    for t, f in zip(ts, fm):
        assert bool(f) == orc.fullmatch(t), len(t)
