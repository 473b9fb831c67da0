"""Bit-packed band+rank-1+triangle sparse kernels (ops/scan_bitband.py).

The sparse tier's production path on decomposable structure: u32
shift/AND/OR VPU kernels instead of per-container MXU matmuls. Parity is
checked three ways: against the oracle, against the container kernels
(RRX_BITBAND=0 A/B), and on the span/reverse primitives.
"""
import numpy as np
import pytest

from roaringregex_tpu.api import Pattern
from roaringregex_tpu.oracle.engine import OracleEngine
from roaringregex_tpu.utils.config import get_config, set_config


@pytest.fixture
def sparse_cfg():
    """Force the raw sparse kernels: no seeded alias, no prefilter, and a
    low dense_max so moderately sized test patterns hit the sparse tier
    (CPU interpret mode cannot afford 1500-state automata per case)."""
    base = get_config()
    set_config(
        base.with_(seeded_alias=False, sparse_prefilter=False, dense_max=256)
    )
    yield
    set_config(base)


# (pattern, alphabet) — all >256 states under dense_max=256, each shaped
# to exercise one decomposition branch: pure band, band+triangle,
# triangle with multiple families, rank-1 loop-backs
CASES = [
    ("x[a-c]{280,300}", "xabc"),  # 1 diag + 1-family triangle
    ("x(ab|c){100,120}y", "xabcy"),  # 4 diags + 2-family triangle
    ("a{300}", "ab"),  # pure band, no residual
    ("(ab|cde){80,100}f", "abcdef"),  # mixed-length bodies, wider band
    ("x(ab|c){120,}", "xabc"),  # {m,}: loop-back rank-1 columns
]


def _texts(pattern, alpha, rng, n=8):
    ts = [
        "",
        "x" + "ab" * 60 + "c" * 20 + "y",
        "x" + "c" * 110 + "y",
        "ab" * 150,
        "a" * 300,
        "x" + "abc" * 100,
        "cde" * 40 + "ab" * 50 + "f",
    ]
    for _ in range(n):
        ln = int(rng.integers(0, 500))
        ts.append("".join(rng.choice(list(alpha), size=ln)))
    return ts


@pytest.mark.parametrize("pattern,alpha", CASES)
def test_bitband_oracle_parity(pattern, alpha, sparse_cfg):
    from roaringregex_tpu.ops.scan_bitband import BitbandScanner

    p = Pattern(pattern, backend="pallas")
    assert p.tier == "sparse", p.program.n_states
    if not isinstance(p.engine.device_scanner, BitbandScanner):
        pytest.skip("structure not decomposable (or counting tier)")
    orc = OracleEngine(p.program.nfa)
    rng = np.random.default_rng(7)
    texts = _texts(pattern, alpha, rng)
    cnt = p.count_batch(texts)
    fm = p.fullmatch_batch(texts)
    for t, c, f in zip(texts, cnt, fm):
        assert int(c) == len(orc.ends(t)), (pattern, len(t))
        assert bool(f) == orc.fullmatch(t), (pattern, len(t))
    # spans: lazy + greedy on a text with real matches
    t = texts[1][:400]
    assert p.finditer_batch([t])[0] == orc.findall(t), pattern
    assert p.finditer_batch([t], longest=True)[0] == orc.findall(
        t, longest=True
    ), pattern


def test_bitband_vs_container_ab(sparse_cfg):
    """RRX_BITBAND=0 A/B: the container kernels and the bit kernels are
    the same function."""
    pat = "x(ab|c){100,120}y"
    rng = np.random.default_rng(11)
    texts = _texts(pat, "xabcy", rng, n=6)
    p1 = Pattern(pat, backend="pallas")
    c1 = [int(x) for x in p1.count_batch(texts)]
    f1 = [bool(x) for x in p1.fullmatch_batch(texts)]
    base = get_config()
    set_config(base.with_(bitband=False))
    try:
        p0 = Pattern(pat, backend="pallas")
        from roaringregex_tpu.ops.scan_bitband import BitbandScanner
        from roaringregex_tpu.ops.scan_pallas import SparseScanner

        assert isinstance(p1.engine.device_scanner, BitbandScanner)
        assert type(p0.engine.device_scanner) is SparseScanner
        assert c1 == [int(x) for x in p0.count_batch(texts)]
        assert f1 == [bool(x) for x in p0.fullmatch_batch(texts)]
    finally:
        set_config(base)


def test_bitband_spec_structure(sparse_cfg):
    """The decomposition finds the expected shape on the config-10 class
    and stays exact (verified edge cover)."""
    from roaringregex_tpu.compiler.program import compile_program
    from roaringregex_tpu.ops.scan_bitband import (
        _tri_structure,
        bitband_spec,
    )

    prog = compile_program("x(ab|c){100,120}y")
    spec = bitband_spec(prog)
    assert spec is not None
    assert spec.diags == (1, 2, 3, 4)
    assert spec.tri_gaps  # the optional-tail skip triangle
    # exact cover: every follow edge is reproduced by some component
    e = prog.nfa.get_edges()
    F = prog.nfa.follow_matrix
    covered = np.zeros_like(F)
    src, dst = e[:, 0].astype(int), e[:, 1].astype(int)
    for d in spec.diags:
        on = dst - src == d
        covered[src[on], dst[on]] = 1
    for (w, b) in spec.rank1:
        covered[:, w * 32 + b] = np.maximum(
            covered[:, w * 32 + b], F[:, w * 32 + b]
        )
    E, fams = _tri_structure(prog, spec)
    for g, cols in fams.items():
        for p in cols:
            q = E[E < p - g]
            assert F[q, p].all(), "triangle lights a non-edge"
            covered[q, p] = 1
    assert (covered >= F).all(), "decomposition misses edges"


def test_bitband_fuzz_vs_oracle(sparse_cfg):
    """Randomized {m,n} patterns with random context, counts vs oracle."""
    rng = np.random.default_rng(23)
    bodies = ["(ab|c)", "[a-d]", "(ab|cd|e)", "(abc|d)"]
    for trial in range(6):
        body = bodies[trial % len(bodies)]
        m = int(rng.integers(60, 120))
        n = m + int(rng.integers(5, 40))
        pre = rng.choice(["x", "", "xy"])
        post = rng.choice(["y", "", "z"])
        pat = f"{pre}{body}{{{m},{n}}}{post}"
        p = Pattern(pat, backend="pallas")
        if p.tier != "sparse":
            continue
        orc = OracleEngine(p.program.nfa)
        texts = []
        for _ in range(6):
            ln = int(rng.integers(0, 420))
            texts.append(
                "".join(rng.choice(list("abcdexyz"), size=ln))
            )
        # plant a guaranteed hit
        texts.append(str(pre) + "ab" * n + str(post))
        cnt = p.count_batch(texts)
        for t, c in zip(texts, cnt):
            assert int(c) == len(orc.ends(t)), (pat, len(t))


def test_bitband_multiblock_tier():
    """256 < S <= 1024 context-wrapped {m,n} patterns (the container-
    favored multiblock family) route to the bit kernels too."""
    from roaringregex_tpu.ops.scan_bitband import BitbandScanner

    base = get_config()
    set_config(base.with_(seeded_alias=False))
    try:
        p = Pattern("x(ab|c){100,120}y", backend="pallas")
        assert p.tier == "multiblock"
        assert isinstance(p.engine.device_scanner, BitbandScanner)
        orc = OracleEngine(p.program.nfa)
        rng = np.random.default_rng(17)
        texts = ["x" + "ab" * 50 + "c" * 15 + "y", ""]
        for _ in range(6):
            ln = int(rng.integers(0, 400))
            texts.append("".join(rng.choice(list("xabcy"), size=ln)))
        cnt = p.count_batch(texts)
        fm = p.fullmatch_batch(texts)
        for t, c, f in zip(texts, cnt, fm):
            assert int(c) == len(orc.ends(t)), len(t)
            assert bool(f) == orc.fullmatch(t), len(t)
        t = texts[0][:300]
        assert p.finditer_batch([t])[0] == orc.findall(t)
    finally:
        set_config(base)
