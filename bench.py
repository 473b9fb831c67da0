#!/usr/bin/env python
"""Benchmark harness: scan throughput on the BASELINE.json configs.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": "bytes/sec", "vs_baseline": N}

``vs_baseline`` is measured against the reference engine's strongest
measured number (BASELINE.md: `(cat|dog)*` over 10 MB, u64 tier, -O3 →
28 MB/s on one Xeon core; the reference publishes nothing itself).

Headline metric = config 1: literal+union pattern over a 10 MB ASCII
corpus, word-mask tier, batched many-records scan (count + any + first_end
per record, fully fused on device). Extended per-config results go to
stderr; the single stdout line stays machine-readable for the driver.

Usage:
    python bench.py             # full 10 MB corpus (TPU)
    python bench.py --quick     # 1 MB corpus (CPU smoke)
    python bench.py --all       # run every config, headline = config 1
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_BYTES_PER_SEC = 28e6  # BASELINE.md: (cat|dog)* 10MB -O3 reference


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(total_bytes: int, rec_len: int, seed: int = 0,
                plant=(b"cat", b"dog"), plant_frac: float = 0.125):
    """Synthetic ASCII corpus: lowercase records with match-bearing
    substrings planted so every config exercises real match paths.
    ``plant_frac`` sets the planted-hit record density (per plant word)."""
    rng = np.random.default_rng(seed)
    B = max(1, total_bytes // rec_len)
    data = rng.integers(ord("a"), ord("z") + 1, size=(B, rec_len), dtype=np.uint8)
    for word in plant:
        w = np.frombuffer(word, dtype=np.uint8)
        rows = rng.integers(0, B, size=max(1, int(B * plant_frac)))
        cols = rng.integers(0, max(rec_len - len(w), 1), size=rows.size)
        for r, c in zip(rows, cols):
            data[r, c : c + len(w)] = w
    lengths = np.full(B, rec_len, dtype=np.int32)
    return data, lengths


LAST_INFO = {}  # capture self-check detail of the most recent _sustained()


def _sustained(run_once, nbytes, *, pipeline: int, iters: int = 10,
               max_retries: int = 2, single=None, single_nbytes=None):
    """Median pipelined throughput with a capture self-check.

    ``run_once()`` must dispatch one async scan and return its (unblocked)
    outputs. The sustained rate amortizes the per-call host/tunnel latency
    over ``pipeline`` in-flight scans (the ~20 ms axon tunnel round trip
    per block_until_ready is a sandbox artifact; production streaming
    keeps the device queue full the same way).

    A capture is **anomalous** when the inter-sample coefficient of
    variation exceeds 30% or the pipelined rate gains less than 3x over
    the single-batch rate while single-batch latency is overhead-bound —
    VERDICT r3: one bad capture shipped 2.5 GB/s while the same code
    measured 12+ on the same chip. Anomalous captures are retried up to
    ``max_retries`` times; the best capture is reported and the verdict
    recorded in LAST_INFO (surfaced in the headline JSON).
    """
    import jax

    # single-batch latency: the per-call wall time the reference's driver
    # reports (main.cpp:25-31); on axon it is dominated by the tunnel RTT.
    # ``single`` overrides the measured call (one un-aggregated batch).
    s_once = single or run_once
    s_bytes = single_nbytes or nbytes
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(s_once())
        lats.append(time.perf_counter() - t0)
    single_s = float(np.median(lats))
    single_rate = s_bytes / single_s

    best = None
    for attempt in range(max_retries + 1):
        samples = []
        for _ in range(max(3, iters // 2)):
            t0 = time.perf_counter()
            outs = [run_once() for _ in range(pipeline)]
            jax.block_until_ready(outs)
            t = (time.perf_counter() - t0) / pipeline
            samples.append(nbytes / t)
        med = float(np.median(samples))
        cv = float(np.std(samples) / np.mean(samples))
        gain = med / single_rate
        # low pipeline gain only signals a bad capture when the single
        # batch is overhead-bound (tunnel RTT); a single batch already
        # running >= 1 GB/s is device-bound and gains little by design
        anomalous = cv > 0.30 or (pipeline >= 8 and gain < 3.0
                                  and single_s > 5e-3
                                  and single_rate < 1e9)
        cap = dict(rate=med, cv=round(cv, 3), pipeline_gain=round(gain, 1),
                   single_batch_ms=round(single_s * 1e3, 2),
                   retries=attempt, anomalous=anomalous)
        if best is None or med > best["rate"]:
            best = cap
        if not anomalous:
            best = cap
            break
        log(f"    capture anomaly (cv={cv:.0%}, gain={gain:.1f}x) — "
            f"{'retrying' if attempt < max_retries else 'giving up'}")
    LAST_INFO.clear()
    LAST_INFO.update(best)
    return best["rate"]


def _device_sustained(run, d, l, nbytes, K1: int = 8, K2: int = 32):
    """TRUE on-device sustained rate via a two-point fori_loop delta.

    Runs ``run(d, l)`` K times inside ONE jitted lax.fori_loop (one byte
    of the corpus is rewritten per iteration so XLA cannot hoist the
    loop-invariant scan), synced by fetching the accumulated scalar. The
    (K2 - K1) delta cancels the tunnel round trip AND every host-side
    artifact — on this sandbox block_until_ready can return before work
    executes (buffered transport), so per-dispatch pipelined timing can
    both under- and over-report; the loop delta cannot. Returns
    bytes/sec, or None if the loop fails to build (e.g. shard_map
    inputs)."""
    import jax
    import jax.numpy as jnp

    def mk(K):
        @jax.jit
        def loop(dd0, ll):
            def body(i, carry):
                acc, dd = carry
                mut = ((i % 26) + 97).astype(jnp.uint8)
                dd = jax.lax.dynamic_update_slice(
                    dd,
                    mut.reshape((1,) * dd.ndim),
                    (0,) * dd.ndim,
                )
                outs = run(dd, ll)
                out0 = outs[0] if isinstance(outs, tuple) else outs
                return acc + out0.astype(jnp.float32), dd
            acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), dd0))
            return acc
        return loop

    try:
        l1, l2 = mk(K1), mk(K2)
        float(l1(d, l)); float(l2(d, l))  # compile + flush
        t1 = min(_timed(l1, d, l) for _ in range(2))
        t2 = min(_timed(l2, d, l) for _ in range(2))
    except Exception as e:  # pragma: no cover - geometry/backend dependent
        log(f"    device-loop rate unavailable ({type(e).__name__})")
        return None
    if t2 <= t1:
        return None
    return (K2 - K1) * nbytes / (t2 - t1)


def _timed(fn, d, l):
    t0 = time.perf_counter()
    float(fn(d, l))  # scalar fetch = hard sync through the tunnel
    return time.perf_counter() - t0


def _prefer_device_rate(run, d, l, nbytes, dispatch_bps):
    """Report the device-loop rate when measurable; the pipelined
    dispatch rate stays in the artifact as ``dispatch_gbps``. Flags the
    capture anomalous if the dispatch timing exceeded the true device
    rate by >30% (buffered-transport over-report)."""
    dev = _device_sustained(run, d, l, nbytes)
    if dev is None:
        return dispatch_bps
    LAST_INFO["dispatch_gbps"] = round(dispatch_bps / 1e9, 3)
    LAST_INFO["device_loop"] = True
    LAST_INFO["rate"] = dev
    if dispatch_bps > dev * 1.3:
        LAST_INFO["anomalous"] = True
    log(f"    device-loop sustained: {dev/1e9:.2f} GB/s "
        f"(dispatch-pipelined {dispatch_bps/1e9:.2f})")
    return dev


def _pad_group(data, lengths, G):
    B = data.shape[0]
    Bp = ((B + G - 1) // G) * G
    if Bp != B:
        data = np.concatenate([data, np.zeros((Bp - B, data.shape[1]), np.uint8)])
        lengths = np.concatenate([lengths, np.zeros(Bp - B, np.int32)])
    return data, lengths


def bench_scan(pattern: str, data, lengths, *, iters: int = 10,
               pipeline: int = 96, make=None):
    """Time the fused batched scan (encode + match_stats) end to end.

    Returns (bytes_per_sec, total_matches). Data is placed on device
    before timing; timing brackets block_until_ready.

    When ``make`` (a seed -> (data, lengths) corpus factory) is given and
    the backend is TPU, the stream dispatches AGG **distinct** corpus
    batches per device call (concatenated along the record axis). This is
    the production batching answer to per-dispatch overhead: profiling
    (docs/prof_r4.py) shows a ~1.2 ms serial cost per dispatch through the
    axon tunnel that pipelining cannot overlap, capping 10 MB dispatches
    at ~6-12 GB/s while the same kernel sustains ~24 GB/s on 64+ MB
    dispatches. Each aggregated batch is real, distinct data; throughput
    is total bytes / wall time. Single-batch latency is still measured
    and reported on ONE un-aggregated batch.
    """
    import jax
    import jax.numpy as jnp

    from roaringregex_tpu.compiler.program import compile_program
    from roaringregex_tpu.engine import ScanEngine

    prog = compile_program(pattern)
    agg = 1
    if jax.default_backend() != "tpu":
        pipeline = 2
    elif make is not None:
        agg, pipeline = 8, 24
    engine = ScanEngine(prog)
    G = max(1, prog.G)
    data, lengths = _pad_group(data, lengths, G)
    d = jax.device_put(jnp.asarray(data))
    l = jax.device_put(jnp.asarray(lengths))

    def run(d, l):
        cnt, first, anym = engine.match_stats(d, l, seeded=True)
        return jnp.sum(cnt), jnp.sum(anym.astype(jnp.int32))

    run = jax.jit(run)

    # warmup / compile
    t0 = time.perf_counter()
    total, nrec = jax.block_until_ready(run(d, l))
    compile_s = time.perf_counter() - t0
    log(f"  [{pattern!r} tier={prog.tier} S={prog.n_states} G={prog.G} "
        f"backend={engine.backend}] compile+first run: "
        f"{compile_s:.1f}s, "
        f"matches={int(total)} matched_records={int(nrec)}")
    t0 = time.perf_counter()
    jax.block_until_ready(run(d, l))
    if time.perf_counter() - t0 > 0.05:
        # compute-bound config (e.g. the sparse container kernels):
        # deep pipelining only stretches the wall clock
        pipeline = min(pipeline, 4)

    if agg > 1:
        parts = [(data, lengths)] + [
            _pad_group(*make(seed=i + 1), G) for i in range(agg - 1)
        ]
        da = jax.device_put(jnp.asarray(
            np.concatenate([p[0] for p in parts])))
        la = jax.device_put(jnp.asarray(
            np.concatenate([p[1] for p in parts])))
        nbytes = int(sum(int(p[1].sum()) for p in parts))
        jax.block_until_ready(run(da, la))  # compile the aggregated shape
        bps = _sustained(lambda: run(da, la), nbytes, pipeline=pipeline,
                         iters=iters, single=lambda: run(d, l),
                         single_nbytes=int(lengths.sum()))
        bps = _prefer_device_rate(run, da, la, nbytes, bps)
    else:
        nbytes = int(lengths.sum())
        bps = _sustained(lambda: run(d, l), nbytes, pipeline=pipeline,
                         iters=iters)
        if jax.default_backend() == "tpu":
            bps = _prefer_device_rate(run, d, l, nbytes, bps)
    LAST_INFO["first_compile_s"] = round(compile_s, 2)
    return bps, int(total)


CONFIGS = {
    1: dict(pattern="cat|dog", rec_len=1024, name="literal+union 64-tier"),
    2: dict(pattern="[a-z]+\\.log$", rec_len=256, name="brackets+anchor log lines",
            plant=(b"x" * 250 + b"ab.log",)),  # full record ending in .log
    3: dict(pattern="(ab)*c+d?", rec_len=1024, name="kleene-heavy 256-tier"),
    4: dict(pattern="a{1,300}", rec_len=1024, name="bounded-rep multiblock tier"),
    5: dict(pattern="cat|dog", rec_len=1024, name="sharded-corpus grep (mesh)",
            sharded=True),
    6: dict(pattern=["cat|dog", "[0-9]{3}", "err(or)?", "ab(cd)*e"],
            rec_len=1024, name="multi-pattern grep (4 patterns, 1 pass)",
            multi=True),
    7: dict(pattern="cat|dog", rec_len=1024, name="span extraction (device)",
            spans=True),
    8: dict(pattern="cat|dog", rec_len=0, name="ONE long string (seq-parallel)",
            longstr=True),
    9: dict(pattern="a{1,300}", rec_len=0,
            name="ONE long string, bounded-rep (counting windows)",
            longstr=True),
    # the reference's namesake tier (Parser.cpp:165-168): >1024-state
    # automaton through the roaring-style container kernels. The x...y
    # context blocks the whole-pattern seeded-alias rewrite and the
    # variable-length branches block the counting plan, so the container
    # kernels do the real matching — behind the hyperscan-style
    # prefilter (engine.relaxed_prefilter_program) that compacts
    # candidate records first; RRX_SPARSE_PREFILTER=0 exposes the raw
    # kernels (~0.097 GB/s, compute-bound). no_agg: still container-
    # bound on the candidate batch, so dispatch aggregation only
    # multiplies compile time
    10: dict(pattern="x(ab|c){400,520}y", rec_len=1024,
             name="sparse tier >1024 states (prefilter + containers)",
             no_agg=True, plant=(b"x" + b"ab" * 200 + b"c" * 210 + b"y",)),
    # out-of-core streaming: corpus larger than any single device batch,
    # chunked host->device with `depth` uploads in flight while earlier
    # chunks scan (roaringregex_tpu/stream.py). End-to-end wall time
    # INCLUDING upload; the axon tunnel caps host->device at ~1.4 GB/s,
    # so the overlap efficiency (end_to_end / upload_ceiling) is the
    # honest figure of merit on this sandbox.
    # NB: the axon tunnel's true host->device wire rate is ~20-25 MB/s
    # (block_until_ready returns at local-buffer time; a D2H fence
    # exposes the real rate) — the end-to-end number is wire-bound on
    # this sandbox and the figure of merit is overlap_efficiency
    # (end_to_end / measured wire ceiling), reported in the JSON.
    11: dict(pattern="cat|dog", rec_len=1024,
             name="streamed corpus end-to-end (incl. upload)", stream=True),
    # the cyclic-automaton long-string class (BASELINE config 2 shape,
    # `.*error.*`): rewritten to a bounded-horizon core scan + vector
    # epilogue (ops/longstring.py dotstar_core) instead of the 3x-slower
    # summary+replay mode
    12: dict(pattern=".*(cat|dog).*", rec_len=0,
             name="ONE long string, cyclic .*X.* (rewritten)",
             longstr=True),
    # whole-pattern X{m,n} with a variable-length body: 1501 Glushkov
    # states, but the upper bound is unobservable under seeded semantics
    # (engine._seeded_alias), so it scans as the 6-state (abc|de)+
    13: dict(pattern="(abc|de){1,300}", rec_len=1024,
             name="X{m,n} blowup via seeded alias (1501 -> 6 states)"),
    # genuinely cyclic pattern (no horizon, no rewrite applies):
    # speculative windows with exact validation (falls back to
    # summary+replay when the frontier doesn't converge)
    14: dict(pattern="(ab)*c", rec_len=0,
             name="ONE long string, generic cyclic (speculative windows)",
             longstr=True),
}


def bench_spans(pattern: str, data, lengths, *, iters: int = 6,
                pipeline: int = 96, make=None):
    """Config 7: full lazy span enumeration on device (reverse pass + span
    kernel + compaction), O(1) dispatches per batch. Aggregates distinct
    batches per dispatch on TPU (see bench_scan)."""
    import jax
    import jax.numpy as jnp

    from roaringregex_tpu.compiler.program import compile_program
    from roaringregex_tpu.engine import ScanEngine

    prog = compile_program(pattern)
    agg = 1
    if jax.default_backend() != "tpu":
        pipeline = 2
    elif make is not None:
        agg, pipeline = 8, 24
    engine = ScanEngine(prog)
    assert engine.device_scanner is not None, "span bench needs the pallas backend"
    G = max(1, prog.G)
    data, lengths = _pad_group(data, lengths, G)
    d = jax.device_put(jnp.asarray(data))
    len_g = jax.device_put(jnp.asarray(lengths).reshape(-1, G))
    cap = 32

    def run(d, len_g):
        s, e, cnt = engine.device_scanner.lazy_spans_b(d, len_g, cap=cap)
        return jnp.sum(cnt), jnp.max(cnt)

    run = jax.jit(run)
    t0 = time.perf_counter()
    total, mx = jax.block_until_ready(run(d, len_g))
    assert int(mx) <= cap, "span cap overflow in bench corpus"
    log(f"  [spans {pattern!r} cap={cap}] compile+first: "
        f"{time.perf_counter()-t0:.1f}s, spans={int(total)}")
    if agg > 1:
        parts = [(data, lengths)] + [
            _pad_group(*make(seed=i + 1), G) for i in range(agg - 1)
        ]
        da = jax.device_put(jnp.asarray(
            np.concatenate([p[0] for p in parts])))
        la = jax.device_put(jnp.asarray(
            np.concatenate([p[1] for p in parts]).reshape(-1, G)))
        nbytes = int(sum(int(p[1].sum()) for p in parts))
        jax.block_until_ready(run(da, la))
        bps = _sustained(lambda: run(da, la), nbytes, pipeline=pipeline,
                         iters=iters, single=lambda: run(d, len_g),
                         single_nbytes=int(lengths.sum()))
        bps = _prefer_device_rate(run, da, la, nbytes, bps)
    else:
        bps = _sustained(lambda: run(d, len_g), int(lengths.sum()),
                         pipeline=pipeline, iters=iters)
    # greedy (POSIX leftmost-longest) rate on the same batch: the SWAR
    # anchored-rescan rounds should keep it within ~15% of lazy
    # (VERDICT r4 #6's done-criterion); recorded alongside, the lazy
    # number stays the config's headline
    info = dict(LAST_INFO)

    def run_g(d, len_g):
        s, e, cnt, over = engine.device_scanner.greedy_spans_b(
            d, len_g, cap=cap
        )
        return jnp.sum(cnt), jnp.max(cnt)

    run_g = jax.jit(run_g)
    jax.block_until_ready(run_g(d, len_g))
    if jax.default_backend() == "tpu":
        g_bps = _device_sustained(run_g, d, len_g, int(lengths.sum()))
    else:
        g_bps = _sustained(lambda: run_g(d, len_g), int(lengths.sum()),
                           pipeline=pipeline, iters=max(3, iters // 2))
    info["greedy_gbps"] = round(g_bps / 1e9, 3)
    info["greedy_vs_lazy"] = round(g_bps / max(bps, 1), 3)
    LAST_INFO.clear()
    LAST_INFO.update(info)
    log(f"  [spans greedy] {g_bps/1e9:.2f} GB/s "
        f"({g_bps/max(bps,1):.0%} of lazy)")
    return bps, int(total)


def bench_multi(patterns, data, lengths, *, iters: int = 6,
                pipeline: int = 64, make=None):
    """Config 6: P patterns in one combined-automaton pass. Aggregates
    distinct batches per dispatch on TPU (see bench_scan)."""
    import jax
    import jax.numpy as jnp

    from roaringregex_tpu.api import MultiPattern

    agg = 1
    if jax.default_backend() != "tpu":
        pipeline = 2
    elif make is not None:
        agg, pipeline = 8, 24
    mp = MultiPattern(patterns)
    prog = mp.program
    G = max(1, prog.G)
    data, lengths = _pad_group(data, lengths, G)
    d = jax.device_put(jnp.asarray(data))
    l = jax.device_put(jnp.asarray(lengths))

    def run(d, l):
        cnt, first, anym = mp.engine.match_stats(d, l, seeded=True)
        return jnp.sum(cnt), jnp.sum(anym.astype(jnp.int32))

    run = jax.jit(run)
    t0 = time.perf_counter()
    total, nch = jax.block_until_ready(run(d, l))
    log(f"  [multi x{len(patterns)} tier={prog.tier} S={prog.n_states} "
        f"G={prog.G} backend={mp.engine.backend}] compile+first: "
        f"{time.perf_counter()-t0:.1f}s, matches={int(total)}")
    if agg > 1:
        parts = [(data, lengths)] + [
            _pad_group(*make(seed=i + 1), G) for i in range(agg - 1)
        ]
        da = jax.device_put(jnp.asarray(
            np.concatenate([p[0] for p in parts])))
        la = jax.device_put(jnp.asarray(
            np.concatenate([p[1] for p in parts])))
        nbytes = int(sum(int(p[1].sum()) for p in parts))
        jax.block_until_ready(run(da, la))
        bps = _sustained(lambda: run(da, la), nbytes, pipeline=pipeline,
                         iters=iters, single=lambda: run(d, l),
                         single_nbytes=int(lengths.sum()))
        bps = _prefer_device_rate(run, da, la, nbytes, bps)
    else:
        bps = _sustained(lambda: run(d, l), int(lengths.sum()),
                         pipeline=pipeline, iters=iters)
    return bps, int(total)


def bench_longstr(pattern: str, data, lengths, *, iters: int = 6):
    """Config 8: sequence parallelism — ONE long string split across
    kernel windows (the reference is strictly sequential here,
    regex.h:157). Uses the data as one flat byte stream."""
    import jax
    import jax.numpy as jnp

    from roaringregex_tpu.compiler.program import compile_program
    from roaringregex_tpu.ops.longstring import make_long_scanner

    import jax as _jax

    text = np.ascontiguousarray(data).reshape(-1)
    if _jax.default_backend() == "tpu" and len(text) < (128 << 20):
        # BASELINE long-string rows are defined on a 128 MB string —
        # short strings underfill the window batch and understate the
        # sustained rate
        reps = -(-(128 << 20) // len(text))
        text = np.tile(text, reps)[: 128 << 20]
    # plant a couple of matches so the count is nonzero
    text[len(text) // 3 : len(text) // 3 + 3] = np.frombuffer(b"cat", np.uint8)
    n = len(text)
    prog = compile_program(pattern)
    sc = make_long_scanner(prog)
    mode = {
        "FastLongScanner": (
            "overlapped" if getattr(sc, "overlap", None) is not None
            else "speculative+summary-fallback"
        ),
        "CountLongScanner": "counting",
        "DotStarLongScanner": "dotstar-rewrite",
        "AliasLongScanner": "seeded-alias",
    }.get(type(sc).__name__, "portable")
    d = jax.device_put(jnp.asarray(text))
    t0 = time.perf_counter()
    total = int(sc.count_ends(d))
    log(f"  [longstr n={n} mode={mode}] compile+first: "
        f"{time.perf_counter()-t0:.1f}s, matches={total}")
    pipeline = 16 if jax.default_backend() == "tpu" else 2
    run = sc._run if hasattr(sc, "_run") else (
        lambda dd, s, m: sc.count_ends(dd)
    )
    bps = _sustained(lambda: run(d, True, "count"), n, pipeline=pipeline,
                     iters=iters)
    if jax.default_backend() == "tpu" and hasattr(sc, "_run"):
        runl = lambda dd, _ll: sc._run(dd, True, "count")  # noqa: E731
        if (
            type(sc).__name__ == "FastLongScanner"
            and getattr(sc, "overlap", None) is None
        ):
            from roaringregex_tpu.utils.config import get_config

            W = get_config().spec_warmup
            if W:
                # speculative path: loop the fused stats+exit kernel
                # (the per-call validation sync in _run would serialize
                # the fori loop); the verdict was checked once above
                runl = lambda dd, _ll: sc._spec_impl(  # noqa: E731
                    dd, n=n, mode="count", W=W
                )
        bps = _prefer_device_rate(runl, d, jnp.zeros(1, jnp.int32), n, bps)
    return bps, total


def bench_stream(pattern: str, *, total_bytes: int, rec_len: int = 1024):
    """Config 11: out-of-core streamed scan, wall-clocked end to end
    INCLUDING host->device upload. Chunks are distinct 64 MB corpora
    pre-generated in host RAM (so corpus synthesis isn't timed), streamed
    through StreamScanner's depth-3 pipeline. Also measures the raw
    device_put ceiling for the overlap-efficiency figure."""
    import jax

    from roaringregex_tpu.stream import StreamScanner

    chunk_mb = 64
    n_chunks = max(2, total_bytes // (chunk_mb << 20))
    rng = np.random.default_rng(3)
    # distinct chunks (content differs) without n_chunks x 64 MB host RAM:
    # a base pool of 4 corpora cycled with per-chunk byte rolls
    pool = [make_corpus(chunk_mb << 20, rec_len, seed=s)[0] for s in range(4)]
    lens = np.full(pool[0].shape[0], rec_len, np.int32)
    nbytes_chunk = int(lens.sum())

    # TRUE upload ceiling: on the axon tunnel block_until_ready returns
    # once the transfer is locally buffered, not when bytes reach the
    # device — a tiny D2H fence forces the flush and exposes the real
    # wire rate (~20 MB/s here; PCIe-class on a real TPU host). The
    # end-to-end streamed rate can never beat this number.
    tiny = jax.device_put(np.zeros(4, np.int32)); np.asarray(tiny)
    d = jax.device_put(pool[0]); d.block_until_ready()
    np.asarray(tiny)
    t0 = time.perf_counter()
    for p in pool[:2]:
        jax.device_put(p).block_until_ready()
    np.asarray(tiny)  # flush fence
    up_bps = 2 * nbytes_chunk / (time.perf_counter() - t0)

    sc = StreamScanner(pattern, depth=3)
    # compile the chunk shape outside the timed window — fetch-free
    # (any device->host fetch here would poison the tunnel's upload
    # bandwidth for the timed stream below; see stream.py)
    fn = sc._stats_fn()
    jax.block_until_ready(fn(jax.device_put(pool[0]), jax.device_put(lens)))
    log(f"  [stream {pattern!r} chunk={chunk_mb}MB x{n_chunks}] compiled; "
        f"upload ceiling {up_bps/1e9:.2f} GB/s")

    def chunks():
        for i in range(n_chunks):
            yield pool[i % len(pool)], lens

    t0 = time.perf_counter()
    st = sc.stats_stream(chunks())
    dt = time.perf_counter() - t0
    bps = st.bytes / dt
    # device-side scan rate of the SAME per-chunk program on resident
    # data: the number behind "on a PCIe host this pipeline is
    # scan-bound" (end-to-end = min(wire, this))
    scan_bps = _device_sustained(
        lambda dd, ll: fn(dd, ll).sum(), jax.device_put(pool[0]),
        jax.device_put(lens), nbytes_chunk,
    )
    LAST_INFO.clear()
    LAST_INFO.update(dict(
        rate=bps, single_batch_ms=round(dt * 1e3 / max(st.chunks, 1), 2),
        cv=0.0, pipeline_gain=round(bps / max(up_bps, 1) , 2),
        retries=0, anomalous=False,
        upload_ceiling_gbps=round(up_bps / 1e9, 3),
        overlap_efficiency=round(bps / up_bps, 3),
        scan_gbps_resident=round(scan_bps / 1e9, 3),
    ))
    log(f"  [stream] {st.bytes/1e9:.2f} GB in {dt:.1f}s end-to-end "
        f"({bps/1e9:.2f} GB/s; {st.matches} matches; "
        f"overlap eff {bps/up_bps:.0%} of upload ceiling)")
    return bps, st.matches


def bench_sharded(pattern: str, data, lengths, *, iters: int = 6,
                  pipeline: int = 96, make=None):
    """Config 5: DistScanner over the full device mesh (tables replicated,
    records sharded, stats psum-reduced). On this 1-chip environment the
    mesh has a single device; the multi-chip path itself is validated by
    __graft_entry__.dryrun_multichip on a virtual mesh. Aggregates
    distinct batches per dispatch on TPU like bench_scan — the sharded
    path must pay the same per-dispatch overhead as config 1, not more
    (VERDICT r3 #7: one-device shard_map overhead)."""
    import jax

    from roaringregex_tpu.compiler.program import compile_program
    from roaringregex_tpu.parallel import DistScanner, make_mesh, shard_batch

    agg = 1
    if jax.default_backend() != "tpu":
        pipeline = 2
    elif make is not None:
        agg, pipeline = 8, 24
    prog = compile_program(pattern)
    mesh = make_mesh()
    scanner = DistScanner(prog, mesh)
    D = mesh.devices.size

    def clip(dl):
        da, la = dl
        B = (da.shape[0] // D) * D
        return da[:B], la[:B]

    data, lengths = clip((data, lengths))
    d, l = shard_batch(mesh, data, lengths)
    run = jax.jit(scanner.global_stats, static_argnames=("seeded",))
    t0 = time.perf_counter()
    total, nrec, nbytes = jax.block_until_ready(run(d, l, seeded=True))
    log(f"  [config5 mesh={D}dev] compile+first: {time.perf_counter()-t0:.1f}s, "
        f"matches={int(total)} records={int(nrec)}")
    if agg > 1:
        parts = [(data, lengths)] + [clip(make(seed=i + 1))
                                     for i in range(agg - 1)]
        da, la = shard_batch(
            mesh,
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
        nb = int(sum(int(p[1].sum()) for p in parts))
        jax.block_until_ready(run(da, la, seeded=True))
        bps = _sustained(lambda: run(da, la, seeded=True), nb,
                         pipeline=pipeline, iters=iters,
                         single=lambda: run(d, l, seeded=True),
                         single_nbytes=int(lengths.sum()))
        bps = _prefer_device_rate(
            lambda dd, ll: run(dd, ll, seeded=True), da, la, nb, bps
        )
    else:
        nb = int(lengths.sum())
        bps = _sustained(lambda: run(d, l, seeded=True), nb,
                         pipeline=pipeline, iters=iters)
    return bps, int(total)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="1MB corpus, CPU ok")
    ap.add_argument("--all", action="store_true", help="run all configs")
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--bytes", type=int, default=None)
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even where a sitecustomize pins jax_platforms
        # (the axon sandbox) — same escape hatch as the CLI
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax

    total_bytes = args.bytes or (1_000_000 if args.quick else 10_000_000)
    # backend-init watchdog: the axon tunnel can wedge (a killed client's
    # session lock is never released server-side) and jax.devices() then
    # blocks in a connect-retry loop forever. Emit an honest artifact and
    # exit instead of hanging the driver. Normal init is ~5 s; the
    # timeout is generous (RRX_BENCH_INIT_TIMEOUT seconds, default 900).
    import threading

    init_done = threading.Event()

    def _watchdog():
        t = int(os.environ.get("RRX_BENCH_INIT_TIMEOUT", "900"))
        if not init_done.wait(t):
            log(f"bench: backend init exceeded {t}s — TPU tunnel "
                "unavailable; emitting a zero artifact")
            print(json.dumps(dict(
                metric="scan_throughput_config1_literal_union",
                value=0.0, unit="bytes/sec", vs_baseline=0.0,
                error="TPU backend init timeout (tunnel unavailable)",
            )), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    init_done.set()

    results = {}
    infos = {}
    cfgs = sorted(CONFIGS) if args.all else [args.config]
    for ci in cfgs:
        cfg = CONFIGS[ci]
        mk = lambda seed=0: make_corpus(
            total_bytes, cfg["rec_len"] or 1024, seed=seed,
            plant=cfg.get("plant", (b"cat", b"dog")),
        )
        data, lengths = mk()
        try:
            if cfg.get("stream"):
                # >= 1 GB streamed on TPU; scaled down for CPU smoke
                sb = (1 << 30) if jax.default_backend() == "tpu" else (1 << 27)
                bps, total = bench_stream(
                    cfg["pattern"],
                    total_bytes=args.bytes or sb,
                    rec_len=cfg["rec_len"],
                )
            elif cfg.get("longstr"):
                bps, total = bench_longstr(cfg["pattern"], data, lengths)
            elif cfg.get("sharded"):
                bps, total = bench_sharded(cfg["pattern"], data, lengths,
                                           make=mk)
            elif cfg.get("multi"):
                bps, total = bench_multi(cfg["pattern"], data, lengths,
                                         make=mk)
            elif cfg.get("spans"):
                bps, total = bench_spans(cfg["pattern"], data, lengths,
                                         make=mk)
            else:
                bps, total = bench_scan(
                    cfg["pattern"], data, lengths,
                    make=None if cfg.get("no_agg") else mk,
                )
        except (AssertionError, NotImplementedError) as e:
            # e.g. config 7 needs the device span kernels (TPU pallas);
            # keep --all usable on CPU-only environments
            log(f"config {ci} ({cfg['name']}): skipped ({e})")
            continue
        results[ci] = bps
        infos[ci] = dict(LAST_INFO)
        if (
            ci == 10
            and jax.default_backend() == "tpu"
            and os.environ.get("RRX_SPARSE_PREFILTER", "1") != "0"
        ):
            # hit-density sweep: the prefilter's leverage scales with hit
            # sparsity (VERDICT r4 #2 asked for the curve, not one point)
            sweep = {"0.125": round(bps / 1e9, 3)}
            for frac in (0.01, 0.001):
                d2, l2 = make_corpus(
                    total_bytes, cfg["rec_len"] or 1024, seed=5,
                    plant=cfg.get("plant"), plant_frac=frac,
                )
                b2, _ = bench_scan(cfg["pattern"], d2, l2, iters=6,
                                   make=None)
                sweep[str(frac)] = round(b2 / 1e9, 3)
            infos[ci]["density_sweep_gbps"] = sweep
            log(f"config 10 density sweep: {sweep}")
        sc = infos[ci]
        log(f"config {ci} ({cfg['name']}): {bps/1e9:.3f} GB/s "
            f"(single-batch {sc.get('single_batch_ms', '?')} ms, "
            f"cv={sc.get('cv', '?')}, gain={sc.get('pipeline_gain', '?')}x"
            f"{', ANOMALOUS' if sc.get('anomalous') else ''})")

    if args.all and results:
        # machine-readable per-config artifact (stderr is human-facing)
        rows = {
            str(ci): dict(
                name=CONFIGS[ci]["name"],
                pattern=CONFIGS[ci]["pattern"],
                gbps=round(results[ci] / 1e9, 3),
                **{k: v for k, v in infos[ci].items() if k != "rate"},
            )
            for ci in results
        }
        with open("BENCHALL.json", "w") as f:
            json.dump(rows, f, indent=1)
        log("per-config artifact written to BENCHALL.json")

    hc = 1 if 1 in results else cfgs[0]
    headline = results[hc]
    info = infos.get(hc, {})
    out = {
        "metric": f"scan_throughput_config{hc}_"
        + CONFIGS[hc]["name"].split()[0].replace("+", "_"),
        "value": round(headline, 1),
        "unit": "bytes/sec",
        "vs_baseline": round(headline / BASELINE_BYTES_PER_SEC, 2),
    }
    # capture self-check (VERDICT r3: a bad capture must be visible in the
    # artifact, not shipped silently): single-batch latency as the
    # reference-style per-call number, sample variance, overlap gain
    for k in ("single_batch_ms", "cv", "pipeline_gain", "retries",
              "anomalous", "device_loop", "dispatch_gbps",
              "upload_ceiling_gbps", "overlap_efficiency"):
        if k in info:
            out[k] = info[k]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
