"""Framework configuration (SURVEY.md §5 "config/flag system" row).

The reference hard-codes every constant (tier cut-offs Parser.cpp:165-168,
0x80 alphabet bound NFA.cc:25, arena rows regex.h:34) and its README
complains they aren't tweakable (README.md:57). Here the knobs live in one
dataclass, overridable programmatically (``set_config``) or via environment
variables (``RRX_*``) so multi-host launches configure workers uniformly.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from typing import Optional


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


@dataclass(frozen=True)
class RrxConfig:
    # backend: None = auto (pallas on TPU, packed elsewhere, xla fallback)
    backend: Optional[str] = field(
        default_factory=lambda: os.environ.get("RRX_BACKEND") or None
    )
    # compiled-program cache directory (content-addressed .npz)
    cache_dir: Optional[str] = field(
        default_factory=lambda: os.environ.get("RRX_CACHE_DIR") or None
    )
    # largest state count with fully dense device tables (tier cut-off)
    dense_max: int = field(default_factory=lambda: _env_int("RRX_DENSE_MAX", 1024))
    # kernel geometry caps (scan_pallas)
    b_blk_max: int = field(default_factory=lambda: _env_int("RRX_B_BLK", 8192))
    t_chunk_max: int = field(default_factory=lambda: _env_int("RRX_T_CHUNK", 128))
    # byte-slab unroll (steps per fori iteration in the fused byte kernels);
    # 0 = auto (fill the 32-sublane int8 tile, capped at 8)
    slab_r: int = field(default_factory=lambda: _env_int("RRX_SLAB_R", 0))
    # long-string mode block length
    long_block: int = field(default_factory=lambda: _env_int("RRX_LONG_BLOCK", 4096))
    # short-record chaining: pack K records per scan lane along the time
    # axis (stream = K x (BOS|bytes|EOS|guard) segments) so per-kernel-block
    # fixed costs amortize over ~chain_target steps. 0 (default) = off:
    # on v5e the equal-block batch geometry already amortizes well and
    # chaining's segment-routing tax usually outweighs the win (measured
    # medians: L=128 +7%, L<=64 and L=256 negative); the knob exists for
    # workloads/parts where per-block fixed costs dominate.
    chain_target: int = field(
        default_factory=lambda: _env_int("RRX_CHAIN_TARGET", 0)
    )
    # windowed batch scan: split long records into overlapped windows
    # until the batch is ~this many kernel columns wide (exact for
    # bounded-horizon anchor-free non-nullable patterns; engine
    # _window_plan). 0 (default) = off: on v5e the XLA window-gather that
    # widens the batch costs more than the wider kernel saves (measured
    # interleaved medians at 10 MB x 1024 B records: 7.9 vs 9.8 GB/s);
    # the knob exists for parts/geometries where batch lanes are the
    # binding constraint.
    window_cols: int = field(
        default_factory=lambda: _env_int("RRX_WINDOW_COLS", 0)
    )
    # SWAR bit-packed fast path for s_tile == 8 programs (ops/scan_swar.py)
    # on/off; RRX_SWAR=0 restores the matmul kernels for A/B diagnosis
    swar: bool = field(
        default_factory=lambda: os.environ.get("RRX_SWAR", "1") != "0"
    )
    # SWAR tall-narrow window target (ops/scan_swar.py): split long
    # records into overlapped windows until the batch is ~this many
    # 32-record kernel columns wide (exact for bounded-horizon
    # anchor-free non-nullable patterns); 0 = never window
    swar_window_cols: int = field(
        default_factory=lambda: _env_int("RRX_SWAR_WINDOW_COLS", 1024)
    )
    # slab-composed stepping in the SWAR/word kernels (the per-step
    # bit-linear maps compose across an 8-byte slab OFF the carry chain,
    # collapsing the per-slab dependent chain to one shift/AND fan-in);
    # RRX_SWAR_COMPOSE=0 restores per-byte stepping for A/B diagnosis
    swar_compose: bool = field(
        default_factory=lambda: os.environ.get("RRX_SWAR_COMPOSE", "1")
        != "0"
    )
    # slotted multi-pattern SWAR (4 patterns x 4 records per u32,
    # ops/scan_swar.SwarMultiScanner). Default OFF: the merged spec's
    # gate/positioning mask algebra runs ~3.7x slower than the u32 word
    # tier's per-channel accept bit-logs on the BENCHALL config-6 grep
    # (4.1 vs 15.2 GB/s, r5 TPU capture) — the per-slab positioned-mask
    # construction pays sum-of-patterns gate work that the word tier's
    # int32 byte-plane compares avoid. RRX_SWAR_MULTI=1 re-enables for
    # A/B diagnosis
    swar_multi: bool = field(
        default_factory=lambda: os.environ.get("RRX_SWAR_MULTI", "0")
        == "1"
    )
    # slab-composed run-length stepping in the counting-tier kernels
    # (8-byte slabs with within-slab prefix/trailing-run scans). Default
    # OFF: the TPU A/B measured 49.1 -> 32.5 GB/s on config 4 — the
    # per-byte int32 chain is already software-pipelined across
    # iterations by Mosaic, and the slab form's extra within-slab scans
    # cost more issue slots than the chain links they remove (same
    # verdict as the SWAR compose budget below). RRX_COUNT_SLAB=1
    # re-enables for A/B diagnosis
    count_slab: bool = field(
        default_factory=lambda: os.environ.get("RRX_COUNT_SLAB", "0")
        == "1"
    )
    # multi-diagonal composition budget: compose only when the static
    # apply-term count across the slab (scan_swar.compose_cost) stays
    # under this bound. Measured (r5 TPU A/B): cost 11 (cat|dog) +1.3%,
    # cost 43 ([a-z]+\.log$) +1.6%, cost 92 ((ab)*c+d?) -15% — Mosaic
    # already pipelines the per-byte chain across slabs, so past ~48
    # terms the off-chain mask algebra costs more VPU throughput than
    # the chain latency it removes
    swar_compose_terms: int = field(
        default_factory=lambda: _env_int("RRX_SWAR_COMPOSE_TERMS", 48)
    )
    # banded follow matrices (bounded-repetition chains): apply F^T as
    # <= this many diagonal shift+multiply VPU ops instead of the dense
    # lanes^2 MXU matmul; 0 disables the banded kernels
    banded_max_diags: int = field(
        default_factory=lambda: _env_int("RRX_BANDED_MAX_DIAGS", 8)
    )
    # speculative long-string windows for cyclic patterns: warmup steps
    # used to guess window entry states, validated exactly (exit_w ==
    # entry_{w+1}; see FastLongScanner._spec_impl). 0 disables — every
    # cyclic scan then takes the summary+replay mode
    spec_warmup: int = field(
        default_factory=lambda: _env_int("RRX_SPEC_WARMUP", 512)
    )
    # seeded-alias rewrite for whole-pattern X{m,n} on the big-automaton
    # tiers (engine._seeded_alias: the upper bound is unobservable under
    # seeded semantics, so X{m,n} scans as X{m,}); RRX_ALIAS=0 keeps the
    # original automaton on every path for A/B diagnosis
    seeded_alias: bool = field(
        default_factory=lambda: os.environ.get("RRX_ALIAS", "1") != "0"
    )
    # bit-packed band+rank-1 sparse kernels (ops/scan_bitband.py): when a
    # >1024-state follow matrix decomposes into <= bitband_max_diags
    # diagonals after peeling <= bitband_max_rank1 heavy columns, the scan
    # runs as u32 shift/AND/OR VPU ops instead of per-container MXU
    # matmuls; RRX_BITBAND=0 restores the container kernels for A/B
    bitband: bool = field(
        default_factory=lambda: os.environ.get("RRX_BITBAND", "1") != "0"
    )
    bitband_max_diags: int = field(
        default_factory=lambda: _env_int("RRX_BITBAND_MAX_DIAGS", 16)
    )
    bitband_max_rank1: int = field(
        default_factory=lambda: _env_int("RRX_BITBAND_MAX_RANK1", 16)
    )
    # hyperscan-style prefilter for the sparse container tier: scan a
    # tiny superset-language program first and run the container kernels
    # only on compacted candidate records (engine.relaxed_prefilter_program)
    sparse_prefilter: bool = field(
        default_factory=lambda: os.environ.get("RRX_SPARSE_PREFILTER", "1")
        != "0"
    )
    # sparse-tier VMEM caps (partial containers / lane width)
    sparse_partial_max: int = field(
        default_factory=lambda: _env_int("RRX_SPARSE_PARTIAL_MAX", 120)
    )
    sparse_lanes_max: int = field(
        default_factory=lambda: _env_int("RRX_SPARSE_LANES_MAX", 4096)
    )
    # native host runtime (C++ compiler/packer) on/off
    native: bool = field(
        default_factory=lambda: os.environ.get("RRX_NATIVE", "1") != "0"
    )
    # persistent XLA compilation cache (helps multi-process bench/CLI runs;
    # pallas Mosaic kernels may bypass it depending on the compile path)
    compile_cache_dir: Optional[str] = field(
        default_factory=lambda: os.environ.get(
            "RRX_COMPILE_CACHE", os.path.expanduser("~/.cache/rrx_jax")
        )
        or None
    )

    def with_(self, **kw) -> "RrxConfig":
        return replace(self, **kw)


_config: RrxConfig = RrxConfig()


def get_config() -> RrxConfig:
    return _config


def set_config(cfg: RrxConfig) -> RrxConfig:
    global _config
    _config = cfg
    return _config
