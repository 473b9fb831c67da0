"""Out-of-core corpus streaming: chunked host→device double-buffered scan.

BASELINE config 5 specifies a 10 GB corpus; one v5e chip has 16 GB of
HBM and a corpus need not fit at all. The reference streams stdin one
line at a time (src/test/main.cpp:17-20); the TPU-native equivalent is a
**pipelined chunk stream**: fixed-shape record batches are device_put
asynchronously with up to ``depth`` chunks in flight while earlier
chunks' scans drain on device, so wall time approaches
``max(upload_time, scan_time)`` instead of their sum. Scan results are
tiny device scalars (or per-record bitmaps) fetched as chunks retire —
the corpus itself never round-trips.

Sandbox caveat: the axon tunnel's ``block_until_ready`` returns when an
upload is locally buffered, not when bytes reach the device, and any
device→host fetch forces a full flush — the TRUE wire rate is ~20-25
MB/s, which bounds any end-to-end streamed rate here regardless of scan
speed (the device scans the same bytes ~1000x faster than the wire
delivers them). On a real TPU host the host→HBM path is PCIe-class
(tens of GB/s) and the same pipeline is scan-bound. ``bench.py`` config
11 measures the wire ceiling with a D2H fence and reports end-to-end
rate plus overlap efficiency against that ceiling.
"""
from __future__ import annotations

import collections
from dataclasses import dataclass
from typing import Iterable, Iterator, Optional, Tuple, Union

import numpy as np

from .engine import ScanEngine


@dataclass
class StreamStats:
    """Aggregate of one streamed scan."""

    matches: int  # total distinct match-end positions
    matched_records: int  # records with >= 1 match
    records: int  # nonzero-length records scanned (callers that must
    # distinguish real empty records from phantom pad rows track their
    # own per-chunk real counts — see cli.py --stream)
    bytes: int  # corpus bytes scanned
    chunks: int  # device dispatches


class StreamScanner:
    """Compile-once / stream-many scanner with a depth-K upload pipeline.

    ``batches`` iterables yield ``(data [B, L] uint8, lengths [B] int32)``
    host arrays. Shapes should repeat (pad the final partial chunk with
    zero-length phantom records) — each new (B, L) shape compiles once.
    """

    def __init__(
        self,
        pattern_or_engine: Union[str, ScanEngine],
        *,
        depth: int = 3,
        backend: Optional[str] = None,
    ):
        """Accepts a pattern string, a ScanEngine, or a MultiPattern (its
        combined-automaton engine scans P patterns per chunk in ONE pass;
        per-record hits are the union over pattern channels)."""
        from .api import MultiPattern

        self.P = 1
        self._null_mask = None
        if isinstance(pattern_or_engine, MultiPattern):
            mp = pattern_or_engine
            if mp._singles is not None:
                raise ValueError(
                    "multi-pattern streaming needs the combined-automaton "
                    "engine (packed/pallas backend); this MultiPattern "
                    "fell back to per-pattern scans"
                )
            self.engine = mp.engine
            self.P = mp.P
            if mp.nullables.any():
                import jax.numpy as jnp

                # nullable channels are corrected host-side by
                # MultiPattern; in a stream the correction is a per-
                # channel OR (an empty match hits every record)
                self._null_mask = jnp.asarray(mp.nullables)[None, :]
        elif isinstance(pattern_or_engine, ScanEngine):
            self.engine = pattern_or_engine
            self.P = self.engine.P
        else:
            from .compiler.serialize import cached_compile

            self.engine = ScanEngine(
                cached_compile(str(pattern_or_engine)), backend=backend
            )
        self.depth = max(1, int(depth))
        self._jits = {}

    # -- jit caches --------------------------------------------------------
    def _stats_fn(self):
        import jax
        import jax.numpy as jnp

        fn = self._jits.get("stats")
        if fn is None:
            eng = self.engine

            def run(d, l):
                cnt, _, anym = eng.match_stats(d, l, seeded=True)
                anym = self._union_channels(anym)
                return (
                    jnp.sum(cnt),
                    jnp.sum(anym.astype(jnp.int32)),
                    jnp.sum(l),
                )

            fn = self._jits["stats"] = jax.jit(run)
        return fn

    def _union_channels(self, anym):
        """[B*P] per-channel hits -> [B] per-record union (multi-pattern
        grep semantics: a line matches if ANY pattern matches)."""
        if self.P <= 1:
            return anym
        per = anym.reshape(-1, self.P)
        if self._null_mask is not None:
            per = per | self._null_mask
        return per.any(axis=1)

    def _hits_fn(self):
        import jax

        fn = self._jits.get("hits")
        if fn is None:
            eng = self.engine

            def run(d, l):
                _, _, anym = eng.match_stats(d, l, seeded=True)
                return self._union_channels(anym)

            fn = self._jits["hits"] = jax.jit(run)
        return fn

    # -- streaming entry points -------------------------------------------
    def _drive(self, batches, fn, payload=None):
        """Run the whole stream FETCH-FREE and return [(device_out, meta)].

        Backpressure is ``block_until_ready`` on the depth-old chunk — a
        pure sync with no device→host transfer. That matters on the axon
        tunnel: a D2H fetch mid-stream forces a flush of every buffered
        upload at the ~20-25 MB/s wire rate and leaves the link in its
        synchronous slow mode, so result scalars are left on device until
        the final chunk and only then gathered (a few bytes per chunk).
        On real hosts this simply avoids needless per-chunk round trips."""
        import jax
        import jax.numpy as jnp

        outs = []
        live = collections.deque()
        for data, lengths in batches:
            d = jax.device_put(jnp.asarray(data))
            l = jax.device_put(jnp.asarray(np.asarray(lengths, np.int32)))
            out = fn(d, l)
            outs.append((out, payload(data, lengths) if payload else None))
            live.append(out)
            if len(live) >= self.depth:
                jax.block_until_ready(live.popleft())
        if live:
            jax.block_until_ready(list(live))
        return outs

    def stats_stream(self, batches) -> StreamStats:
        """Global (matches, matched_records, records, bytes) over a chunk
        stream — the grep -c aggregate. One jitted dispatch per chunk;
        three device scalars per chunk, gathered after the stream in ONE
        stacked transfer (per-scalar fetches each pay a full tunnel round
        trip — ~0.7 s apiece once the link has left fast mode)."""
        import jax.numpy as jnp

        fn = self._stats_fn()
        outs = self._drive(
            batches, fn, payload=lambda d, l: int((np.asarray(l) > 0).sum())
        )
        if not outs:
            return StreamStats(0, 0, 0, 0, 0)
        packed = np.asarray(
            jnp.stack([jnp.stack(o) for o, _ in outs])
        )  # [chunks, 3], one D2H
        total, nrec, nbytes = (
            int(x) for x in packed.sum(axis=0, dtype=np.int64)
        )
        nrecords = sum(meta for _, meta in outs)
        return StreamStats(total, nrec, nrecords, nbytes, len(outs))

    def hits_stream(
        self, batches, *, defer: bool = False
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield per-chunk ``(hits [B] bool, data [B, L], lengths [B])``
        in order — the grep line-printing path.

        ``defer=False`` (default) fetches each chunk's [B] hit bitmap as
        it retires: O(depth) host memory, true streaming output, but the
        first fetch drops the tunnel's upload bandwidth (axon artifact —
        harmless on real hosts). ``defer=True`` keeps every chunk's
        bitmap on device and all host data alive until the stream ends:
        full upload bandwidth, O(corpus) host memory — the right mode
        when the corpus fits in RAM but not HBM."""
        import jax
        import jax.numpy as jnp

        fn = self._hits_fn()
        payload = lambda d, l: (d, np.asarray(l))  # noqa: E731
        if defer:
            for hits, (data, lengths) in self._drive(batches, fn, payload):
                yield np.asarray(hits), data, lengths
            return
        inflight = collections.deque()
        for data, lengths in batches:
            d = jax.device_put(jnp.asarray(data))
            l = jax.device_put(jnp.asarray(np.asarray(lengths, np.int32)))
            inflight.append((fn(d, l), payload(data, lengths)))
            if len(inflight) >= self.depth:
                hits, (dd, ll) = inflight.popleft()
                yield np.asarray(hits), dd, ll
        while inflight:
            hits, (dd, ll) = inflight.popleft()
            yield np.asarray(hits), dd, ll


def pack_records(lines, B: int, L: int):
    """[B, L] batch from <= B byte records (phantom zero-length pad)."""
    data = np.zeros((B, L), np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, b in enumerate(lines):
        n = min(len(b), L)
        data[i, :n] = np.frombuffer(b[:n], np.uint8)
        lengths[i] = n
    return data, lengths


def iter_line_batches(
    fileobj,
    *,
    rows: int = 65536,
    chunk_bytes: int = 32 << 20,
    min_len: int = 256,
) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
    """Newline-delimited records from a binary stream as fixed-shape
    batches ``(data [rows, L], lengths, n_real)``.

    Reads ``chunk_bytes`` at a time, carrying the partial trailing line
    into the next chunk. L is a power of two that only grows (a longer
    line widens every later batch), so the jit cache sees few shapes.
    Lines longer than 2^20 bytes are truncated (loudly)."""
    import sys

    L = min_len
    carry = b""
    eof = False
    pending: collections.deque = collections.deque()
    while True:
        while not eof and len(pending) < rows:
            buf = fileobj.read(chunk_bytes)
            if not buf:
                eof = True
                if carry:
                    pending.append(carry)
                    carry = b""
                break
            buf = carry + buf
            lines = buf.split(b"\n")
            carry = lines.pop()
            pending.extend(lines)
        if not pending:
            break
        longest = max((len(b) for b in pending), default=1)
        if longest > (1 << 20):
            print(
                "rrx stream: truncating lines longer than 1 MiB",
                file=sys.stderr,
            )
            longest = 1 << 20
        while L < longest:
            L *= 2
        take = []
        while pending and len(take) < rows:
            take.append(pending.popleft())
        data, lengths = pack_records(take, rows, L)
        yield data, lengths, len(take)


def stream_file_stats(
    pattern: str,
    fileobj,
    *,
    depth: int = 3,
    rows: int = 65536,
    chunk_bytes: int = 32 << 20,
    backend: Optional[str] = None,
) -> StreamStats:
    """grep -c over an arbitrarily large newline-delimited stream."""
    sc = StreamScanner(pattern, depth=depth, backend=backend)
    return sc.stats_stream(
        (d, l)
        for d, l, _ in iter_line_batches(
            fileobj, rows=rows, chunk_bytes=chunk_bytes
        )
    )
