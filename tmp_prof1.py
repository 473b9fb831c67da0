"""Profile config 1 at 10 MB: full path vs time-major vs kernel-only."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp

from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.engine import ScanEngine
from roaringregex_tpu.ops import scan_pallas as spl

def make_corpus(total_bytes, rec_len, seed=0, plant=(b"cat", b"dog")):
    rng = np.random.default_rng(seed)
    B = max(1, total_bytes // rec_len)
    data = rng.integers(ord("a"), ord("z") + 1, size=(B, rec_len), dtype=np.uint8)
    for word in plant:
        w = np.frombuffer(word, dtype=np.uint8)
        rows = rng.integers(0, B, size=max(1, B // 8))
        cols = rng.integers(0, max(rec_len - len(w), 1), size=rows.size)
        for r, c in zip(rows, cols):
            data[r, c : c + len(w)] = w
    return data, np.full(B, rec_len, dtype=np.int32)

def timeit(fn, *a, pipeline=96, reps=5):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))

def main(total=10_000_000, L=1024):
    data, lengths = make_corpus(total, L)
    prog = compile_program("cat|dog")
    eng = ScanEngine(prog)
    sc = eng._pallas
    G = prog.G
    B = data.shape[0]
    Bp = ((B + G - 1) // G) * G
    if Bp != B:
        data = np.concatenate([data, np.zeros((Bp - B, L), np.uint8)])
        lengths = np.concatenate([lengths, np.zeros(Bp - B, np.int32)])
    d = jax.device_put(jnp.asarray(data))
    l = jax.device_put(jnp.asarray(lengths))
    nbytes = int(lengths.sum())

    # full path
    def run(d, l):
        cnt, first, anym = eng.match_stats(d, l, seeded=True)
        return jnp.sum(cnt), jnp.sum(anym.astype(jnp.int32))
    run = jax.jit(run)
    t = timeit(run, d, l)
    print(f"full match_stats: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

    # geometry
    B_rows0 = Bp // G
    T, T_pad, B_pad, B_blk, T_chunk, r = sc._geom_b(L, B_rows0)
    print(f"geom: B_rows={B_rows0} T={T} T_pad={T_pad} B_pad={B_pad} B_blk={B_blk} T_chunk={T_chunk} r={r} lanes={sc.lanes} G={G}")

    # time-major alone
    tmf = jax.jit(functools.partial(spl._time_major, G=G, L=L, T_pad=T_pad, B_pad=B_pad, r=r))
    t = timeit(tmf, d)
    print(f"_time_major:      {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

    # kernel with prebuilt tm: monkeypatch _time_major to identity
    len_g = l.reshape(-1, G)
    lenT = jax.jit(functools.partial(sc._lenT, B_pad=B_pad))(len_g)
    tm = jax.block_until_ready(tmf(d))
    orig = spl._time_major
    spl._time_major = lambda data, G, L, T_pad, B_pad, r: data
    try:
        f = functools.partial(sc._match_call_b, tm, lenT, True, L, T_pad, B_pad, B_blk, T_chunk, r, 1, 0)
        t = timeit(f)
        print(f"kernel only:      {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
    finally:
        spl._time_major = orig

    # match_stats without final sum reduction (to see reduce cost)
    ms = jax.jit(lambda d, l: eng.match_stats(d, l, seeded=True))
    t = timeit(ms, d, l)
    print(f"match_stats(nored): {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

if __name__ == "__main__":
    import sys
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    main(total, L)
