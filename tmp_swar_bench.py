import time, sys
import numpy as np
import jax, jax.numpy as jnp
from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.engine import ScanEngine

def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
T0 = time.time()
log("backend:", jax.default_backend())

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
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))

total, L = 10_000_000, 1024
data, lengths = make_corpus(total, L)
log("corpus built")
prog = compile_program("cat|dog")
eng = ScanEngine(prog)
log("scanner:", type(eng._pallas).__name__)
G = prog.G
B = data.shape[0]
Bp = ((B + G - 1) // G) * G
if Bp != B:
    data = np.concatenate([data, np.zeros((Bp - B, L), np.uint8)])
    lengths = np.concatenate([lengths, np.zeros(Bp - B, np.int32)])
d = jax.device_put(jnp.asarray(data))
l = jax.device_put(jnp.asarray(lengths))
jax.block_until_ready(d)
log("device_put done")
nbytes = int(lengths.sum())

def run(d, l):
    cnt, first, anym = eng.match_stats(d, l, seeded=True)
    return jnp.sum(cnt), jnp.sum(anym.astype(jnp.int32))

out = jax.block_until_ready(run(d, l))
log("compile+first done, matches:", out)
t = timeit(run, d, l)
log(f"full match_stats: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
t1 = timeit(run, d, l, pipeline=1, reps=20)
log(f"single-batch latency: {t1*1e6:.0f} us  {nbytes/t1/1e9:.2f} GB/s")
