"""Head-to-head at 10MB: matmul PallasScanner vs SWAR (un)windowed,
deep pipeline to swamp tunnel sync latency."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_pallas as spl
from roaringregex_tpu.ops import scan_swar as ssw
from roaringregex_tpu.utils.config import get_config, set_config

def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
T0 = time.time()

rng = np.random.default_rng(0)
total, L = 10_000_000, 1024
B = total // L
data = rng.integers(97, 123, size=(B, L), dtype=np.uint8)
for word in (b"cat", b"dog"):
    w = np.frombuffer(word, np.uint8)
    rows = rng.integers(0, B, size=B // 8)
    cols = rng.integers(0, L - 3, size=rows.size)
    for r, c in zip(rows, cols):
        data[r, c:c+3] = w
prog = compile_program("cat|dog")
tabs = sp.packed_tables(prog)
ref = spl.PallasScanner(prog, tabs)
sw = ssw.SwarScanner(prog, tabs)
Bp = ((B + 15) // 16) * 16
data = np.concatenate([data, np.zeros((Bp - B, L), np.uint8)])
lengths = np.full(Bp, L, np.int32); lengths[B:] = 0
len_g = jnp.asarray(lengths.reshape(-1, 16))
d = jax.device_put(jnp.asarray(data))
jax.block_until_ready(d)
nbytes = total
log("device ready")

def timeit(fn, *a, pipeline=256, reps=3):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts)), out

def run_ref(d):
    c, f, l, fu, a = ref.match_stats_b(d, len_g, seeded=True)
    return jnp.sum(c), jnp.sum(a.astype(jnp.int32))
def run_sw(d):
    c, f, l, fu, a = sw.match_stats_b(d, len_g, seeded=True)
    return jnp.sum(c), jnp.sum(a.astype(jnp.int32))

t, out = timeit(run_ref, d)
log(f"matmul PallasScanner: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s  out={out}")
t, out = timeit(run_sw, d)
log(f"SWAR windowed:        {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s  out={out}")
old = get_config()
set_config(old.with_(swar_window_cols=0))
t, out = timeit(run_sw, d)
log(f"SWAR unwindowed:      {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s  out={out}")
set_config(old)
