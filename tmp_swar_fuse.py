"""Isolate the fused-jit pathology: pack|kernel|stats composed with and
without optimization barriers."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_swar as ssw

def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
T0 = time.time()

rng = np.random.default_rng(0)
total, L = 10_000_000, 1024
B = total // L
data = rng.integers(97, 123, size=(B, L), dtype=np.uint8)
prog = compile_program("cat|dog")
tabs = sp.packed_tables(prog)
sw = ssw.SwarScanner(prog, tabs)
Bp = ((B + 15) // 16) * 16
data = np.concatenate([data, np.zeros((Bp - B, L), np.uint8)])
lengths = np.full(Bp, L, np.int32); lengths[B:] = 0
nbytes = total

T, T_pad, B_pad, B_blk, T_chunk = sw._geom_swar(L, -(-Bp // 32))
R_pad = B_pad * 32
d = jax.device_put(jnp.asarray(data))
lp = jax.device_put(jnp.pad(jnp.asarray(lengths), (0, R_pad - Bp)))
jax.block_until_ready((d, lp))
log("geom:", T, T_pad, B_pad, B_blk, T_chunk)

def timeit(fn, *a, pipeline=48, reps=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))

def bench(name, fn):
    j = jax.jit(fn)
    t = timeit(j, d, lp)
    log(f"{name}: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

# stage fns
pack = functools.partial(ssw._swar_pack, T_pad=T_pad, B_pad=B_pad)
def kern(tm, lnT):
    return sw._run_swar(tm, lnT, True, T_pad, B_pad, B_blk, T_chunk)
stats = functools.partial(ssw._swar_stats, nullable=False, seeded=True)

bench("pack only", lambda d, lp: pack(d))
bench("pack+lnT+kernel", lambda d, lp: kern(pack(d), ssw._len_planes(lp, B_pad)))
def pk_bar(d, lp):
    tm = pack(d); lnT = ssw._len_planes(lp, B_pad)
    tm, lnT = jax.lax.optimization_barrier((tm, lnT))
    return kern(tm, lnT)
bench("pack+BAR+kernel", pk_bar)
def full_nobar(d, lp):
    lnT = ssw._len_planes(lp, B_pad)
    return stats(kern(pack(d), lnT), lp)[0]
bench("full (no extra bar)", full_nobar)
def full_bar(d, lp):
    tm = pack(d); lnT = ssw._len_planes(lp, B_pad)
    tm, lnT = jax.lax.optimization_barrier((tm, lnT))
    lg = kern(tm, lnT)
    lg = jax.lax.optimization_barrier(lg)
    return stats(lg, lp)[0]
bench("full (bars)", full_bar)
# separate jits chained (dispatch overhead x3 but no fusion)
packj = jax.jit(pack)
kernj = jax.jit(kern)
statsj = jax.jit(lambda lg, lp: stats(lg, lp)[0])
lnTj = jax.jit(functools.partial(ssw._len_planes, B_pad=B_pad))
def chained(d, lp):
    return statsj(kernj(packj(d), lnTj(lp)), lp)
t = timeit(chained, d, lp)
log(f"3 separate jits: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
# components
tm0 = jax.block_until_ready(packj(d))
lnT0 = jax.block_until_ready(lnTj(lp))
t = timeit(kernj, tm0, lnT0)
log(f"kernel only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
lg0 = jax.block_until_ready(kernj(tm0, lnT0))
t = timeit(statsj, lg0, lp)
log(f"stats only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
t = timeit(packj, d)
log(f"pack only (sep): {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
