import time, functools
import numpy as np
import jax, jax.numpy as jnp
from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_swar as ssw

def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
T0 = time.time()
log("backend:", jax.default_backend())

rng = np.random.default_rng(0)
total, L = 10_000_000, 1024
B = total // L
data = rng.integers(97, 123, size=(B, L), dtype=np.uint8)
lengths = np.full(B, L, np.int32)
prog = compile_program("cat|dog")
tabs = sp.packed_tables(prog)
sw = ssw.SwarScanner(prog, tabs)
G = prog.G
Bp = ((B + G - 1) // G) * G
data = np.concatenate([data, np.zeros((Bp - B, L), np.uint8)])
lengths = np.concatenate([lengths, np.zeros(Bp - B, np.int32)])
nbytes = int(lengths.sum())

n_cols = -(-Bp // ssw.RECS)
T, T_pad, B_pad, B_blk, T_chunk = sw._geom_swar(L, n_cols)
log("geom:", dict(T=T, T_pad=T_pad, B_pad=B_pad, B_blk=B_blk, T_chunk=T_chunk))

d = jax.device_put(jnp.asarray(data))
l = jax.device_put(jnp.asarray(lengths))
R_pad = B_pad * ssw.RECS
lp = jnp.pad(l, (0, R_pad - Bp))
dp = jnp.pad(d, ((0, R_pad - Bp), (0, 0)))
jax.block_until_ready((dp, lp))
log("device_put done")

def timeit(fn, *a, pipeline=48, reps=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))

# 1. pack only
pack = jax.jit(functools.partial(ssw._swar_pack, T_pad=T_pad, B_pad=B_pad))
t = timeit(pack, dp, lp)
log(f"pack only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
tm = jax.block_until_ready(pack(dp, lp))

# 2. kernel only (pre-packed)
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kern_only(tm):
    nB, nT = B_pad // B_blk, T_pad // T_chunk
    kernel = functools.partial(ssw._swar_kernel, spec=sw.sspec, seeded=True, T_chunk=T_chunk)
    return pl.pallas_call(
        kernel, grid=(nB, nT),
        in_specs=[pl.BlockSpec((T_chunk // 8, 8 * ssw.G8, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T_chunk // 8, ssw.G8, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad // 8, ssw.G8, B_pad), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((ssw.G8, B_blk), jnp.uint32)],
    )(tm)
kj = jax.jit(kern_only)
t = timeit(kj, tm)
log(f"kernel only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
logarr = jax.block_until_ready(kj(tm))

# 3. stats only
stats = jax.jit(functools.partial(ssw._swar_stats, nullable=False, seeded=True))
t = timeit(stats, logarr, lp)
log(f"stats only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

# 4. full
t = timeit(lambda d, l: sw._swar_call(d, l, True, T_pad, B_pad, B_blk, T_chunk), dp, lp)
log(f"full: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
