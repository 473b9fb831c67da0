"""Layout micro-experiments: transpose strategies + fused stats reduction."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
T0 = time.time()

R, T = 12288, 1152   # padded 10MB-ish geometry
rng = np.random.default_rng(0)
d = jax.device_put(jnp.asarray(rng.integers(0, 255, size=(R, T), dtype=np.uint8)))
jax.block_until_ready(d)
nbytes = R * T

def timeit(fn, *a, pipeline=48, reps=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))

# 1. plain u8 transpose
f1 = jax.jit(lambda x: x.T)
log(f"u8 [R,T]->[T,R] transpose: {timeit(f1, d)*1e6:.0f} us")

# 2. quad-pack then u32 transpose: [R,T] -> [R/4,4,T] -> (0,2,1) -> bitcast -> [R/4,T] u32 -> T
def f2(x):
    q = x.reshape(R // 4, 4, T).transpose(0, 2, 1)
    w = jax.lax.bitcast_convert_type(q, jnp.uint32)  # [R/4, T]
    return w.T  # [T, R/4]
f2j = jax.jit(f2)
log(f"quad-pack + u32 transpose: {timeit(f2j, d)*1e6:.0f} us")

# 2b. split: just the quad-pack part
def f2a(x):
    q = x.reshape(R // 4, 4, T).transpose(0, 2, 1)
    return jax.lax.bitcast_convert_type(q, jnp.uint32)
f2aj = jax.jit(f2a)
log(f"  quad-pack only: {timeit(f2aj, d)*1e6:.0f} us")
w32 = jax.block_until_ready(f2aj(d))
f2bj = jax.jit(lambda w: w.T)
log(f"  u32 transpose only: {timeit(f2bj, w32)*1e6:.0f} us")

# 3. pallas in-kernel u8 tile transpose [R,T] -> [T,R]
def tk(x_ref, o_ref):
    o_ref[:] = jnp.transpose(x_ref[:], (1, 0))
def f3(x):
    RB, TB = 1024, 384
    return pl.pallas_call(
        tk, grid=(R // RB, T // TB),
        in_specs=[pl.BlockSpec((RB, TB), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, RB), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, R), jnp.uint8),
    )(x)
try:
    f3j = jax.jit(f3)
    log(f"pallas u8 tile transpose: {timeit(f3j, d)*1e6:.0f} us")
except Exception as e:
    log("pallas u8 transpose failed:", repr(e))

# 3b. pallas u32 tile transpose on quad-packed
def tk32(x_ref, o_ref):
    o_ref[:] = jnp.transpose(x_ref[:], (1, 0))
def f3b(w):
    RB, TB = 512, 384
    R4 = R // 4
    return pl.pallas_call(
        tk32, grid=(R4 // RB, T // TB),
        in_specs=[pl.BlockSpec((RB, TB), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, RB), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, R4), jnp.uint32),
    )(w)
try:
    f3bj = jax.jit(f3b)
    log(f"pallas u32 tile transpose: {timeit(f3bj, w32)*1e6:.0f} us")
except Exception as e:
    log("pallas u32 transpose failed:", repr(e))

# 4. fused stats reduction over log [nTw, 8, B] u32 (per-k planes, one pass)
nTw, G8, Bp = 144, 8, 384
lg = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(nTw, G8, Bp), dtype=np.uint64).astype(np.uint32)))
def stats3(logw):
    w8 = (jnp.arange(nTw, dtype=jnp.int32) * 8)[:, None, None]
    outs = []
    for k in range(4):
        fk = (logw >> (8 * k)) & jnp.uint32(0xFF)
        pcf = jax.lax.population_count(fk).astype(jnp.int32)
        cnt = pcf.sum(axis=0)
        nz = fk != 0
        ctz = jax.lax.population_count((fk & (~fk + jnp.uint32(1))) - jnp.uint32(1)).astype(jnp.int32)
        first = jnp.where(nz, w8 + ctz, 1 << 30).min(axis=0)
        y = fk | (fk >> 1); y = y | (y >> 2); y = y | (y >> 4)
        msb = jax.lax.population_count(y).astype(jnp.int32) - 1
        last = jnp.where(nz, w8 + msb, -1).max(axis=0)
        outs.append((cnt, first, last))
    return outs
s3 = jax.jit(stats3)
log(f"stats3 fused reduce: {timeit(s3, lg)*1e6:.0f} us  (for 10MB scan -> GB/s = {10e6/timeit(s3, lg)/1e9:.1f})")
