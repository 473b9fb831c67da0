import time, functools
import numpy as np
import jax, jax.numpy as jnp
from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_swar as ssw
from roaringregex_tpu.utils.config import get_config, set_config

def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
T0 = time.time()

rng = np.random.default_rng(0)
total, L = 10_000_000, 1024
B = total // L
data = rng.integers(97, 123, size=(B, L), dtype=np.uint8)
prog = compile_program("cat|dog")
tabs = sp.packed_tables(prog)
sw = ssw.SwarScanner(prog, tabs)
G = prog.G
Bp = ((B + G - 1) // G) * G
data = np.concatenate([data, np.zeros((Bp - B, L), np.uint8)])
lengths = np.full(Bp, L, np.int32); lengths[B:] = 0
len_g = jnp.asarray(lengths.reshape(-1, G))
d = jax.device_put(jnp.asarray(data))
jax.block_until_ready(d)
nbytes = total

def timeit(fn, *a, pipeline=48, reps=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))

# windowed (default)
win = sw._swar_window(L, Bp, True)
log("window plan:", win)
t = timeit(lambda d: sw.match_stats_b(d, len_g, seeded=True)[0], d)
log(f"windowed match_stats_b: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

# unwindowed
old = get_config()
set_config(old.with_(swar_window_cols=0))
t = timeit(lambda d: sw.match_stats_b(d, len_g, seeded=True)[0], d)
log(f"unwindowed match_stats_b: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
set_config(old)

# decompose windowed: window build only
k, w, h = win
lengths_flat = jnp.asarray(lengths.astype(np.int32))
def build(data):
    dp = jnp.pad(data, ((0, 0), (h, k * w - L)), constant_values=np.uint8(0xFF))
    wind = jnp.stack([dp[:, j * w : j * w + w + h] for j in range(k)], axis=1).reshape(Bp * k, w + h)
    return wind
bj = jax.jit(build)
t = timeit(bj, d)
log(f"window build only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
wind = jax.block_until_ready(bj(d))

# pack on windows
T, T_pad, B_pad, B_blk, T_chunk = sw._geom_swar(w + h, -(-(Bp * k) // 32))
log("win geom:", T, T_pad, B_pad, B_blk, T_chunk)
off = jnp.arange(k, dtype=jnp.int32)[None, :] * w
lnw = jnp.clip(lengths_flat[:, None] + h - off, 0, w + h).reshape(-1)
R_pad = B_pad * 32
lnwp = jnp.pad(lnw, (0, R_pad - lnw.shape[0]))
windp = jnp.pad(wind, ((0, R_pad - wind.shape[0]), (0, 0)))
jax.block_until_ready((windp, lnwp))
packj = jax.jit(functools.partial(ssw._swar_pack, T_pad=T_pad, B_pad=B_pad))
t = timeit(packj, windp, lnwp)
log(f"win pack only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
tm = jax.block_until_ready(packj(windp, lnwp))

kr = jax.jit(functools.partial(sw._run_swar, seeded=True, T_pad=T_pad, B_pad=B_pad, B_blk=B_blk, T_chunk=T_chunk))
t = timeit(kr, tm)
log(f"win kernel only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
lg = jax.block_until_ready(kr(tm))

stj = jax.jit(functools.partial(ssw._swar_stats, nullable=False, seeded=True, lead=h))
t = timeit(stj, lg, lnwp)
log(f"win stats only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

# unwindowed decomposition too
T2, T_pad2, B_pad2, B_blk2, T_chunk2 = sw._geom_swar(L, -(-Bp // 32))
R_pad2 = B_pad2 * 32
lp2 = jnp.pad(lengths_flat, (0, R_pad2 - Bp))
dp2 = jnp.pad(d, ((0, R_pad2 - Bp), (0, 0)))
jax.block_until_ready((dp2, lp2))
packj2 = jax.jit(functools.partial(ssw._swar_pack, T_pad=T_pad2, B_pad=B_pad2))
t = timeit(packj2, dp2, lp2)
log(f"unwin pack only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
tm2 = jax.block_until_ready(packj2(dp2, lp2))
kr2 = jax.jit(functools.partial(sw._run_swar, seeded=True, T_pad=T_pad2, B_pad=B_pad2, B_blk=B_blk2, T_chunk=T_chunk2))
t = timeit(kr2, tm2)
log(f"unwin kernel only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
lg2 = jax.block_until_ready(kr2(tm2))
stj2 = jax.jit(functools.partial(ssw._swar_stats, nullable=False, seeded=True))
t = timeit(stj2, lg2, lp2)
log(f"unwin stats only: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
