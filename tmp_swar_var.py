"""Variant experiments: pack layouts, kernel micro-opts, stats without gathers."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.ops import scan_packed as sp
from roaringregex_tpu.ops import scan_swar as ssw

def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
T0 = time.time()

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
nbytes = total

n_cols = -(-Bp // 32)
T, T_pad, B_pad, B_blk, T_chunk = sw._geom_swar(L, n_cols)
log("geom:", T_pad, B_pad, B_blk, T_chunk)
R_pad = B_pad * 32
d = jnp.pad(jnp.asarray(data), ((0, R_pad - Bp), (0, 0)))
lp = jnp.pad(jnp.asarray(lengths), (0, R_pad - Bp))
d = jax.device_put(d); lp = jax.device_put(lp)
jax.block_until_ready((d, lp))
log("device ready")

def timeit(fn, *a, pipeline=48, reps=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))

# ---- pack variant P2: per-k planes, internal order (k, col, g8) ----
def pack2(data, lengths):
    R, Lx = data.shape
    Tx = Lx + 2
    dd = jnp.where(data >= 0x80, jnp.uint8(0xFF), data)
    dd = jnp.pad(dd, ((0, 0), (1, 1)), constant_values=np.uint8(0xFF))
    j = jnp.arange(Tx, dtype=jnp.int32)[None, :] - 1
    ln = lengths[:, None]
    dd = jnp.where(j < 0, jnp.uint8(0xFD),
         jnp.where(j < ln, dd,
         jnp.where(j == ln, jnp.uint8(0xFE), jnp.uint8(0xFF))))
    # external rec = col*32 + g8*4 + k  ->  [B_pad, G8, 4, T]
    di = dd.reshape(B_pad, 8, 4, Tx).transpose(2, 3, 1, 0)  # [4, T, G8, B_pad] minor B_pad
    w = di[0].astype(jnp.uint32)
    for k in range(1, 4):
        w = w | (di[k].astype(jnp.uint32) << (8 * k))
    w = jnp.pad(w, ((0, T_pad - Tx), (0, 0), (0, 0)), constant_values=np.uint32(0xFFFFFFFF))
    return w.reshape(T_pad // 8, 64, B_pad)

p2 = jax.jit(pack2)
t = timeit(p2, d, lp)
log(f"pack2 (per-k planes): {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
tm = jax.block_until_ready(p2(d, lp))

# original pack for reference
p1 = jax.jit(functools.partial(ssw._swar_pack, T_pad=T_pad, B_pad=B_pad))
t = timeit(p1, d, lp)
log(f"pack1 (bitcast):      {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

# ---- kernel variants ----
def make_kernel(tree_or=False, gates_per_step=False):
    spec = sw.sspec
    def kern(data_ref, log_out, v_s, *, seeded=True):
        j = pl.program_id(1)
        Bk = v_s.shape[1]
        u32 = jnp.uint32
        seedw = u32(0x01010101)
        @pl.when(j == 0)
        def _init(): v_s[:] = jnp.zeros((8, Bk), u32)
        def body(i, _):
            slab = data_ref[i]
            if not gates_per_step:
                gates = ssw._gates_slab(slab, spec)
            v = v_s[:]
            logw = jnp.zeros((8, Bk), u32)
            for m in range(8):
                tl = j * T_chunk + i * 8 + m
                vv = v | seedw
                if gates_per_step:
                    gates_m = ssw._gates_slab(slab[m*8:(m+1)*8], spec)
                sh = {0: vv}
                parts = []
                for u, preds, c in spec.out_bits:
                    x = None
                    for s in preds:
                        if s not in sh: sh[s] = vv >> s
                        x = sh[s] if x is None else x | sh[s]
                    g = gates_m[c] if gates_per_step else gates[c][m*8:(m+1)*8]
                    bit = x & g
                    parts.append(bit << u if u else bit)
                if tree_or:
                    while len(parts) > 1:
                        parts = [a | b for a, b in zip(parts[::2], parts[1::2])] + ([parts[-1]] if len(parts) % 2 else [])
                    v = parts[0]
                else:
                    v = functools.reduce(lambda a, b: a | b, parts)
                fparts = []
                for s in spec.accept_bits:
                    fparts.append(v >> s if s else v)
                fl = functools.reduce(lambda a, b: a | b, fparts) & u32(0x01010101)
                logw = logw | (fl << m if m else fl)
            log_out[i] = logw
            v_s[:] = v
            return 0
        jax.lax.fori_loop(0, T_chunk // 8, body, 0)
    return kern

def run_kernel(kern, tm):
    nB, nT = B_pad // B_blk, T_pad // T_chunk
    return pl.pallas_call(
        kern, grid=(nB, nT),
        in_specs=[pl.BlockSpec((T_chunk // 8, 64, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T_chunk // 8, 8, B_blk), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad // 8, 8, B_pad), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((8, B_blk), jnp.uint32)],
    )(tm)

for name, kw in [("base", {}), ("treeOR", dict(tree_or=True)), ("perstep-gates", dict(gates_per_step=True)), ("treeOR+perstep", dict(tree_or=True, gates_per_step=True))]:
    kj = jax.jit(functools.partial(run_kernel, make_kernel(**kw)))
    t = timeit(kj, tm)
    log(f"kernel {name}: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

logarr = jax.block_until_ready(jax.jit(functools.partial(run_kernel, make_kernel()))(tm))

# ---- stats variant S2: no gathers, internal (k,col,g8) order, minor-friendly transposes ----
def stats2(logw, lengths):
    # logw [nTw, 8, B_pad] u32; lengths external [R]; internal perm
    nTw = logw.shape[0]
    ln_i = lengths.reshape(B_pad, 8, 4).transpose(2, 0, 1).reshape(-1)
    planes = []
    for k in range(4):
        fk = ((logw >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.uint8)  # [nTw, 8, B_pad]
        planes.append(fk.transpose(2, 1, 0))  # [B_pad, 8, nTw]
    f = jnp.stack(planes, 0).reshape(R_pad, nTw)  # internal order
    ln = ln_i
    w8 = jnp.arange(nTw, dtype=jnp.int32)[None, :] * 8
    kcnt = jnp.clip(ln[:, None] + 1 - w8, 0, 8)
    kval = jnp.clip(ln[:, None] + 2 - w8, 0, 8)
    mb_cnt = ((1 << kcnt) - 1).astype(jnp.uint8)
    mb_val = ((1 << kval) - 1).astype(jnp.uint8)
    fv = f & mb_val
    pc = jax.lax.population_count
    shl = ln[:, None] - w8
    m_len = jnp.where((shl >= 0) & (shl < 8), (1 << jnp.clip(shl, 0, 7)), 0).astype(jnp.uint8)
    shl1 = shl + 1
    m_len1 = jnp.where((shl1 >= 0) & (shl1 < 8), (1 << jnp.clip(shl1, 0, 7)), 0).astype(jnp.uint8)
    f_len = ((f & m_len) != 0).any(axis=1)
    f_len1 = ((f & m_len1) != 0).any(axis=1)
    dedup = (f_len1 & ~f_len).astype(jnp.int32)
    full = f_len | f_len1
    cnt = pc(f & mb_cnt).astype(jnp.int32).sum(axis=1) + dedup
    nz = fv != 0
    tf = jnp.where(nz, w8 + ssw._ctz8(fv).astype(jnp.int32), 1 << 30)
    first_tl = tf.min(axis=1)
    first = jnp.where(first_tl >= (1 << 30), -1, jnp.minimum(first_tl, ln))
    tlast = jnp.where(nz, w8 + ssw._msb8(fv), -1)
    last_tl = tlast.max(axis=1)
    last = jnp.where(last_tl < 0, -1, jnp.minimum(last_tl, ln))
    inv = lambda x: x.reshape(4, B_pad, 8).transpose(1, 2, 0).reshape(-1)
    return inv(cnt), inv(first), inv(last), inv(full)

s2 = jax.jit(stats2)
t = timeit(s2, logarr, lp)
log(f"stats2 (no gather): {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
s1 = jax.jit(functools.partial(ssw._swar_stats, nullable=False, seeded=True))
t = timeit(s1, logarr, lp)
log(f"stats1 (gather):    {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")

# ---- full fused: pack2 + base kernel + stats2 ----
def full2(d, lp):
    tm = pack2(d, lp)
    lg = run_kernel(make_kernel(tree_or=True), tm)
    return stats2(lg, lp)
f2 = jax.jit(full2)
t = timeit(f2, d, lp)
log(f"FULL v2: {t*1e6:.0f} us  {nbytes/t/1e9:.2f} GB/s")
