"""Round-4 profiling: per-dispatch overhead breakdown on the axon chip.

Times the headline config (cat|dog, 1024-byte records) at several corpus
sizes and pipeline depths to separate device compute from dispatch cost.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import make_corpus
from roaringregex_tpu.compiler.program import compile_program
from roaringregex_tpu.engine import ScanEngine


def setup(total_bytes):
    data, lengths = make_corpus(total_bytes, 1024)
    prog = compile_program("cat|dog")
    engine = ScanEngine(prog)
    G = max(1, prog.G)
    B = data.shape[0]
    Bp = ((B + G - 1) // G) * G
    if Bp != B:
        data = np.concatenate([data, np.zeros((Bp - B, data.shape[1]), np.uint8)])
        lengths = np.concatenate([lengths, np.zeros(Bp - B, np.int32)])
    d = jax.device_put(jnp.asarray(data))
    l = jax.device_put(jnp.asarray(lengths))

    def run(d, l):
        cnt, first, anym = engine.match_stats(d, l, seeded=True)
        return jnp.sum(cnt), jnp.sum(anym.astype(jnp.int32))

    return jax.jit(run), d, l, int(lengths.sum())


def main():
    for mb in (10, 20, 40, 64):
        run, d, l, nbytes = setup(mb * 1_000_000)
        jax.block_until_ready(run(d, l))
        # single-batch latency
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(run(d, l))
            ts.append(time.perf_counter() - t0)
        lat = float(np.median(ts))
        print(f"{mb} MB single-batch: {lat*1e3:.2f} ms = {nbytes/lat/1e9:.2f} GB/s")
        for pipe in (8, 32, 96, 256):
            samples = []
            for _ in range(4):
                t0 = time.perf_counter()
                outs = [run(d, l) for _ in range(pipe)]
                jax.block_until_ready(outs)
                samples.append(nbytes * pipe / (time.perf_counter() - t0))
            med = np.median(samples)
            cv = np.std(samples) / np.mean(samples)
            print(f"  pipe={pipe:4d}: {med/1e9:6.2f} GB/s  cv={cv:.2%} "
                  f"({', '.join(f'{s/1e9:.1f}' for s in samples)})")


if __name__ == "__main__":
    main()
