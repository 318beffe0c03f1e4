"""On-chip microbenchmark for W4A16 matmul kernel variants.

Usage: python scripts/kbench.py [M ...]
Prints per-shape timing + effective HBM bandwidth on qweight bytes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from autoawq_tpu.core import packing
from autoawq_tpu.ops import pallas_gemm


SHAPES = [  # (K, N, tag) — TinyLlama fused-layer shapes + lm_head
    (2048, 2560, "qkv"),
    (2048, 2048, "o"),
    (2048, 11264, "gate_up"),
    (5632, 2048, "down"),
    (2048, 32000, "lm_head"),
]


def make(K, N, seed=0):
    rng = np.random.default_rng(seed)
    q4 = rng.integers(0, 16, (K, N))
    z4 = rng.integers(0, 16, (K // 128, N))
    sc = (rng.standard_normal((K // 128, N)).astype(np.float32) * 0.01)
    return (
        jnp.asarray(packing.pack_planar(q4)),
        jnp.asarray(packing.pack_planar(z4)),
        jnp.asarray(packing.pad_scales_planar(sc)),
    )


def bench(fn, *args, iters=100):
    y = fn(*args)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ms = [int(a) for a in sys.argv[1:]] or [1, 8, 128, 2048]
    rng = np.random.default_rng(1)
    for m in ms:
        print(f"--- M={m}")
        tot = 0.0
        for K, N, tag in SHAPES:
            qw, qz, sc = make(K, N)
            x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)
            dt = bench(
                lambda x, qw, sc, qz: pallas_gemm.awq_matmul_pallas(
                    x, qw, sc, qz, out_features=N
                ),
                x, qw, sc, qz,
            )
            qbytes = qw.size * 4 + sc.size * 4 + qz.size * 4
            flops = 2 * m * K * N
            print(
                f"{tag:8s} K={K:5d} N={N:5d}: {dt*1e6:8.1f} us  "
                f"{qbytes/dt/1e9:6.1f} GB/s  {flops/dt/1e12:6.2f} TFLOP/s"
            )
            tot += dt
        print(f"total one-layer+lm sweep: {tot*1e3:.3f} ms")


if __name__ == "__main__":
    main()
