"""Calibrate the VPU element-op ceiling used by bench.roofline_fields.

bench.py's PEAK_VPU_OPS was hand-derived (one (8,128) vector op/cycle
at 940 MHz = 0.96e12 ops/s) and the fused λτ kernel measures ~140% of
the model built on it — the constant is too low, the %-of-roofline
meaningless.  This probe MEASURES the ceiling with dependent
elementwise chains shaped like the τ bisection selection (compare /
select / fma — the ops the λτ model counts), slope-timed so fixed
dispatch costs cancel:

  chain A (bisection-like): x = where(x > c, x*a + b, x)   4 ops/iter
  chain B (abs/min plane):  x = min(|x - c|, 1) + x*eps    4 ops/iter

Both chains are SEQUENTIALLY dependent across iterations (no ILP
across iters, like the bisection), over an (8M,) f32 resident array —
VPU-bound, HBM traffic amortised by K in-register iterations per pass.

Usage: nohup python benchmarks/vpu_peak_probe.py > /tmp/vpu.log 2>&1 &
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from arrowspace_tpu.config import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from bench import amortised_device_time


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    N, K = 8_000_000, 64
    x0 = jnp.asarray(np.random.default_rng(0)
                     .uniform(0.2, 0.8, N).astype(np.float32))

    def chain_a(x):
        def body(i, x):
            c = 0.3 + 0.004 * i.astype(jnp.float32)
            return jnp.where(x > c, x * 0.97 + 0.01, x)
        return (jax.lax.fori_loop(0, K, body, x),)

    def chain_b(x):
        def body(i, x):
            c = 0.4 + 0.003 * i.astype(jnp.float32)
            return jnp.minimum(jnp.abs(x - c), 1.0) + x * 1e-3
        return (jax.lax.fori_loop(0, K, body, x),)

    for name, fn, ops_per in (("bisect-like cmp/fma/select", chain_a, 4),
                              ("abs/min plane", chain_b, 4)):
        t = amortised_device_time(jax, jnp, fn, x0, (), repeats=8)
        rate = K * N * ops_per / t
        log(f"{name}: {t * 1e3:.3f} ms/pass ({K} dependent iters over "
            f"{N / 1e6:.0f}M f32) -> {rate / 1e12:.2f}e12 element-ops/s "
            f"at {ops_per} ops/iter")
    log("VPU-PROBE-DONE")


if __name__ == "__main__":
    main()
