"""On-chip A/B: 4-ary vs 2-ary bisection in the tau selection kernels.

The r4 finding (benchmarks/tau_select_ab.py): at F=128 the bisection's
~1.75x op-count advantage over the bitonic sort cashes only ~1.13x —
the 32-pass count chain is LATENCY-bound (each pass depends on the
previous lo/hi).  bisect4 probes three midpoints per pass (independent
counts overlap on the VPU) and needs 17 passes: ~1.6x more count ops
for ~1.9x less chain depth.  Bitwise-equal by construction (CPU tests
pin bisect4 == bisect on ties/inf/NaN/signed-zero inputs).

Measures: tau-alone 1M x 128 (bisect vs bisect4), fused tau+lambda
1M x 128 (bisect vs bisect4), tau-alone 500k x 384 (bisect_mm vs
bisect4_mm) + a chip parity assert per pair.

Usage: nohup python benchmarks/tau_bisect4_ab.py > /tmp/tau_bisect4.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from arrowspace_tpu.config import setup_cache
setup_cache()

import jax
import jax.numpy as jnp

from arrowspace_tpu.ops.pallas_tau import fused_select_tau
from arrowspace_tpu.ops.pallas_taulambda import fused_taulambda_batch

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def amortised_tau(fn, x, repeats=8, outer=5):
    @jax.jit
    def looped(xx):
        def body(c, i):
            out = fn(xx + i.astype(xx.dtype) * 1e-9)
            return c + jnp.sum(out[:1]) * 1e-20 + jnp.sum(out[::4096]) \
                * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(repeats))
        return c

    np.asarray(looped(x))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(looped(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / repeats * 1e3


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(19)

    x = jnp.asarray(rng.normal(0.5, 1.0, (1_000_000, 128))
                    .astype(np.float32))
    np.asarray(x[:1, :1])
    log("1M x 128 uploaded")

    a = np.asarray(fused_select_tau(x, kind="median", layout="bisect"))
    b = np.asarray(fused_select_tau(x, kind="median", layout="bisect4"))
    log(f"tau 1Mx128 parity bisect4: "
        f"{'EXACT' if np.array_equal(a.view(np.int32), b.view(np.int32)) else 'MISMATCH'}")
    for lay in ("bisect", "bisect4"):
        ms = amortised_tau(
            lambda xx, lay=lay: fused_select_tau(xx, kind="median",
                                                 layout=lay), x)
        log(f"tau 1Mx128 {lay:<8}: {ms:6.2f} ms")

    lap = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    lap = lap @ lap.T
    for lay in ("bisect", "bisect4"):
        ms = amortised_tau(
            lambda xx, lay=lay: fused_taulambda_batch(
                xx, lap, kind="median", layout=lay), x)
        log(f"fused tau+lambda 1Mx128 {lay:<8}: {ms:6.2f} ms")
    del x

    xw = jnp.asarray(rng.normal(0.5, 1.0, (500_000, 384))
                     .astype(np.float32))
    np.asarray(xw[:1, :1])
    log("500k x 384 uploaded")
    a = np.asarray(fused_select_tau(xw, kind="median", layout="bisect_mm"))
    b = np.asarray(fused_select_tau(xw, kind="median", layout="bisect4_mm"))
    log(f"tau 500kx384 parity bisect4_mm: "
        f"{'EXACT' if np.array_equal(a.view(np.int32), b.view(np.int32)) else 'MISMATCH'}")
    for lay in ("bisect_mm", "bisect4_mm", "bisect4"):
        ms = amortised_tau(
            lambda xx, lay=lay: fused_select_tau(xx, kind="median",
                                                 layout=lay), xw)
        log(f"tau 500kx384 {lay:<10}: {ms:6.2f} ms")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
