"""On-chip A/B of the τ bitonic-sort data layouts (STATUS r3 gap 1).

The τ sort is the λτ pipeline's bound (~21 ms of the fused 25 ms at
1M×128).  The production kernel sorts each row along the LANE axis,
paying two multi-micro-op lane rolls per bitonic stage.  The sublane
layouts transpose the sub-block and sort along the SUBLANE axis, where
exchange distances j >= 8 cross whole 8-sublane registers (register
operand selection, no data movement) and only j in {1,2,4} need
intra-register rotates.  Two transpose strategies: jnp .T (Mosaic
relayout) and an exact MXU identity-matmul.

Uses the amortised lax.scan harness (RTT/R resolution ~1 ms); one
process for all measurements (device-lease discipline, CLAUDE.md).

Usage: python benchmarks/tau_layout_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from arrowspace_tpu.config import setup_cache
    setup_cache()
    from arrowspace_tpu.ops.pallas_tau import fused_select_tau
    from arrowspace_tpu.ops.pallas_taulambda import fused_taulambda_batch

    rng = np.random.default_rng(0)
    N, F = 1_000_000, 128
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    a = rng.uniform(0, 1, (F, F))
    a = np.maximum(a, a.T) * (a > 0.9)
    np.fill_diagonal(a, 0)
    L = jnp.asarray(np.diag(a.sum(1)) - a, dtype=jnp.float32)

    def t_scan(op, x0, big, label, repeats=8):
        @jax.jit
        def looped(x, *bg):
            def body(carry, i):
                xi = x * (1.0 + carry * 0.0) + i.astype(x.dtype) * 1e-7
                out = op(xi, *bg)
                return carry + jnp.sum(out[:1]) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype),
                                jnp.arange(repeats))
            return c

        t0 = time.perf_counter()
        np.asarray(looped(x0, *big))
        print(f"{label:<42} compile+first {time.perf_counter() - t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(x0, *big))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        print(f"{label:<42} amortised {per * 1e3:7.2f} ms/iter "
              f"({N / per / 1e6:.1f}M rows/s)", flush=True)
        return per

    # parity on-chip first (cheap, tiny shape): all layouts equal
    xs = jnp.asarray(rng.normal(size=(4096, F)).astype(np.float32))
    base = np.asarray(fused_select_tau(xs, kind="median"))
    for lay in ("sublane", "sublane_mm"):
        got = np.asarray(fused_select_tau(xs, kind="median", layout=lay))
        ok = np.array_equal(base, got)
        print(f"parity 4096x{F} layout={lay}: "
              f"{'EXACT' if ok else 'MISMATCH max %.3e' % np.abs(base - got).max()}",
              flush=True)

    results = {}
    for lay in ("lane", "sublane", "sublane_mm"):
        results[f"tau_{lay}"] = t_scan(
            lambda x, _lay=lay: fused_select_tau(x, kind="median",
                                                 layout=_lay),
            X, (), f"tau 1Mx128 layout={lay}")
    for lay in ("lane", "sublane", "sublane_mm"):
        results[f"taulam_{lay}"] = t_scan(
            lambda x, lap, _lay=lay: fused_taulambda_batch(
                x, lap, kind="median", layout=_lay),
            X, (L,), f"fused τ+λ 1Mx128 layout={lay}")

    print("\nsummary (amortised ms/iter):", flush=True)
    for k, v in results.items():
        print(f"  {k:<24} {v * 1e3:7.2f}")


if __name__ == "__main__":
    main()
