"""On-chip A/B: bisection SELECTION τ vs the bitonic-sort τ (VERDICT-r3
item 7).

The τ median costs a full per-row bitonic sort (28 stages at F=128,
each two pltpu.rolls + a blend — and a roll measures ~3x its naive op
count), yet a median needs only a selection.  The bisect layouts binary-
search the sortable-int value range: 32 passes of one broadcast compare
+ one count-reduce, no exchange network, no pad to the next power of
two.  Naive arithmetic: ~3 element-ops/pass * 32 = ~100 vs the sort's
~300+ effective — worth ~2-3x IF count-reduces lower as cheaply as the
model assumes; this script measures it.

Parity on-chip first (bitwise vs the production sublane sort), then the
amortised timings for τ-alone and the fused τ+λ kernel at 1M x 128 and
500k x 384 (wide F: bisect also skips the 384 -> 512 pad the sort pays).

Usage: python benchmarks/tau_select_ab.py
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

    def t_scan(op, x0, big, label, n, repeats=8):
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
        print(f"{label:<46} compile+first {time.perf_counter() - t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(x0, *big))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        print(f"{label:<46} amortised {per * 1e3:7.2f} ms/iter "
              f"({n / per / 1e6:.1f}M rows/s)", flush=True)
        return per

    # on-chip parity at 4096 rows, both kinds, both widths
    for f in (128, 384):
        xs = np.asarray(rng.normal(size=(4096, f)), np.float32)
        xs[3, :7] = np.nan
        xs[11] = np.inf
        xj = jnp.asarray(xs)
        for kind in ("median", "percentile"):
            base = np.asarray(fused_select_tau(xj, kind=kind, pct=0.75))
            for lay in ("bisect", "bisect_lane"):
                got = np.asarray(fused_select_tau(xj, kind=kind, pct=0.75,
                                                  layout=lay))
                ok = np.array_equal(base, got)
                print(f"parity 4096x{f} {kind} layout={lay}: "
                      f"{'EXACT' if ok else 'MISMATCH max %.3e' % np.abs(base - got).max()}",
                      flush=True)

    N, F = 1_000_000, 128
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    a = rng.uniform(0, 1, (F, F))
    a = np.maximum(a, a.T) * (a > 0.9)
    np.fill_diagonal(a, 0)
    L = jnp.asarray(np.diag(a.sum(1)) - a, dtype=jnp.float32)

    results = {}
    for lay in ("sublane", "bisect", "bisect_lane"):
        results[f"tau128_{lay}"] = t_scan(
            lambda x, _lay=lay: fused_select_tau(x, kind="median",
                                                 layout=_lay),
            X, (), f"tau 1Mx128 layout={lay}", N)
    for lay in ("sublane", "bisect", "bisect_lane"):
        results[f"taulam128_{lay}"] = t_scan(
            lambda x, lap, _lay=lay: fused_taulambda_batch(
                x, lap, kind="median", layout=_lay),
            X, (L,), f"fused τ+λ 1Mx128 layout={lay}", N)

    # wide-F: the sort pays the 384->512 pad, bisect does not
    N2, F2 = 500_000, 384
    X2 = jnp.asarray(rng.uniform(0.1, 1.0, (N2, F2)).astype(np.float32))
    for lay in ("sublane", "bisect"):
        results[f"tau384_{lay}"] = t_scan(
            lambda x, _lay=lay: fused_select_tau(x, kind="median",
                                                 layout=_lay),
            X2, (), f"tau 500kx384 layout={lay}", N2)

    print("\nsummary (amortised ms/iter):", flush=True)
    for k, v in results.items():
        print(f"  {k:<24} {v * 1e3:7.2f}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
