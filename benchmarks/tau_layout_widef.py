"""Wide-F on-chip A/B of the τ sort layouts (lane vs sublane).

Companion to tau_layout_bench.py: measures the shapes where the sort is
sub-tiled for VMEM (F=384 -> f2=512, F=768 -> f2=1024) before the
production default flips to the winner.  sublane_mm is excluded: the
MXU identity-matmul transpose is NOT exact on the real chip (measured
max |Δτ| 9.2e-4 at 4096x128 — the f32 matmul truncates), and τ parity
must be bitwise.

Usage: python benchmarks/tau_layout_widef.py
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
    from arrowspace_tpu.ops.pallas_tau import (fused_select_tau,
                                               fused_select_tau_fits)

    rng = np.random.default_rng(1)

    def t_scan(op, x0, label, repeats=8):
        @jax.jit
        def looped(x):
            def body(carry, i):
                xi = x * (1.0 + carry * 0.0) + i.astype(x.dtype) * 1e-7
                out = op(xi)
                return carry + jnp.sum(out[:1]) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype),
                                jnp.arange(repeats))
            return c

        t0 = time.perf_counter()
        np.asarray(looped(x0))
        print(f"{label:<40} compile+first {time.perf_counter() - t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(x0))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        n = x0.shape[0]
        print(f"{label:<40} amortised {per * 1e3:7.2f} ms/iter "
              f"({n / per / 1e6:.1f}M rows/s)", flush=True)
        return per

    for n, f in ((500_000, 384), (500_000, 768)):
        if not fused_select_tau_fits(f):
            print(f"F={f}: fits gate says XLA path; skipping", flush=True)
            continue
        X = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)).astype(np.float32))
        # parity on a slice first (both kinds)
        xs = X[:4096]
        for kind, pct in (("median", 0.5), ("percentile", 0.75)):
            a = np.asarray(fused_select_tau(xs, kind=kind, pct=pct))
            b = np.asarray(fused_select_tau(xs, kind=kind, pct=pct,
                                            layout="sublane"))
            ok = np.array_equal(a, b)
            print(f"parity 4096x{f} {kind}: "
                  f"{'EXACT' if ok else 'MISMATCH %.3e' % np.abs(a - b).max()}",
                  flush=True)
        for lay in ("lane", "sublane"):
            t_scan(lambda x, _l=lay: fused_select_tau(x, kind="median",
                                                      layout=_l),
                   X, f"tau {n // 1000}kx{f} layout={lay}")
        del X


if __name__ == "__main__":
    main()
