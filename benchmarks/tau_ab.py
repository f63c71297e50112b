"""A/B: lane-row-broadcast bitonic masks vs today's baseline.

Baselines from this morning's bench (same harness): fused tau+lambda
1M x 128 amortised 24.5-24.9 ms; tau-alone ~15-18 ms (wall-RTT r2).

Usage: python benchmarks/tau_ab.py
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

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter()-t0:.2f}s", flush=True)

    rng = np.random.default_rng(0)
    N, F = 1_000_000, 128
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    a = rng.uniform(0, 1, (F, F))
    a = np.maximum(a, a.T) * (a > 0.9)
    np.fill_diagonal(a, 0)
    L = jnp.asarray(np.diag(a.sum(1)) - a, dtype=jnp.float32)
    np.asarray(X[:1, :1])

    def t_scan(op, first, big, label, repeats=8):
        @jax.jit
        def looped(q, *bigs):
            def body(carry, i):
                qi = q * (1.0 + carry * 0.0) + i.astype(q.dtype) * 1e-7
                out = op(qi, *bigs)
                s = jnp.sum((out[0] if isinstance(out, tuple)
                             else out).reshape(-1)[:1])
                return carry + s * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype),
                                jnp.arange(repeats))
            return c
        t0 = time.perf_counter()
        np.asarray(looped(first, *big))
        print(f"  [{label}: first (compile?) {time.perf_counter()-t0:.1f}s]",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(first, *big))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        print(f"{label:<40} {per*1e3:8.2f} ms/iter", flush=True)
        return per

    t_tau = t_scan(lambda x: fused_select_tau(x, kind="median"), X, (),
                   "tau median 1M x 128 (lane masks)", 8)
    t_tl = t_scan(lambda x, lap: fused_taulambda_batch(x, lap,
                                                       kind="median"),
                  X, (L,), "fused tau+lambda 1M x 128 (lane masks)", 8)
    print(f"tau-alone {t_tau*1e3:.2f} ms (r2 baseline 15-18); "
          f"fused {t_tl*1e3:.2f} ms (today's baseline 24.5) = "
          f"{N/t_tl/1e6:.1f}M items/s", flush=True)


if __name__ == "__main__":
    main()
