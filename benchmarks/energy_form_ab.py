"""On-chip A/B of the energy kernel's transcendental plane
(VERDICT-r3 item 3, after the layout sweep proved layout-insensitivity:
auto (1024, 2048, r16, pre) 19.47 ms ~= the best swept config 18.91 ms
at 1M x 64 B=2048 — benchmarks/energy_sweep_r4.py).

Hypothesis: the wall is the per-pair sqrt + divide.  Probes:
 1. the lambda kernel at F=64 (same layout machinery, 4-op fold, same
    matmul shape) — isolates the energy-specific plane cost;
 2. score_form variants: "div" (production), "rsqrt2" (two lax.rsqrt,
    no divide), "sqrt_rsqrt" (sqrt kept, divide -> rsqrt(t*t)) — all
    real-math-equal (CPU interpret: ids equal, scores within 1 ulp).

Usage: nohup python benchmarks/energy_form_ab.py > /tmp/energy_form_ab.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from arrowspace_tpu.config import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp

    from arrowspace_tpu.ops.pallas_bintopk import (
        binned_energy_topk, binned_lambda_topk, prepare_binned_corpus,
        prepare_binned_energy_corpus)
    from benchmarks._harness import amortised

    t_start = time.time()

    def log(msg):
        print(f"[{time.time()-t_start:7.1f}s] {msg}", flush=True)

    log(f"backend={jax.default_backend()}")
    np.asarray(jnp.ones((8, 128)).sum())
    log("device first-touch done")

    rng = np.random.default_rng(5)
    N, G, K, B = 1_000_000, 64, 10, 2048
    Z = jnp.asarray(rng.normal(size=(N, G)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    ZQ = jnp.asarray(rng.normal(size=(B, G)).astype(np.float32))
    zql = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    np.asarray(Z[:1, :1])
    log("corpus uploaded")

    # probe 1: lambda kernel at F=64 (its 4-op fold on the same shapes)
    xp, lp = prepare_binned_corpus(Z, zlam, bsz=B, k=K)
    per = amortised(
        lambda q, x, l_: (jnp.sum(binned_lambda_topk(
            q, zql, x, l_, 0.9, k=K, prepared=True,
            n_items=N)[0][:, :1]) * 1e-20),
        ZQ, (xp, lp)) * 1e3
    log(f"lambda kernel F=64 (4-op fold):  {per:6.2f} ms/batch "
        f"({B/per:.1f}k QPS)")
    del xp, lp

    zp, zl, zn = prepare_binned_energy_corpus(Z, zlam, bsz=B, k=K)
    for form in ("div", "rsqrt2", "sqrt_rsqrt"):
        def body(q, z, l_, n_, form=form):
            s, i, fl = binned_energy_topk(
                q, zql, z, l_, 1.0, 0.5, k=K, prepared=True, n_items=N,
                z_norms=n_, score_form=form)
            return jnp.sum(s[:, :1]) * 1e-20

        try:
            per = amortised(body, ZQ, (zp, zl, zn)) * 1e3
            _, _, fl = binned_energy_topk(
                ZQ, zql, zp, zl, 1.0, 0.5, k=K, prepared=True, n_items=N,
                z_norms=zn, score_form=form)
            nfl = int(np.asarray(fl).sum())
            log(f"energy form {form:<11}: {per:6.2f} ms/batch "
                f"({B/per:.1f}k QPS), flags {nfl}/{B}")
        except Exception as e:  # noqa: BLE001
            log(f"energy form {form:<11}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
