"""True device-time measurements, free of the host<->TPU tunnel latency.

Each op is repeated R times inside ONE jitted lax.fori_loop (data
dependence through a carry prevents elision), so a single host round-trip
amortises across R executions:  t_device ≈ (t_loop - t_rtt) / R.

Usage: python benchmarks/device_time.py
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
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/arrowspace_jax_cache")
    from arrowspace_tpu.ops.search import lambda_aware_scores
    from arrowspace_tpu.taumode import (TauMode, select_tau_batch,
                                        synthetic_lambda_batch)

    rng = np.random.default_rng(0)
    N, F, B, K, R = 1_000_000, 128, 256, 10, 20
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))

    def timed_loop(body, init, label, work_desc):
        @jax.jit
        def run(c0):
            return jax.lax.fori_loop(0, R, body, c0)

        out = run(init)                      # compile + warm
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        # rtt baseline: the same fetch with no work
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(init)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        total = time.perf_counter() - t0
        per = (total - rtt) / R * 1e3
        print(f"{label:<34} {per:8.3f} ms/op   ({work_desc})")
        return per

    # query scoring + top-k (XLA)
    def q_body(i, carry):
        s = lambda_aware_scores(Q + carry * 0, qlam, X, ilam,
                                jnp.float32(0.9))
        top, _ = jax.lax.top_k(s, K)
        return jnp.sum(top) * 1e-20

    t_q = timed_loop(q_body, jnp.float32(0.0),
                     "query B=256 over 1M x 128 (XLA)",
                     f"{2 * B * N * F / 1e9:.1f} GFLOP")

    # λτ batch
    a = rng.uniform(0, 1, (F, F))
    a = np.maximum(a, a.T) * (a > 0.9)
    np.fill_diagonal(a, 0)
    L = jnp.asarray(np.diag(a.sum(1)) - a, dtype=jnp.float32)

    def l_body(i, carry):
        taus = select_tau_batch(X + carry * 0, TauMode.median())
        lam = synthetic_lambda_batch(X, L, taus)
        return jnp.sum(lam) * 1e-20

    timed_loop(l_body, jnp.float32(0.0), "λτ batch 1M x 128 (tau+lambda)",
               f"{12 * N * F * F / 1e9:.0f} GFLOP")

    def l2_body(i, carry):
        lam = synthetic_lambda_batch(X + carry * 0, L, ilam)
        return jnp.sum(lam) * 1e-20

    t_l = timed_loop(l2_body, jnp.float32(0.0),
                     "λτ batch 1M x 128 (lambda only)",
                     f"{12 * N * F * F / 1e9:.0f} GFLOP")
    print(f"effective λτ throughput: {N / (t_l / 1e3) / 1e6:.0f}M items/s, "
          f"{12 * N * F * F / (t_l / 1e3) / 1e12:.1f} TFLOP/s")
    print(f"effective query throughput: {B / (t_q / 1e3):.0f} QPS")


if __name__ == "__main__":
    main()
