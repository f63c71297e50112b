"""Device-time estimates with the host<->TPU tunnel RTT subtracted.

Methodology: every dispatch in this environment pays a ~20-25 ms tunnel
round trip (measured per run with a no-op fetch); per-op device time is
measured wall time minus that RTT.  block_until_ready returns early
through the tunnel, so completion is forced by fetching one output
element.

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
    from arrowspace_tpu.ops.pallas_topk import fused_lambda_topk
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk
    from arrowspace_tpu.taumode import (TauMode, select_tau_batch,
                                        synthetic_lambda_batch)

    rng = np.random.default_rng(0)
    N, F, B, K = 1_000_000, 128, 256, 10
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    a = rng.uniform(0, 1, (F, F))
    a = np.maximum(a, a.T) * (a > 0.9)
    np.fill_diagonal(a, 0)
    L = jnp.asarray(np.diag(a.sum(1)) - a, dtype=jnp.float32)

    # tunnel RTT: median of cached-array fetches
    warm = jnp.zeros((4,))
    np.asarray(warm[:1])
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(warm[:1])
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel RTT: {rtt * 1e3:.1f} ms")

    def t(fn, label, flops=None):
        r = fn()
        np.asarray(r.reshape(-1)[:1])          # warm/compile
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            r = fn()
            np.asarray(r.reshape(-1)[:1])
            ts.append(time.perf_counter() - t0)
        wall = float(np.median(ts))
        dev = max(wall - rtt, 1e-6)
        extra = ""
        if flops:
            extra = f", {flops / dev / 1e12:.1f} TFLOP/s effective"
        print(f"{label:<38} wall {wall * 1e3:7.2f} ms | device "
              f"~{dev * 1e3:7.2f} ms{extra}")
        return dev

    d_q = t(lambda: batched_lambda_aware_topk(
        Q, qlam, X, ilam, jnp.float32(0.9), k=K)[0],
        "query B=256, 1M x 128 (XLA)", 2 * B * N * F)
    d_p = t(lambda: fused_lambda_topk(Q, qlam, X, ilam, 0.9, k=K)[0],
            "query B=256, 1M x 128 (pallas)", 2 * B * N * F)
    d_pb = t(lambda: fused_lambda_topk(Q, qlam, X, ilam, 0.9, k=K,
                                       use_bf16=True)[0],
             "query B=256, 1M x 128 (pallas bf16)", 2 * B * N * F)

    from arrowspace_tpu.ops.pallas_tau import fused_select_tau
    t(lambda: jnp.sort(X, axis=1)[:, 0], "tau median 1M x 128 (XLA sort)")
    d_tau = t(lambda: fused_select_tau(X, kind="median"),
              "tau median 1M x 128 (pallas bitonic)")
    taus = select_tau_batch(X, TauMode.median())
    d_lam = t(lambda: synthetic_lambda_batch(X, L, taus),
              "λ batch 1M x 128 (given tau)", 12 * N * F * F)

    print(f"\nquery QPS (device): xla {B / d_q:.0f}, pallas {B / d_p:.0f}, "
          f"pallas bf16 {B / d_pb:.0f}")
    print(f"λτ items/s (device, incl tau): {N / (d_tau + d_lam) / 1e6:.1f}M")


if __name__ == "__main__":
    main()
