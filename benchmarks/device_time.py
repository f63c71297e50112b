"""Device-time estimates with the host<->TPU tunnel RTT subtracted.

Methodology: every dispatch in this environment pays a ~20-35 ms tunnel
round trip (measured per run with a no-op fetch); per-op device time is
measured wall time minus that RTT.  block_until_ready returns early
through the tunnel, so completion is forced by fetching one output
element.

RTT subtraction leaves +-6 ms of noise on a single dispatch — useless
for kernel A/Bs in the 5-20 ms range.  The AMORTISED harness (t_scan)
therefore runs the op R times inside one jitted lax.scan (inputs
perturbed per iteration so nothing is CSE'd away) and divides one
dispatch's wall by R: the RTT appears once across R executions, so
per-iteration resolution is RTT/R ~ 1 ms at R=32.

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
    from arrowspace_tpu.config import setup_cache
    setup_cache()   # call-site-invariant keys + persist everything
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

    def t_scan(op, q0, big_args, label, repeats=32, flops=None):
        """Amortised device time: ONE dispatch runs `op` `repeats` times
        via lax.scan, each iteration on a slightly perturbed first
        operand (CSE-proof), chained through a carried scalar so the
        iterations cannot be elided.  Per-iteration time = wall /
        repeats with the RTT amortised to noise.  Large arrays (the
        corpus) MUST come through big_args — a closure capture would
        embed them as HLO constants and blow the remote-compile limit.

        The carry consumes one scalar from EVERY output row so that a
        B>block batch (ceil(B/block) concatenated pallas_calls) leaves
        no call dead — DCE-immune (benchmarks/dce_audit.py)."""
        @jax.jit
        def looped(q, *big):
            def body(carry, i):
                qi = q * (1.0 + carry * 0.0) + i.astype(q.dtype) * 1e-7
                out = op(qi, *big)
                first = out[0] if isinstance(out, tuple) else out
                s = jnp.sum(first.reshape(first.shape[0], -1)[:, :1])
                return carry + s * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype),
                                jnp.arange(repeats))
            return c

        np.asarray(looped(q0, *big_args))      # warm/compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(q0, *big_args))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        extra = ""
        if flops:
            extra = f", {flops / per / 1e12:.1f} TFLOP/s effective"
        print(f"{label:<38} amortised device {per * 1e3:7.2f} ms/iter "
              f"over {repeats}{extra}")
        return per

    d_q = t(lambda: batched_lambda_aware_topk(
        Q, qlam, X, ilam, jnp.float32(0.9), k=K)[0],
        "query B=256, 1M x 128 (XLA)", 2 * B * N * F)
    d_p = t(lambda: fused_lambda_topk(Q, qlam, X, ilam, 0.9, k=K)[0],
            "query B=256, 1M x 128 (pallas)", 2 * B * N * F)
    d_pb = t(lambda: fused_lambda_topk(Q, qlam, X, ilam, 0.9, k=K,
                                       use_bf16=True)[0],
             "query B=256, 1M x 128 (pallas bf16)", 2 * B * N * F)

    # amortised (RTT-free) versions of the same — the numbers to trust
    # for kernel A/Bs
    d_p_a = t_scan(lambda q, x, il: fused_lambda_topk(q, qlam, x, il, 0.9,
                                                      k=K),
                   Q, (X, ilam), "query B=256 (pallas, amortised)",
                   repeats=16, flops=2 * B * N * F)
    d_pb_a = t_scan(lambda q, x, il: fused_lambda_topk(q, qlam, x, il,
                                                       0.9, k=K,
                                                       use_bf16=True),
                    Q, (X, ilam), "query B=256 (pallas bf16, amortised)",
                    repeats=16, flops=2 * B * N * F)

    from arrowspace_tpu.ops.pallas_tau import fused_select_tau
    t(lambda: jnp.sort(X, axis=1)[:, 0], "tau median 1M x 128 (XLA sort)")
    d_tau = t(lambda: fused_select_tau(X, kind="median"),
              "tau median 1M x 128 (pallas bitonic)")
    taus = select_tau_batch(X, TauMode.median())
    d_lam = t(lambda: synthetic_lambda_batch(X, L, taus),
              "λ batch 1M x 128 (given tau)", 12 * N * F * F)

    from arrowspace_tpu.ops.pallas_taulambda import fused_taulambda_batch
    d_tl_a = t_scan(lambda x, lap: fused_taulambda_batch(x, lap,
                                                         kind="median"),
                    X, (L,), "fused τ+λ 1M x 128 (amortised)", repeats=8)
    print(f"fused τ+λ amortised: {N / d_tl_a / 1e6:.1f}M items/s")

    print(f"\nquery QPS (device): xla {B / d_q:.0f}, pallas {B / d_p:.0f}, "
          f"pallas bf16 {B / d_pb:.0f}")
    print(f"query QPS (amortised): pallas {B / d_p_a:.0f}, "
          f"bf16 {B / d_pb_a:.0f}")
    print(f"λτ items/s (device, incl tau): {N / (d_tau + d_lam) / 1e6:.1f}M")


if __name__ == "__main__":
    main()
