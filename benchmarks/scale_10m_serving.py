"""10M x 128 serving: honest amortised + REAL-dispatch walls, f32/bf16,
raw vs prepared corpus.

Completes the scale story after the DCE audit and the prepared-corpus
hoist: at 10M the per-dispatch normalise+pad producer is ~13 ms of HBM
traffic (read 5.1 GB + write 5.4 GB at 819 GB/s) that only REAL
dispatches pay — the amortised harness can't see it (XLA hoists the
loop-invariant producer out of the measurement scan).  bf16 halves the
corpus stream and the prepared copy.

One process, one upload (device-lease discipline).  No build here —
item lambdas are synthetic; the kernel cost is shape-driven.

Usage: nohup python benchmarks/scale_10m_serving.py > /tmp/s10m_serve.log 2>&1 &
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

    from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                                   prepare_binned_corpus)
    from benchmarks._harness import amortised

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"first-touch {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    N, F, B, K = 10_000_000, 128, 2048, 10
    rows = np.empty((N, F), dtype=np.float32)
    step = 1_000_000
    for c0 in range(0, N, step):
        rows[c0:c0 + step] = rng.uniform(
            0.1, 1.0, (step, F)).astype(np.float32)
    t0 = time.perf_counter()
    X = jnp.asarray(rows)
    np.asarray(X[:1, :1])
    print(f"upload 5.1 GB: {time.perf_counter() - t0:.1f}s", flush=True)
    del rows
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))

    warm = jnp.zeros((4,))
    np.asarray(warm[:1])
    rtts = []
    for _ in range(9):
        t0 = time.perf_counter()
        np.asarray(warm[:1])
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"RTT {rtt * 1e3:.1f} ms", flush=True)

    def wall(fn, label):
        fn(0)
        ts = []
        for rep in range(5):
            t0 = time.perf_counter()
            jax.device_get(fn(rep))
            ts.append(time.perf_counter() - t0)
        w = float(np.median(ts))
        dev = max(w - rtt, 1e-6)
        print(f"{label}: wall {w * 1e3:7.2f} ms (wall-RTT {dev * 1e3:7.2f} "
              f"ms = {B / dev:7.0f} QPS device)", flush=True)

    for bf16 in (False, True):
        prec = "bf16" if bf16 else "f32 "

        def body(q, x, il, bf16=bf16):
            s, i, fl = binned_lambda_topk(q, qlam, x, il, 0.9, k=K,
                                          use_bf16=bf16)
            return jnp.sum(s[:, :1]) * 1e-20

        per = amortised(body, Q, (X, ilam), repeats=4)
        _, _, fl = binned_lambda_topk(Q, qlam, X, ilam, 0.9, k=K,
                                      use_bf16=bf16)
        print(f"10M auto {prec} amortised {per * 1e3:7.2f} ms/batch = "
              f"{B / per:7.0f} QPS device | flags "
              f"{int(np.asarray(jnp.sum(fl)))}/{B}", flush=True)

        xh, xl = prepare_binned_corpus(X, ilam, bsz=B, k=K, use_bf16=bf16)
        np.asarray(xh[:1, :1])
        wall(lambda r, bf16=bf16: binned_lambda_topk(
            Q + np.float32(r) * 1e-7, qlam, X, ilam, 0.9, k=K,
            use_bf16=bf16), f"10M raw      {prec} B=2048")
        wall(lambda r, bf16=bf16, xh=xh, xl=xl: binned_lambda_topk(
            Q + np.float32(r) * 1e-7, qlam, xh, xl, 0.9, k=K,
            use_bf16=bf16, prepared=True, n_items=N),
            f"10M prepared {prec} B=2048")
        del xh, xl
    print("done", flush=True)


if __name__ == "__main__":
    main()
