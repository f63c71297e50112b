"""Wide-F production shape: 500k x 768 on the real chip (VERDICT r2 #4).

The 100M x 768 target config's kernels had only ever been measured at
F=128/200/384; this measures the fused tau+lambda kernel and the binned
query kernel at F=768, f32 and bf16, via precompile.warm first (novel
Mosaic buckets at wide F compile in minutes through the remote service —
the documented deploy-time precompile case).

Also measures the tunnel's fetch batching: one jax.device_get of a
tuple vs sequential np.asarray fetches — decides whether the serving
stream should pack scores+ids into one array.

Usage: python benchmarks/wide_f_bench.py
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

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter() - t0:.2f}s", flush=True)

    # ---- tunnel fetch batching (FRESH arrays per iteration — repeated
    # np.asarray of the same jax array returns a cached host copy) ---------
    mk = jax.jit(lambda i: (jnp.full((256, 10), i, jnp.float32),
                            jnp.full((256, 11), i, jnp.int32)))
    a0, b0 = mk(0)
    np.asarray(a0); np.asarray(b0)
    ts = []
    for i in range(1, 8):
        a, b = mk(i)
        t0 = time.perf_counter()
        np.asarray(a); np.asarray(b)
        ts.append(time.perf_counter() - t0)
    t_two = float(np.median(ts))
    ts = []
    for i in range(8, 15):
        a, b = mk(i)
        t0 = time.perf_counter()
        jax.device_get((a, b))
        ts.append(time.perf_counter() - t0)
    t_tuple = float(np.median(ts))
    print(f"fetch (fresh): 2x np.asarray {t_two*1e3:.1f} ms vs "
          f"device_get(tuple) {t_tuple*1e3:.1f} ms", flush=True)

    # ---- wide-F precompile -------------------------------------------------
    N, F, K = 500_000, 768, 10
    from arrowspace_tpu.precompile import warm
    t0 = time.perf_counter()
    timings = warm(N, F, batch_sizes=(256, 2048), k=K,
                   precisions=("f32", "bf16"))
    print(f"precompile.warm(500k, 768): {time.perf_counter()-t0:.1f}s "
          f"({ {k: round(v, 1) for k, v in timings.items()} })", flush=True)

    # ---- data (clustered, realistic lambda spread) ------------------------
    rng = np.random.default_rng(0)
    centers = rng.uniform(0.2, 0.8, (64, F)).astype(np.float32)
    X_host = (centers[rng.integers(0, 64, N)]
              + rng.normal(0, 0.05, (N, F))).astype(np.float32)
    t0 = time.perf_counter()
    X = jnp.asarray(X_host)
    np.asarray(X[:1, :1])
    print(f"corpus upload 500k x 768 (1.5 GB): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    # ---- fused tau+lambda at F=768 ----------------------------------------
    from arrowspace_tpu.taumode import compute_taumode_lambdas, TauMode
    a768 = rng.uniform(0, 1, (F, F))
    a768 = np.maximum(a768, a768.T) * (a768 > 0.995)
    np.fill_diagonal(a768, 0)
    L = jnp.asarray(np.diag(a768.sum(1)) - a768, dtype=jnp.float32)

    def t_scan(op, first, big, label, repeats=4):
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
        print(f"  [{label}: first dispatch (maybe compiling) "
              f"{time.perf_counter()-t0:.1f}s]", flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(first, *big))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        print(f"{label:<44} {per*1e3:8.2f} ms/iter", flush=True)
        return per

    t_lam = t_scan(lambda x, lap: compute_taumode_lambdas(
        x, lap, TauMode.median()), X, (L,), "tau+lambda 500k x 768", 4)
    print(f"lambda-tau 500k x 768: {N/t_lam/1e6:.1f}M items/s", flush=True)

    # ---- binned query kernel at F=768 -------------------------------------
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    B = 2048
    Q = jnp.asarray(X_host[rng.integers(0, N, B)] * 1.01)
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    for prec, bf16 in (("f32", False), ("bf16", True)):
        per = t_scan(
            lambda q, x, il: binned_lambda_topk(q, qlam, x, il, 0.9, k=K,
                                                use_bf16=bf16),
            Q, (X, ilam), f"binned query B=2048 {prec} 500k x 768", 4)
        _, _, fl = binned_lambda_topk(Q, qlam, X, ilam, 0.9, k=K,
                                      use_bf16=bf16)
        flops = 2 * B * N * F
        print(f"  -> {B/per:.0f} QPS device, {flops/per/1e12:.1f} TFLOP/s, "
              f"flags {int(np.asarray(fl).sum())}/{B}", flush=True)


if __name__ == "__main__":
    main()
