"""On-chip smoke + measurement of the new auto layout (_auto_layout)
at the shapes bench.py exercises: 1M x 128 (f32 + bf16), 500k x 768
(f32 + bf16, block backs off to 512/1024), energy 1M x 64 — all through
the PRODUCTION auto dispatch (no manual overrides), DCE-immune
consume-all amortised harness, flags from a real dispatch.

Usage: nohup python benchmarks/newlayout_smoke.py > /tmp/newlayout.log 2>&1 &
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

    from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_topk,
                                                   binned_lambda_topk)

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter() - t0:.1f}s",
          flush=True)

    from benchmarks._harness import amortised  # shared, DCE-immune

    rng = np.random.default_rng(0)
    B, K = 2048, 10

    for n, f in ((1_000_000, 128), (500_000, 768)):
        X = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)).astype(np.float32))
        ilam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
        Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, f)).astype(np.float32))
        qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
        np.asarray(X[:1, :1])
        print(f"corpus {n}x{f} uploaded", flush=True)
        for bf16 in (False, True):
            def body(q, x, il, bf16=bf16):
                s, i, fl = binned_lambda_topk(q, qlam, x, il, 0.9, k=K,
                                              use_bf16=bf16)
                return jnp.sum(s[:, :1]) * 1e-20

            try:
                per = amortised(body, Q, (X, ilam))
                _, _, fl = binned_lambda_topk(Q, qlam, X, ilam, 0.9, k=K,
                                              use_bf16=bf16)
                nflag = int(np.asarray(jnp.sum(fl)))
                prec = "bf16" if bf16 else "f32 "
                print(f"auto {n}x{f} {prec} {per * 1e3:7.2f} ms/batch = "
                      f"{B / per:8.0f} QPS device | flags {nflag}/{B}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"auto {n}x{f} bf16={bf16} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        del X, ilam, Q, qlam

    # energy auto
    N, G = 1_000_000, 64
    Z = jnp.asarray(rng.normal(size=(N, G)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    ZQ = jnp.asarray(rng.normal(size=(B, G)).astype(np.float32))
    zql = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    np.asarray(Z[:1, :1])

    def ebody(q, z, zl):
        s, i, fl = binned_energy_topk(q, zql, z, zl, 1.0, 0.5, k=K)
        return jnp.sum(s[:, :1]) * 1e-20

    try:
        per = amortised(ebody, ZQ, (Z, zlam))
        _, _, fl = binned_energy_topk(ZQ, zql, Z, zlam, 1.0, 0.5, k=K)
        nflag = int(np.asarray(jnp.sum(fl)))
        print(f"auto energy {N}x{G} {per * 1e3:7.2f} ms/batch = "
              f"{B / per:8.0f} QPS device | flags {nflag}/{B}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"auto energy FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
