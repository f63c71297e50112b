"""10M x 128 follow-up: scan phase split + binned-kernel block/lane_split A/B.

One process, one upload (device-lease discipline).  Measures:
- unseeded chunked scan with the at-cap tail (phase logs from
  clustering's INFO timers: pre-cap vs tail)
- eigenmaps + λτ (sublane τ layout at the 10M bucket)
- binned query kernel at B=2048, DCE-immune consume-all harness (the
  first committed sweep here consumed one row and its numbers were
  partially elided — see benchmarks/dce_audit.py): auto layout
  (resident-block b1024/t2048/r16), b256/r1 (8 streams), b1024/r8,
  b1024/r16 — with flag counts from a real dispatch

Usage: python benchmarks/scale_10m_roundtrip.py [N]
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
    from arrowspace_tpu import clustering
    from arrowspace_tpu import eigenmaps as em
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.core import ArrowSpace
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    f = 128
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter()-t0:.2f}s", flush=True)

    rng = np.random.default_rng(0)
    centers = rng.uniform(0.2, 0.8, (256, f)).astype(np.float32)
    rows = np.empty((n, f), dtype=np.float32)
    step = 1_000_000
    for c0 in range(0, n, step):
        m = min(step, n - c0)
        rows[c0:c0 + m] = (centers[rng.integers(0, 256, m)]
                           + rng.normal(0, 0.05, (m, f)))
    print("host corpus generated", flush=True)

    b = ArrowSpaceBuilder().with_lambda_graph(1e-3, 6, 3, 2.0, None)
    b.define_result_k()
    t0 = time.perf_counter()
    aspace = ArrowSpace.new(rows, b.synthesis)
    np.asarray(aspace.data[:1, :1])
    print(f"upload: {time.perf_counter()-t0:.1f}s", flush=True)

    sampler = b.sampling.make()
    t0 = time.perf_counter()
    k_opt, radius, _ = clustering.compute_optimal_k(
        rows, n, f, None, device_data=aspace.data)
    print(f"optimal-K: {time.perf_counter()-t0:.2f}s (k={k_opt}, "
          f"radius={radius:.3f})", flush=True)
    t0 = time.perf_counter()
    cent, assignments, sizes = \
        clustering.run_incremental_clustering_with_sampling(
            b, rows, f, k_opt, radius, sampler, device_data=aspace.data)
    print(f"incremental scan: {time.perf_counter()-t0:.2f}s "
          f"(clusters={cent.shape[0]})", flush=True)
    b.cluster_max_clusters, b.cluster_radius = k_opt, radius
    aspace.n_clusters = cent.shape[0]
    aspace.cluster_assignments = np.asarray(assignments, dtype=np.int64)
    aspace.cluster_sizes = np.asarray(sizes, dtype=np.int64)
    aspace.cluster_radius = radius
    t0 = time.perf_counter()
    gl = em.eigenmaps(aspace, b, cent, n)
    em.compute_taumode(aspace, gl)
    np.asarray(aspace.lambdas[:1])
    print(f"eigenmaps + λτ (sublane): {time.perf_counter()-t0:.2f}s",
          flush=True)

    B, K = 2048, 10
    Q = jnp.asarray(rows[rng.integers(0, n, B)] * 1.01)
    qlam = jnp.asarray(rng.uniform(0, 1, B).astype(np.float32))

    # Consume one scalar from EVERY row: the original [:1, :1] consume
    # let XLA eliminate the unconsumed query-block pallas_calls
    # (benchmarks/dce_audit.py), which invalidated this sweep's first
    # committed numbers — different (block, r) elide different
    # fractions, so they weren't even comparable.
    for label, blk, r in (("auto (new layout)", 0, 0),
                          ("b256/r1 (8 streams)", 256, 1),
                          ("b1024/r8 t1024", 1024, 8),
                          ("b1024/r16 t2048", 1024, 16)):
        def looped(q, x, il, _b=blk, _r=r):
            def body(carry, i):
                qi = q * (1.0 + carry * 0.0) + i.astype(q.dtype) * 1e-7
                s, _, _ = binned_lambda_topk(
                    qi, qlam, x, il, 0.9, k=K, block_b=_b, lane_split=_r,
                    pre_reduce=(True if _r > 1 else None),
                    tile=(2048 if _r == 16 else 0))
                return carry + jnp.sum(s[:, :1]) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype),
                                jnp.arange(4))
            return c

        jl = jax.jit(looped)
        t0 = time.perf_counter()
        np.asarray(jl(Q, aspace.data, aspace.lambdas))
        print(f"query {label}: first dispatch "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jl(Q, aspace.data, aspace.lambdas))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / 4
        _, _, fl = binned_lambda_topk(Q, qlam, aspace.data, aspace.lambdas,
                                      0.9, k=K, block_b=blk, lane_split=r,
                                      pre_reduce=(True if r > 1 else None),
                                      tile=(2048 if r == 16 else 0))
        print(f"query {label}: {per*1e3:.2f} ms/batch = {B/per:.0f} QPS "
              f"device, flags {int(np.asarray(fl).sum())}/{B}", flush=True)


if __name__ == "__main__":
    main()
