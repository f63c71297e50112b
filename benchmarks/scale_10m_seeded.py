"""Seeded (deterministic) 10M x 128 build on chip (VERDICT-r3 item 6).

The r3 rehearsals ran the UNSEEDED chunked scan at 10M (best-session
build ex-upload 87-105 s, scan 19.1 s with the at-cap tail); the seeded
path — the certified-snapshot sequential scan, C++-accelerated
(native/clustering.cpp, mirroring clustering.rs:842-846) — was only
measured at 1M (2.3-3.5 s).  At 10M it faces X ~= k_min = ceil(sqrt(N/10))
~= 1000 live centroids, an O(N*X*F) host pass nobody had timed.

Target (VERDICT): wall within ~2x of the unseeded 10M build, or a
documented bound.  Stage timing mirrors benchmarks/scale_10m_bench.py.

Usage: nohup python benchmarks/scale_10m_seeded.py > /tmp/s10m_seeded.log 2>&1 &
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    f = 128
    print(f"backend={jax.default_backend()} n={n} SEEDED", flush=True)
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

    b = (ArrowSpaceBuilder().with_lambda_graph(1e-3, 6, 3, 2.0, None)
         .with_seed(11))
    b.define_result_k()
    t0 = time.perf_counter()
    aspace = ArrowSpace.new(rows, b.synthesis)
    np.asarray(aspace.data[:1, :1])
    print(f"upload {n}x{f} ({n*f*4/1e9:.1f} GB over tunnel): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    # seed threaded into the sampler exactly as the builder
    # pipeline does (eigenmaps.py:64 — README divergence #1)
    sampler = b.sampling.make(seed=b.clustering_seed)
    t0 = time.perf_counter()
    k_opt, radius, _ = clustering.compute_optimal_k(
        rows, n, f, b.clustering_seed, device_data=aspace.data)
    t_k = time.perf_counter() - t0
    print(f"optimal-K (seeded): {t_k:.2f}s (k={k_opt}, "
          f"radius={radius:.3f})", flush=True)

    t0 = time.perf_counter()
    cent, assignments, sizes = \
        clustering.run_incremental_clustering_with_sampling(
            b, rows, f, k_opt, radius, sampler, device_data=aspace.data)
    t_scan = time.perf_counter() - t0
    print(f"seeded sequential scan (C++): {t_scan:.2f}s "
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
    t_rest = time.perf_counter() - t0
    print(f"eigenmaps + lambda-tau: {t_rest:.2f}s; TOTAL seeded build "
          f"ex-upload {t_k + t_scan + t_rest:.2f}s", flush=True)

    # determinism spot check: rebuild the FIRST 1M rows twice, assert
    # identical centroids/assignments (the certified-snapshot contract)
    sub = rows[:1_000_000]
    outs = []
    for rep in range(2):
        b2 = (ArrowSpaceBuilder().with_lambda_graph(1e-3, 6, 3, 2.0, None)
              .with_seed(11))
        b2.define_result_k()
        s2 = b2.sampling.make(seed=b2.clustering_seed)
        k2, r2, _ = clustering.compute_optimal_k(
            sub, len(sub), f, b2.clustering_seed)
        c2, a2, z2 = clustering.run_incremental_clustering_with_sampling(
            b2, sub, f, k2, r2, s2)
        outs.append((c2, [x if x is not None else -1 for x in a2], z2))
    same = (np.array_equal(outs[0][0], outs[1][0])
            and outs[0][1] == outs[1][1] and list(outs[0][2]) ==
            list(outs[1][2]))
    print(f"seeded determinism (1M rebuild twice): "
          f"{'EXACT' if same else 'MISMATCH'}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
