"""Recall benchmark: λ-aware search vs brute-force cosine ground truth
at equal memory (BASELINE.json: "SIFT1M 128-d ... recall@10/@100 vs
flat-cosine at equal memory").

SIFT1M cannot be downloaded in this environment (zero egress), so a
SIFT-like corpus is synthesised: 128-d, clustered, positive-skewed
magnitudes.  The index stores exactly the raw vectors plus one λ scalar
per row — memory parity with a flat cosine index up to (N+1)/N.

Usage: python benchmarks/recall_bench.py [N] (default 100_000)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sift_like(n: int, f: int = 128, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n_clusters = 64
    centers = rng.gamma(2.0, 20.0, (n_clusters, f))
    labels = rng.integers(0, n_clusters, n)
    rows = centers[labels] + rng.normal(0, 8.0, (n, f))
    return np.maximum(rows, 0.0)  # SIFT is non-negative


def main() -> None:
    import jax
    import jax.numpy as jnp
    from arrowspace_tpu.config import setup_cache
    setup_cache()   # call-site-invariant keys + persist everything
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.ops.search import (batched_lambda_aware_topk,
                                           cosine_scores)
    from arrowspace_tpu.taumode import select_tau_batch, \
        synthetic_lambda_batch

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = 100
    corpus = sift_like(n)
    queries = sift_like(n_queries, seed=99) * 0.98 \
        + corpus[:n_queries] * 0.02  # near-corpus queries

    t0 = time.time()
    builder = (ArrowSpaceBuilder()
               .with_lambda_graph(0.5, 8, 4, 2.0, None)
               .with_seed(7))
    aspace, gl = builder.build(corpus)
    print(f"build({n}x128): {time.time() - t0:.1f}s "
          f"clusters={aspace.n_clusters}", file=sys.stderr)

    dt = aspace.data.dtype
    qd = jnp.asarray(queries, dtype=dt)
    # ground truth: brute cosine
    gt_scores = cosine_scores(qd, aspace.data)
    gt100 = np.asarray(jax.lax.top_k(gt_scores, 100)[1])

    taus = select_tau_batch(qd, aspace.taumode)
    qlam = synthetic_lambda_batch(qd, gl.matrix.astype(dt), taus)

    print(f"{'alpha':>6} {'recall@10':>10} {'recall@100':>11}")
    for alpha in (1.0, 0.95, 0.9, 0.8, 0.7):
        _, idx = batched_lambda_aware_topk(
            qd, qlam, aspace.data, aspace.lambdas,
            jnp.asarray(alpha, dtype=dt), k=100)
        idx = np.asarray(idx)
        r10 = np.mean([len(set(idx[i][:10]) & set(gt100[i][:10])) / 10.0
                       for i in range(n_queries)])
        r100 = np.mean([len(set(idx[i]) & set(gt100[i])) / 100.0
                        for i in range(n_queries)])
        print(f"{alpha:>6.2f} {r10:>10.3f} {r100:>11.3f}")
        if alpha == 1.0:
            assert r10 == 1.0, "alpha=1 must equal brute cosine"

    # exact-recall serving path: f64 re-ranking of the device candidate
    # pool against the original rows (recovers f32 tie flips; see
    # index.search(precision="f64_rescore"))
    from arrowspace_tpu.index import ArrowIndex
    index = ArrowIndex(aspace, gl, builder)
    s64, i64 = index.search(queries, k=10, alpha=1.0,
                            precision="f64_rescore")
    cosd = queries @ corpus.T / (
        np.linalg.norm(queries, axis=1)[:, None]
        * np.linalg.norm(corpus, axis=1)[None, :])
    gt64 = np.argsort(-cosd, axis=1, kind="stable")[:, :10]
    exact = np.mean([list(i64[i]) == list(gt64[i])
                     for i in range(n_queries)])
    print(f"f64_rescore exact-order@10 vs f64 brute force: {exact:.3f}")
    assert exact == 1.0


if __name__ == "__main__":
    main()
