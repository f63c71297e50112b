"""Graph / λ / search quality metrics.

Port of the example-side quality metrics (reference:
examples/common/lib.rs:190-447) — connectivity ratio, λ-distribution
quality, edge-count efficiency, search effectiveness, and the weighted
quality combinations used by the examples for parameter exploration.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

__all__ = [
    "graph_connectivity_ratio", "lambda_distribution_quality",
    "edge_count_efficiency", "search_effectiveness_score",
    "evaluate_graph_quality", "evaluate_parameter_quality",
    "jaccard_similarity",
]


def _count_edges(matrix) -> int:
    """Negative off-diagonal entries / 2 (symmetric Laplacian edges)."""
    m = np.asarray(matrix)
    off = m.copy()
    np.fill_diagonal(off, 0.0)
    return int((off < 0.0).sum()) // 2


def graph_connectivity_ratio(matrix) -> float:
    """Edges relative to the spanning-tree minimum, scaled by 0.95 and
    capped at 1 (lib.rs:193-228)."""
    m = np.asarray(matrix)
    nrows, ncols = m.shape
    if nrows != ncols or nrows <= 1:
        return 1.0 if nrows <= 1 else 0.0
    total_edges = _count_edges(m)
    max_possible = nrows * (nrows - 1) // 2
    if max_possible == 0:
        return 1.0
    min_connectivity_edges = nrows - 1
    ratio = total_edges / min_connectivity_edges
    return min(ratio * 0.95, 1.0)


def lambda_distribution_quality(lambdas) -> float:
    """0.4·spread + 0.6·in-[0,1]-range quality (lib.rs:231-269)."""
    lam = np.asarray(lambdas, dtype=np.float64)
    if lam.size == 0:
        return 0.0
    valid = lam[np.isfinite(lam) & (lam >= 0.0)]
    if valid.size == 0:
        return 0.0
    mean = float(valid.mean())
    std = float(valid.std())
    spread_quality = min(std / (mean + 1e-6), 1.0) if std > 1e-6 else 0.1
    in_range = float(((valid >= 0.0) & (valid <= 1.0)).mean())
    return 0.4 * spread_quality + 0.6 * in_range


def edge_count_efficiency(adjacency_matrix) -> float:
    """Sparse-but-connected score (lib.rs:272-311)."""
    m = np.asarray(adjacency_matrix)
    nrows, ncols = m.shape
    if nrows != ncols or nrows <= 1:
        return 1.0 if nrows <= 1 else 0.0
    total_edges = _count_edges(m)
    min_edges = nrows - 1
    max_reasonable = min(nrows * 6, nrows * (nrows - 1) // 2)
    if total_edges < min_edges:
        return total_edges / min_edges * 0.3
    if total_edges <= max_reasonable:
        sparsity_score = 1.0 - (total_edges - min_edges) / max(
            max_reasonable - min_edges, 1)
    else:
        sparsity_score = 0.1
    return 0.7 + 0.3 * sparsity_score


def search_effectiveness_score(aspace, queries: Sequence[Sequence[float]],
                               alpha: float, beta: float, k: int) -> float:
    """Result-quality heuristic over test queries (lib.rs:324-393).
    Note: like the reference, the query λ is left at 0 here — this probes
    scoring shape, not λ correctness — so the query is scored directly."""
    from ..core import ArrowItem
    from ..ops.search import lambda_aware_scores
    import jax.numpy as jnp
    import jax

    if not len(queries):
        return 0.5
    total = 0.0
    valid = 0
    dt = aspace.data.dtype
    for query in queries:
        q = np.asarray(query, dtype=np.float64)
        if q.shape[0] != aspace.nfeatures:
            continue
        scores = lambda_aware_scores(
            jnp.asarray(q, dtype=dt)[None, :],
            jnp.zeros((1,), dtype=dt),
            aspace.data, aspace.lambdas, jnp.asarray(alpha, dtype=dt))[0]
        top, _ = jax.lax.top_k(scores, min(k, aspace.nitems))
        sims = np.asarray(top, dtype=np.float64)
        if sims.size == 0:
            continue
        quality = 0.0
        avg = float(sims.mean())
        if 0.1 < avg <= 1.0:
            quality += 0.5
        if sims.size > 1 and float(((sims - avg) ** 2).mean()) > 1e-6:
            quality += 0.3
        if (1.0 - alpha) > 0.0:
            quality += 0.2
        total += quality
        valid += 1
    return total / valid if valid else 0.5


def evaluate_graph_quality(aspace, gl) -> float:
    """0.4·connectivity + 0.3·λ-quality + 0.3·edge-efficiency
    (lib.rs:396-403)."""
    return (0.4 * graph_connectivity_ratio(gl.matrix)
            + 0.3 * lambda_distribution_quality(np.asarray(aspace.lambdas))
            + 0.3 * edge_count_efficiency(gl.matrix))


def evaluate_parameter_quality(aspace, gl, queries, alpha: float,
                               beta: float, k: int) -> float:
    """0.4·connectivity + 0.4·λ-quality + 0.2·search quality
    (lib.rs:405-427)."""
    return (0.4 * graph_connectivity_ratio(gl.matrix)
            + 0.4 * lambda_distribution_quality(np.asarray(aspace.lambdas))
            + 0.2 * search_effectiveness_score(aspace, queries, alpha,
                                               beta, k))


def jaccard_similarity(a: Sequence[int], b: Sequence[int]) -> float:
    """|A∩B| / |A∪B| (lib.rs:543-...)."""
    sa, sb = set(a), set(b)
    union = sa | sb
    return len(sa & sb) / len(union) if union else 1.0
