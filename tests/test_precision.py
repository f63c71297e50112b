"""Precision budget: f32 device λτ must stay within the 1e-5 relative
error budget of BASELINE.json against the f64 oracle, for unit-scale
embedding-like data."""

import numpy as np
import jax.numpy as jnp

from arrowspace_tpu.taumode import TauMode, compute_taumode_lambdas
from helpers import oracle_adjacency, oracle_laplacian


def test_f32_lambda_within_budget():
    rng = np.random.default_rng(0)
    n_items, f = 5000, 96
    # unit-scale clustered embeddings (the regime the budget targets)
    centers = rng.uniform(0.2, 0.8, (8, f))
    rows = centers[rng.integers(0, 8, n_items)] \
        + rng.normal(0, 0.05, (n_items, f))

    graph_rows = rows[:64]
    adj = oracle_adjacency(graph_rows[:, :32], eps=1.0, topk=5, p=2.0,
                           sigma=None)
    lap = oracle_laplacian(adj)  # 64-node graph

    lam64 = np.asarray(compute_taumode_lambdas(
        jnp.asarray(rows, jnp.float64), jnp.asarray(lap, jnp.float64),
        TauMode.median()))
    lam32 = np.asarray(compute_taumode_lambdas(
        jnp.asarray(rows, jnp.float32), jnp.asarray(lap, jnp.float32),
        TauMode.median()))

    rel = np.abs(lam32.astype(np.float64) - lam64) / (np.abs(lam64) + 1e-12)
    assert np.median(rel) < 1e-6
    assert np.quantile(rel, 0.999) < 1e-5, float(np.quantile(rel, 0.999))
    assert rel.max() < 1e-4, float(rel.max())


def test_f32_search_ranking_stable():
    """Top-10 result sets must agree between f32 and f64 scoring away
    from exact ties."""
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk
    rng = np.random.default_rng(1)
    n, f, b = 20000, 64, 16
    items = rng.uniform(0.1, 1.0, (n, f))
    lams = rng.uniform(0, 1, n)
    q = items[:b] * 1.01
    qlam = lams[:b]

    _, i64 = batched_lambda_aware_topk(
        jnp.asarray(q, jnp.float64), jnp.asarray(qlam, jnp.float64),
        jnp.asarray(items, jnp.float64), jnp.asarray(lams, jnp.float64),
        jnp.float64(0.9), k=10)
    _, i32 = batched_lambda_aware_topk(
        jnp.asarray(q, jnp.float32), jnp.asarray(qlam, jnp.float32),
        jnp.asarray(items, jnp.float32), jnp.asarray(lams, jnp.float32),
        jnp.float32(0.9), k=10)

    overlap = np.mean([
        len(set(np.asarray(i64)[r]) & set(np.asarray(i32)[r])) / 10.0
        for r in range(b)])
    assert overlap >= 0.95, overlap
