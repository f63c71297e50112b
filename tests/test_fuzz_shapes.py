"""Randomised shape/parameter fuzzing: every kernel against its oracle
over edge shapes (tiny N/F, k=1, degenerate rows)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrowspace_tpu.graph import GraphParams
from arrowspace_tpu.laplacian import build_laplacian_matrix
from arrowspace_tpu.taumode import (TauMode, compute_taumode_lambdas,
                                    select_tau, select_tau_batch,
                                    synthetic_lambda_batch)
from helpers import (oracle_adjacency, oracle_laplacian,
                     oracle_synthetic_lambda)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_laplacian_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 40))
    f = int(rng.integers(2, 30))
    topk = int(rng.integers(1, 8))
    eps = float(rng.uniform(0.05, 1.0))
    p = float(rng.choice([1.0, 2.0, 3.0]))
    sigma = None if rng.random() < 0.5 else float(rng.uniform(0.1, 2.0))
    rows = rng.normal(size=(n, f))
    if rng.random() < 0.2:
        rows[0] = 0.0  # zero vector edge case

    params = GraphParams(eps=eps, k=6, topk=topk, p=p, sigma=sigma,
                         normalise=False, sparsity_check=False)
    gl = build_laplacian_matrix(jnp.asarray(rows), params)
    adj = oracle_adjacency(rows, eps=eps, topk=topk, p=p, sigma=sigma)
    deg = adj.sum(axis=1)
    if deg[deg > 0].size and (deg > 0).mean() and \
            (adj > 0).sum(axis=1).mean() > 10.0:
        pytest.skip("sparsification regime — oracle doesn't model it")
    np.testing.assert_allclose(np.asarray(gl.matrix),
                               oracle_laplacian(adj), atol=1e-9)
    val = gl.verify_properties(1e-8)
    assert val.is_symmetric


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_lambda_vs_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    n_nodes = int(rng.integers(2, 25))
    f = int(rng.integers(n_nodes, n_nodes + 20))  # F >= nodes
    n_items = int(rng.integers(2, 50))
    graph_rows = rng.normal(size=(n_nodes, max(2, n_nodes // 2 + 1)))
    lap = oracle_laplacian(oracle_adjacency(graph_rows, eps=1.0, topk=3,
                                            p=2.0, sigma=None))
    items = rng.normal(size=(n_items, f))
    if rng.random() < 0.3:
        items[1] = 0.0

    mode = [TauMode.median(), TauMode.mean(), TauMode.fixed(0.4),
            TauMode.percentile(float(rng.uniform(0, 1)))][seed % 4]
    taus_batch = np.asarray(select_tau_batch(jnp.asarray(items), mode))
    lam = np.asarray(synthetic_lambda_batch(
        jnp.asarray(items), jnp.asarray(lap), jnp.asarray(taus_batch)))
    for i in range(n_items):
        tau_i = select_tau(items[i], mode)
        assert taus_batch[i] == pytest.approx(tau_i, rel=1e-12)
        assert lam[i] == pytest.approx(
            oracle_synthetic_lambda(items[i], lap, tau_i),
            rel=1e-8, abs=1e-12), (i, mode)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_search_topk_vs_numpy(seed):
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(2, 200))
    f = int(rng.integers(1, 40))
    b = int(rng.integers(1, 6))
    k = int(rng.integers(1, min(n, 12) + 1))
    alpha = float(rng.uniform(0, 1))
    items = rng.normal(size=(n, f))
    lams = rng.uniform(0, 2, n)
    q = rng.normal(size=(b, f))
    qlam = rng.uniform(0, 2, b)

    s, i = batched_lambda_aware_topk(
        jnp.asarray(q), jnp.asarray(qlam), jnp.asarray(items),
        jnp.asarray(lams), jnp.asarray(alpha), k=k)
    # numpy reference
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    xn = np.linalg.norm(items, axis=1, keepdims=True)
    qh = np.divide(q, np.where(qn > 0, qn, 1.0))
    xh = np.divide(items, np.where(xn > 0, xn, 1.0))
    cos = qh @ xh.T
    lam_sim = 1.0 - np.minimum(np.abs(qlam[:, None] - lams[None, :]), 1.0)
    ref = alpha * cos + (1 - alpha) * lam_sim
    for bb in range(b):
        order = np.argsort(-ref[bb], kind="stable")[:k]
        np.testing.assert_allclose(np.asarray(s[bb]), ref[bb][order],
                                   rtol=1e-9)


def test_tiny_extremes():
    """Smallest legal shapes end to end."""
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    rows = [[0.3, 0.7], [0.6, 0.4], [0.2, 0.9]]  # N=3, F=2
    aspace, gl = (ArrowSpaceBuilder()
                  .with_lambda_graph(1.0, 2, 1, 2.0, None)
                  .with_inline_sampling(None)
                  .with_seed(1).build(rows))
    assert gl.shape() == (2, 2)
    from arrowspace_tpu.core import ArrowItem
    qlam = aspace.prepare_query_item([0.5, 0.5], gl)
    res = aspace.search_lambda_aware(ArrowItem([0.5, 0.5], qlam or 1e-9), 3,
                                     0.5) if qlam != 0.0 else []
    assert isinstance(res, list)
