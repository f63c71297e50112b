"""Hypergraph clique-expansion overlay + ensemble tests (capability from
reference docs: README.md:112-113, graph.rs:142; BASELINE.json config #4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.graph import GraphParams
from arrowspace_tpu.hypergraph import (clique_expansion_adjacency,
                                       ensemble_params, ensemble_search,
                                       overlay_laplacian)
from arrowspace_tpu import eigenmaps as em
from data import make_moons_hd


def test_clique_expansion_weights():
    adj = clique_expansion_adjacency([[0, 1, 2], [2, 3]], 5)
    # 3-edge: share 1/2 to each pair
    assert adj[0, 1] == pytest.approx(0.5)
    assert adj[1, 2] == pytest.approx(0.5)
    # 2-edge: full weight, accumulated on top of the 3-edge pair
    assert adj[2, 3] == pytest.approx(1.0)
    assert adj[0, 3] == 0.0
    np.testing.assert_allclose(adj, adj.T)
    assert np.all(np.diag(adj) == 0.0)
    # degenerate edges ignored
    adj2 = clique_expansion_adjacency([[1], []], 3)
    assert adj2.sum() == 0.0


def test_overlay_preserves_laplacian_properties():
    rows = make_moons_hd(60, noise=0.1, hd_noise=0.05, dims=10, seed=1)
    b = ArrowSpaceBuilder().with_seed(3)
    aspace, gl = b.build(rows.tolist())
    n = gl.shape()[0]
    hyper = clique_expansion_adjacency([[0, 1, 2], [3, 4]], n)
    gl2 = overlay_laplacian(gl, hyper, mix=0.5)
    val = gl2.verify_properties(1e-8)
    assert val.is_valid
    # Rayleigh still non-negative (sum of PSD matrices)
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = rng.normal(size=n)
        assert gl2.rayleigh_quotient(x) >= -1e-9


def test_ensemble_params_grid():
    base = GraphParams(eps=0.5, k=5, topk=3, p=2.0, sigma=None,
                       normalise=False, sparsity_check=False)
    grid = ensemble_params(base)
    assert len(grid) == 6
    ks = {p.k for p in grid}
    assert ks == {4, 5, 6}
    eps = {round(p.eps, 6) for p in grid}
    assert eps == {0.5, 0.75}


def test_ensemble_search_fuses_rankings():
    rows = make_moons_hd(80, noise=0.08, hd_noise=0.04, dims=12, seed=5)
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None) \
        .with_seed(11)
    b.define_result_k()
    clustered = em.start_clustering(b, rows.tolist())
    aspace = clustered.aspace
    gl = em.eigenmaps(aspace, b, clustered.centroids, clustered.n_items)
    em.compute_taumode(aspace, gl)

    base = gl.graph_params
    grid = ensemble_params(base, k_adjust=(0, 1), eps_expand=(1.0,))
    q = rows[20] * 1.02
    res = ensemble_search(aspace, clustered.centroids, q, grid, 10, 0.9)
    assert len(res) == 10
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    # the perturbed source item should rank at the top
    assert res[0][0] == 20


def test_prebuilt_ensemble_matches_oneshot():
    from arrowspace_tpu.hypergraph import (build_ensemble,
                                           ensemble_search_prebuilt)
    rows = make_moons_hd(60, noise=0.08, hd_noise=0.04, dims=10, seed=9)
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None) \
        .with_seed(15)
    b.define_result_k()
    clustered = em.start_clustering(b, rows.tolist())
    aspace = clustered.aspace
    gl = em.eigenmaps(aspace, b, clustered.centroids, clustered.n_items)
    em.compute_taumode(aspace, gl)

    grid = ensemble_params(gl.graph_params, k_adjust=(0, 1),
                           eps_expand=(1.0,))
    q = rows[12] * 1.01
    one = ensemble_search(aspace, clustered.centroids, q, grid, 8, 0.9)
    ens = build_ensemble(aspace, clustered.centroids, grid)
    pre = ensemble_search_prebuilt(aspace, ens, q, 8, 0.9)
    assert [i for i, _ in one] == [i for i, _ in pre]
    for (_, s1), (_, s2) in zip(one, pre):
        assert s1 == pytest.approx(s2, rel=1e-9)


def test_ensemble_topk_batch_matches_prebuilt():
    """The chunked batch fusion must reproduce ensemble_search_prebuilt
    per query: same ids, same fused mean scores (one corpus stream for
    the whole ensemble instead of V scans per query).  chunk < N
    exercises the running scan merge."""
    import jax.numpy as jnp

    from arrowspace_tpu.hypergraph import (build_ensemble,
                                           ensemble_search_prebuilt,
                                           ensemble_topk_batch)
    from arrowspace_tpu.taumode import (select_tau_batch,
                                        synthetic_lambda_batch)

    rows = make_moons_hd(90, noise=0.08, hd_noise=0.04, dims=10, seed=21)
    b = ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None) \
        .with_seed(17)
    b.define_result_k()
    clustered = em.start_clustering(b, rows.tolist())
    aspace = clustered.aspace
    gl = em.eigenmaps(aspace, b, clustered.centroids, clustered.n_items)
    em.compute_taumode(aspace, gl)

    grid = ensemble_params(gl.graph_params, k_adjust=(0, 1),
                           eps_expand=(1.0,))
    ens = build_ensemble(aspace, clustered.centroids, grid)
    queries = rows[[3, 17, 40, 66]] * 1.01
    dt = aspace.data.dtype
    qdev = jnp.asarray(queries, dtype=dt)
    from arrowspace_tpu.hypergraph import ensemble_query_lambdas
    qlams = ensemble_query_lambdas(qdev, ens, aspace.taumode)
    lam_v = jnp.stack([lam for _, lam in ens])
    bs, bi = ensemble_topk_batch(qdev, qlams, aspace.data, lam_v, 0.9,
                                 k=8, chunk=32)
    bs, bi = np.asarray(bs), np.asarray(bi)
    for qi, q in enumerate(queries):
        ref = ensemble_search_prebuilt(aspace, ens, q, 8, 0.9)
        assert list(bi[qi]) == [i for i, _ in ref]
        np.testing.assert_allclose(bs[qi], [s for _, s in ref],
                                   rtol=1e-9)


def test_normalized_clique_expansion():
    adj = clique_expansion_adjacency([[0, 1, 2], [2, 3]], 5,
                                     normalized=True)
    np.testing.assert_allclose(adj, adj.T)
    # a single uniform hyperedge has unit degrees -> normalization is
    # the identity there; with the second edge, node 2's heavier degree
    # must be damped relative to the plain expansion
    plain = clique_expansion_adjacency([[0, 1, 2], [2, 3]], 5)
    assert adj[2, 3] < plain[2, 3]
    single = clique_expansion_adjacency([[0, 1, 2]], 5, normalized=True)
    np.testing.assert_allclose(single.sum(axis=1)[:3], 1.0)
    assert plain[2, 3] == pytest.approx(1.0)


def test_ensemble_search_with_projection():
    """Dims-reduced spaces: the ensemble scores the raw F-dim query against
    the raw (N, F) items, using the projected vector only for tau/lambda
    (regression: the projected query was passed to the cosine scorer and
    crashed with a dot-shape mismatch)."""
    from data import make_gaussian_hd
    from arrowspace_tpu.hypergraph import (build_ensemble,
                                           ensemble_search_prebuilt)
    rows = make_gaussian_hd(90, spread=0.5, dims=96, seed=17)
    b = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None)
         .with_dims_reduction(True, 0.5).with_seed(19))
    b.define_result_k()
    clustered = em.start_clustering(b, rows.tolist())
    aspace = clustered.aspace
    assert aspace.projection_matrix is not None
    gl = em.eigenmaps(aspace, b, clustered.centroids, clustered.n_items)
    em.compute_taumode(aspace, gl)

    grid = ensemble_params(gl.graph_params, k_adjust=(0, 1),
                           eps_expand=(1.0,))
    ens = build_ensemble(aspace, clustered.centroids, grid)
    q = rows[4] * 1.02
    res = ensemble_search_prebuilt(aspace, ens, q, 8, 0.9)
    assert len(res) == 8
    assert res[0][0] == 4  # raw-space cosine still dominates
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
