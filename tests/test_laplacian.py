"""Laplacian build + property tests, mirroring tests/test_laplacian.rs and
tests/test_graph_factory.rs."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrowspace_tpu.graph import GraphFactory, GraphLaplacian, GraphParams
from arrowspace_tpu.laplacian import build_laplacian_matrix
from helpers import oracle_adjacency, oracle_laplacian
from data import make_gaussian_blob


def _params(eps=0.7, k=3, topk=3, p=2.0, sigma=None, normalise=False,
            sparsity_check=False):
    return GraphParams(eps=eps, k=k, topk=topk, p=p, sigma=sigma,
                       normalise=normalise, sparsity_check=sparsity_check)


def test_doctest_shape_quirk():
    """4 items x 3 features -> 3x3 matrix, nnodes == 4
    (laplacian.rs:110-114)."""
    items = np.array([[1.0, 0.0, 0.0],
                      [0.8, 0.6, 0.0],
                      [0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0]])
    gl = build_laplacian_matrix(jnp.asarray(items).T,
                                _params(eps=0.5, sigma=0.1, normalise=True))
    assert gl.nnodes == 4
    assert gl.shape() == (3, 3)


def test_matches_bruteforce_oracle():
    rows = make_gaussian_blob(24, dims=10, spread=0.4, seed=5)
    params = _params(eps=0.8, topk=4)
    gl = build_laplacian_matrix(jnp.asarray(rows), params, n_items=99)
    adj = oracle_adjacency(rows, eps=0.8, topk=4, p=2.0, sigma=None)
    lap = oracle_laplacian(adj)
    np.testing.assert_allclose(np.asarray(gl.matrix), lap, atol=1e-9)
    assert gl.nnodes == 99


def test_laplacian_properties():
    """Symmetry, row sums ~ 0, non-negative diagonal
    (test_laplacian.rs:51-153)."""
    rows = make_gaussian_blob(30, dims=12, spread=0.5, seed=6)
    gl = build_laplacian_matrix(jnp.asarray(rows), _params(eps=1.0, topk=5))
    val = gl.verify_properties(1e-8)
    assert val.is_valid
    assert val.is_symmetric
    assert val.max_row_sum_error < 1e-8


def test_offdiagonals_nonpositive_and_degrees_match():
    rows = make_gaussian_blob(20, dims=8, seed=8)
    gl = build_laplacian_matrix(jnp.asarray(rows), _params(eps=1.0))
    m = np.asarray(gl.matrix)
    off = m - np.diag(np.diag(m))
    assert np.all(off <= 1e-12)
    np.testing.assert_allclose(np.diag(m), -off.sum(axis=1), atol=1e-9)


def test_sigma_default_is_one():
    """σ defaults to 1.0 when None (laplacian.rs:253-254), not eps."""
    rows = make_gaussian_blob(16, dims=6, seed=9)
    gl_none = build_laplacian_matrix(jnp.asarray(rows), _params(sigma=None))
    gl_one = build_laplacian_matrix(jnp.asarray(rows), _params(sigma=1.0))
    np.testing.assert_allclose(np.asarray(gl_none.matrix),
                               np.asarray(gl_one.matrix), atol=0)
    gl_eps = build_laplacian_matrix(jnp.asarray(rows),
                                    _params(sigma=0.7))
    assert not np.allclose(np.asarray(gl_none.matrix),
                           np.asarray(gl_eps.matrix))


def test_eps_filter_disconnects():
    """Orthogonal vectors (distance 1) are excluded at eps < 1."""
    rows = np.eye(4)
    gl = build_laplacian_matrix(jnp.asarray(rows), _params(eps=0.5))
    np.testing.assert_allclose(np.asarray(gl.matrix), np.zeros((4, 4)))


def test_rayleigh_quotient_and_spmv():
    rows = make_gaussian_blob(15, dims=7, seed=10)
    gl = build_laplacian_matrix(jnp.asarray(rows), _params(eps=1.0))
    x = np.ones(15)
    # constant vector: Lx ~ 0 for a proper Laplacian
    lx = gl.multiply_vector(x)
    np.testing.assert_allclose(lx, 0.0, atol=1e-9)
    assert gl.rayleigh_quotient(x) == pytest.approx(0.0, abs=1e-9)
    rng = np.random.default_rng(0)
    y = rng.normal(size=15)
    assert gl.rayleigh_quotient(y) >= -1e-9


def test_normalise_is_standard_scaling():
    """'normalise' z-scores columns (laplacian.rs:146-155)."""
    rows = make_gaussian_blob(12, dims=5, seed=11) * 10.0 + 3.0
    gl_raw = build_laplacian_matrix(jnp.asarray(rows), _params())
    gl_norm = build_laplacian_matrix(jnp.asarray(rows),
                                     _params(normalise=True))
    scaled = np.asarray(gl_norm.init_data)
    np.testing.assert_allclose(scaled.mean(axis=0), 0.0, atol=1e-9)
    assert not np.allclose(np.asarray(gl_raw.matrix),
                           np.asarray(gl_norm.matrix))


def test_graph_factory_from_k_cluster():
    """F'xF' feature graph with nnodes = N (graph.rs:149-204)."""
    centroids = make_gaussian_blob(9, dims=6, seed=12)
    gl = GraphFactory.build_laplacian_matrix_from_k_cluster(
        centroids, eps=1.0, k=5, topk=3, p=2.0, sigma_override=None,
        normalise=False, sparsity_check=False, n_items=100)
    assert gl.shape() == (6, 6)
    assert gl.nnodes == 100


def test_sparsity_check_raises():
    # Orthogonal features -> empty graph; only the 32 diagonal entries are
    # stored, so sparsity = 1 - 32/1024 ≈ 0.969 > 0.95 (graph.rs:185-193).
    centroids = np.eye(32)
    with pytest.raises(ValueError, match="too sparse"):
        GraphFactory.build_laplacian_matrix_from_k_cluster(
            centroids, eps=0.1, k=3, topk=3, p=2.0, sigma_override=None,
            normalise=False, sparsity_check=True, n_items=32)


def test_spectral_laplacian_shape():
    from arrowspace_tpu.core import ArrowSpace
    rows = make_gaussian_blob(20, dims=8, seed=13)
    aspace = ArrowSpace.new(rows)
    gl = GraphFactory.build_laplacian_matrix_from_k_cluster(
        rows[:10], eps=1.0, k=5, topk=4, p=2.0, sigma_override=None,
        normalise=False, sparsity_check=False, n_items=20)
    GraphFactory.build_spectral_laplacian(aspace, gl)
    assert aspace.signals.shape == (8, 8)


def test_extract_adjacency_and_statistics():
    rows = make_gaussian_blob(18, dims=9, seed=14)
    gl = build_laplacian_matrix(jnp.asarray(rows), _params(eps=1.0))
    adj = gl.extract_adjacency()
    assert np.all(adj >= 0.0)
    np.testing.assert_allclose(adj, adj.T, atol=1e-12)
    stats = gl.statistics()
    assert stats.nnz == gl.nnz()
    assert 0.0 <= stats.sparsity <= 1.0


def test_prepare_from_items():
    rows = make_gaussian_blob(10, dims=4, seed=15)
    gl = GraphLaplacian.prepare_from_items(rows, _params(eps=1.0))
    assert gl.shape() == (4, 4)
    assert gl.nnodes == 10


def test_graph_params_approx_eq():
    a = _params(eps=0.5)
    b = _params(eps=0.5 + 1e-12)
    c = _params(eps=0.6)
    assert a == b
    assert a != c


def test_accessors_over_nnodes_quirk():
    """When nnodes (N) exceeds the F'xF' matrix, get/degrees/get_row read
    as 0.0 beyond the stored matrix (graph.rs:311-345 unwrap_or(0.0))."""
    centroids = make_gaussian_blob(8, dims=5, seed=21)
    gl = GraphFactory.build_laplacian_matrix_from_k_cluster(
        centroids, eps=1.0, k=4, topk=3, p=2.0, sigma_override=None,
        normalise=False, sparsity_check=False, n_items=20)
    assert gl.shape() == (5, 5)
    deg = gl.degrees()
    assert deg.shape == (20,)
    np.testing.assert_array_equal(deg[5:], 0.0)
    assert gl.get(10, 10) == 0.0
    row = gl.get_row(2)
    assert row.shape == (20,)
    np.testing.assert_array_equal(row[5:], 0.0)
    with pytest.raises(AssertionError):
        gl.get(25, 0)


def test_numpy_micropath_equals_jit_path():
    """The tiny-graph NumPy micro-path must agree exactly with the jitted
    stages (force the jit path via a >256-row build on the same data by
    padding, or compare both against the oracle)."""
    from arrowspace_tpu.laplacian import (_build_dense_numpy,
                                          _build_dense_stages)
    import jax.numpy as jnp
    rows = make_gaussian_blob(60, dims=12, spread=0.5, seed=33)
    params = _params(eps=1.0, topk=4)
    adj_np, lap_np, nnz_np = _build_dense_numpy(rows, params, 5, 1.0)
    adj_j, lap_j, nnz_j = _build_dense_stages(jnp.asarray(rows), params,
                                              5, 1.0)
    np.testing.assert_allclose(adj_np, np.asarray(adj_j), atol=1e-12)
    np.testing.assert_allclose(lap_np, np.asarray(lap_j), atol=1e-12)
    assert nnz_np == int(nnz_j)
