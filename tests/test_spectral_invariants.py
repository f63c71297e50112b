"""Deeper spectral property tests (the reference README's claimed test
scope: Rayleigh properties, superposition bounds, k-capping semantics,
diffusion simulations — README.md:116)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrowspace_tpu.graph import GraphParams
from arrowspace_tpu.laplacian import build_laplacian_matrix
from data import make_gaussian_blob


def _lap(n=20, dims=10, seed=3, topk=4):
    rows = make_gaussian_blob(n, dims=dims, spread=0.5, seed=seed)
    params = GraphParams(eps=1.0, k=6, topk=topk, p=2.0, sigma=None,
                         normalise=False, sparsity_check=False)
    return build_laplacian_matrix(jnp.asarray(rows), params)


def test_rayleigh_bounded_by_eigenvalues():
    gl = _lap()
    m = np.asarray(gl.matrix)
    eig = np.linalg.eigvalsh(m)
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.normal(size=m.shape[0])
        r = gl.rayleigh_quotient(x)
        assert eig[0] - 1e-9 <= r <= eig[-1] + 1e-9


def test_laplacian_positive_semidefinite():
    gl = _lap(seed=5)
    eig = np.linalg.eigvalsh(np.asarray(gl.matrix))
    assert eig[0] >= -1e-9          # PSD
    assert abs(eig[0]) < 1e-9       # constant vector in the kernel


def test_rayleigh_superposition_bound():
    """Dirichlet energy is a quadratic form: for the numerator,
    (x+y)ᵀL(x+y) <= 2(xᵀLx + yᵀLy) (parallelogram/ Cauchy-Schwarz)."""
    gl = _lap(seed=7)
    m = np.asarray(gl.matrix)
    rng = np.random.default_rng(1)
    for _ in range(10):
        x = rng.normal(size=m.shape[0])
        y = rng.normal(size=m.shape[0])
        lhs = (x + y) @ m @ (x + y)
        rhs = 2.0 * (x @ m @ x + y @ m @ y)
        assert lhs <= rhs + 1e-9


def test_k_capping_semantics():
    """Each row proposes at most topk edges (self excluded); after union
    symmetrisation the degree can exceed topk, but the total edge count is
    bounded by n·topk (laplacian.rs:211-288 semantics)."""
    topk = 3
    gl = _lap(n=30, seed=9, topk=topk)
    adj = gl.extract_adjacency()
    n = adj.shape[0]
    n_edges = int((adj > 0).sum()) // 2
    assert n_edges <= n * topk
    # every edge weight obeys the kernel bound w <= 1
    assert adj.max() <= 1.0 + 1e-12


def test_diffusion_contracts_dirichlet_energy():
    """Heat diffusion x <- x - ηLx must monotonically decrease the
    Dirichlet energy for small η (energymaps diffusion semantics)."""
    from arrowspace_tpu.energymaps import _diffuse
    gl = _lap(n=16, dims=8, seed=11)
    m = gl.matrix
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 8)))
    energies = []
    work = x
    for _ in range(5):
        e = float(jnp.sum(jnp.diagonal(
            work.T @ (m.astype(work.dtype) @ work))))
        energies.append(e)
        work = _diffuse(work, m.astype(work.dtype),
                        jnp.asarray(0.05, work.dtype), steps=1)
    assert all(energies[i + 1] <= energies[i] + 1e-9
               for i in range(len(energies) - 1))


def test_random_walk_converges_to_uniform():
    """Row-stochastic random walk P = I - D⁻¹L mixes toward the uniform
    distribution on a connected component."""
    gl = _lap(n=12, dims=6, seed=13)
    m = np.asarray(gl.matrix)
    deg = np.diagonal(m).copy()
    deg[deg == 0] = 1.0
    p = np.eye(m.shape[0]) - m / deg[:, None]
    # start from a point mass on node 0 and iterate
    v = np.zeros(m.shape[0])
    v[0] = 1.0
    for _ in range(500):
        v = v @ p
    # mass stays normalised and spreads out
    assert v.sum() == pytest.approx(1.0, rel=1e-6)
    assert v.max() < 0.9


def test_quality_metrics():
    """Quality metrics port (examples/common/lib.rs:190-447)."""
    from arrowspace_tpu.utils.quality import (
        edge_count_efficiency, evaluate_graph_quality,
        evaluate_parameter_quality, graph_connectivity_ratio,
        jaccard_similarity, lambda_distribution_quality)
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from data import make_moons_hd

    rows = make_moons_hd(60, noise=0.08, hd_noise=0.04, dims=10, seed=17)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_lambda_graph(1.0, 5, 3, 2.0, None)
                  .with_seed(19).build(rows.tolist()))

    conn = graph_connectivity_ratio(gl.matrix)
    assert 0.0 <= conn <= 1.0
    lamq = lambda_distribution_quality(np.asarray(aspace.lambdas))
    assert 0.0 <= lamq <= 1.0
    eff = edge_count_efficiency(gl.matrix)
    assert 0.0 <= eff <= 1.0
    gq = evaluate_graph_quality(aspace, gl)
    assert 0.0 <= gq <= 1.0
    pq = evaluate_parameter_quality(aspace, gl, rows[:5].tolist(),
                                    0.9, 0.1, 5)
    assert 0.0 <= pq <= 1.0
    # degenerate shapes
    assert graph_connectivity_ratio(np.zeros((1, 1))) == 1.0
    assert lambda_distribution_quality([]) == 0.0
    assert jaccard_similarity([1, 2, 3], [2, 3, 4]) == 0.5
    assert jaccard_similarity([], []) == 1.0
