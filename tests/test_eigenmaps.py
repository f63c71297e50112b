"""Staged EigenMaps pipeline ≡ monolithic build, mirroring
tests/test_eigenmaps.rs:34-409."""

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu import eigenmaps as em
from data import make_moons_hd


def _make_builder():
    return (ArrowSpaceBuilder()
            .with_lambda_graph(1.0, 5, 3, 2.0, None)
            .with_seed(77))


def test_staged_equals_monolithic():
    rows = make_moons_hd(90, noise=0.08, hd_noise=0.05, dims=14, seed=6)

    # monolithic
    b1 = _make_builder()
    aspace_mono, gl_mono = b1.build(rows.tolist())

    # staged
    b2 = _make_builder()
    b2.define_result_k()
    clustered = em.start_clustering(b2, rows.tolist())
    aspace = clustered.aspace
    gl = em.eigenmaps(aspace, b2, clustered.centroids, clustered.n_items)
    em.compute_taumode(aspace, gl)

    # λ element-wise equality
    np.testing.assert_allclose(np.asarray(aspace.lambdas),
                               np.asarray(aspace_mono.lambdas),
                               rtol=1e-12, atol=0)
    # clustering metadata equality
    assert aspace.n_clusters == aspace_mono.n_clusters
    np.testing.assert_array_equal(aspace.cluster_assignments,
                                  aspace_mono.cluster_assignments)
    assert aspace.cluster_radius == aspace_mono.cluster_radius
    # Laplacian nnz / sparsity equality
    assert gl.nnz() == gl_mono.nnz()
    np.testing.assert_allclose(np.asarray(gl.matrix),
                               np.asarray(gl_mono.matrix), atol=0)


def test_staged_search_equals_monolithic_search():
    rows = make_moons_hd(70, noise=0.1, hd_noise=0.05, dims=10, seed=7)
    query = rows[5] * 1.02

    b1 = _make_builder()
    aspace_mono, gl_mono = b1.build(rows.tolist())
    lam = aspace_mono.prepare_query_item(query, gl_mono)
    from arrowspace_tpu.core import ArrowItem
    res_mono = aspace_mono.search_lambda_aware(ArrowItem(query, lam), 5, 0.7)

    b2 = _make_builder()
    b2.define_result_k()
    clustered = em.start_clustering(b2, rows.tolist())
    aspace = clustered.aspace
    gl = em.eigenmaps(aspace, b2, clustered.centroids, clustered.n_items)
    em.compute_taumode(aspace, gl)
    res_staged = em.search(aspace, query, gl, 5, 0.7)

    assert [i for i, _ in res_mono] == [i for i, _ in res_staged]
    for (_, s1), (_, s2) in zip(res_mono, res_staged):
        assert s1 == pytest.approx(s2, rel=1e-12)


def test_clustered_output_fields():
    rows = make_moons_hd(50, noise=0.1, hd_noise=0.05, dims=8, seed=8)
    b = _make_builder()
    out = em.start_clustering(b, rows.tolist())
    assert out.n_items == 50
    assert out.n_features == 8
    assert out.reduced_dim == 8  # no projection for small F
    assert out.centroids.shape[1] == 8
    assert out.aspace.n_clusters == out.centroids.shape[0]


def test_compute_taumode_uses_signals_when_present():
    """taumode.rs:195-200: signals take precedence over gl.matrix."""
    rows = make_moons_hd(60, noise=0.1, hd_noise=0.05, dims=12, seed=9)
    b = _make_builder().with_spectral(True)
    aspace, gl = b.build(rows.tolist())

    b2 = _make_builder()  # no spectral
    aspace2, gl2 = b2.build(rows.tolist())

    # same graph but different lambda source -> different lambdas
    assert aspace.signals is not None and aspace.signals.shape[0] > 0
    assert not np.allclose(np.asarray(aspace.lambdas),
                           np.asarray(aspace2.lambdas))


def test_staged_equals_monolithic_with_spectral():
    """Staged == monolithic when the spectral (Laplacian-of-Laplacian)
    overlay is enabled (reference: test_eigenmaps.rs:188-266)."""
    rows = make_moons_hd(70, noise=0.1, hd_noise=0.05, dims=10, seed=6)

    b1 = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None)
          .with_spectral(True).with_seed(31))
    aspace_m, gl_m = b1.build(rows.tolist())

    b2 = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None)
          .with_spectral(True).with_seed(31))
    b2.define_result_k()
    clustered = em.start_clustering(b2, rows.tolist())
    aspace_s = clustered.aspace
    gl_s = em.eigenmaps(aspace_s, b2, clustered.centroids,
                        clustered.n_items)
    em.compute_taumode(aspace_s, gl_s)

    assert aspace_m.signals is not None and aspace_s.signals is not None
    np.testing.assert_allclose(np.asarray(aspace_s.signals),
                               np.asarray(aspace_m.signals), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(aspace_s.lambdas),
                               np.asarray(aspace_m.lambdas), rtol=1e-12)


def test_staged_equals_monolithic_different_taumode():
    """Staged == monolithic under each tau policy
    (reference: test_eigenmaps.rs:268-357)."""
    from arrowspace_tpu.taumode import TauMode
    rows = make_moons_hd(60, noise=0.1, hd_noise=0.05, dims=10, seed=7)
    for mode in (TauMode.mean(), TauMode.percentile(0.75),
                 TauMode.fixed(0.3)):
        b1 = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None)
              .with_synthesis(mode).with_seed(33))
        aspace_m, _ = b1.build(rows.tolist())

        b2 = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None)
              .with_synthesis(mode).with_seed(33))
        b2.define_result_k()
        clustered = em.start_clustering(b2, rows.tolist())
        aspace_s = clustered.aspace
        gl_s = em.eigenmaps(aspace_s, b2, clustered.centroids,
                            clustered.n_items)
        em.compute_taumode(aspace_s, gl_s)
        np.testing.assert_allclose(np.asarray(aspace_s.lambdas),
                                   np.asarray(aspace_m.lambdas),
                                   rtol=1e-12, err_msg=str(mode))


def test_eigenmaps_stages_produce_valid_state():
    """Each stage leaves well-formed state
    (reference: test_eigenmaps.rs:359-409)."""
    rows = make_moons_hd(50, noise=0.1, hd_noise=0.05, dims=8, seed=8)
    b = (ArrowSpaceBuilder().with_lambda_graph(1.0, 4, 2, 2.0, None)
         .with_seed(35))
    b.define_result_k()

    clustered = em.start_clustering(b, rows.tolist())
    assert clustered.aspace.nitems == 50
    assert clustered.aspace.n_clusters >= 1
    assert clustered.centroids.shape[1] == clustered.reduced_dim == 8
    assert np.all(np.asarray(clustered.aspace.lambdas) == 0.0)  # pre-λτ

    gl = em.eigenmaps(clustered.aspace, b, clustered.centroids,
                      clustered.n_items)
    assert gl.nnodes == 50
    assert gl.shape() == (8, 8)  # F'xF' feature graph
    assert gl.is_symmetric(1e-9)

    em.compute_taumode(clustered.aspace, gl)
    lam = np.asarray(clustered.aspace.lambdas)
    assert np.all(np.isfinite(lam)) and np.all(lam >= 0.0)
    assert lam.max() > 0.0
