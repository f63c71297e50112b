"""Builder/GraphFactory behavioural scenarios.

Mirrors the scenario breadth of the reference's graph-factory suite
(reference: src/tests/test_graph_factory.rs:34-445) not already covered by
tests/test_laplacian.py: minimum datasets, scale invariance under
normalisation, dimensional sweeps, parameter preservation, λ
non-negativity, high-noise robustness, and normalisation effects.

Note: the reference's unseeded builds are nondeterministic; here every
build is seeded so the assertions are exact, which is strictly stronger.
"""

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from data import make_gaussian_blob, make_moons_hd


def test_builder_minimum_items():
    """(test_graph_factory.rs:100-124)"""
    items = make_moons_hd(20, 0.1, 0.6, 5, 42)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_lambda_graph(0.5, 3, 2, 2.0, None)
                  .with_seed(1).build(items.tolist()))
    assert aspace.n_clusters >= 1
    assert gl.nnodes == 20


def test_builder_scale_invariance_with_normalization():
    """Uniform rescaling with normalise=True keeps the clustering scale
    similar and graph node counts identical
    (test_graph_factory.rs:127-168)."""
    items = make_moons_hd(60, 0.15, 0.4, 8, 0)
    a1, gl1 = (ArrowSpaceBuilder()
               .with_lambda_graph(0.3, 4, 2, 2.0, None)
               .with_normalisation(True).with_seed(5)
               .build(items.tolist()))
    a2, gl2 = (ArrowSpaceBuilder()
               .with_lambda_graph(0.3, 4, 2, 2.0, None)
               .with_normalisation(True).with_seed(5)
               .build((items * 5.7).tolist()))
    assert abs(a1.n_clusters - a2.n_clusters) <= 3
    assert gl1.nnodes == gl2.nnodes


def test_builder_parameter_preservation():
    """All five graph params survive, with define_result_k reshaping topk
    (k=7 < 10 -> topk 4) (test_graph_factory.rs:245-275)."""
    items = make_moons_hd(50, 0.2, 0.4, 7, 321)
    _, gl = (ArrowSpaceBuilder()
             .with_lambda_graph(0.123, 7, 3, 3.5, 0.456)
             .with_normalisation(False)
             .with_seed(2).build(items.tolist()))
    assert gl.graph_params.eps == 0.123
    assert gl.graph_params.k == 7
    assert gl.graph_params.topk == 3 + 1
    assert gl.graph_params.p == 3.5
    assert gl.graph_params.sigma == 0.456
    assert gl.graph_params.normalise is False


def test_builder_with_different_dimensions():
    """(test_graph_factory.rs:275-313)"""
    for n_samples, dims, desc in ((50, 3, "low"), (60, 10, "medium"),
                                  (70, 25, "high")):
        items = make_moons_hd(n_samples, 0.15, 0.4, dims, 42 + dims)
        aspace, gl = (ArrowSpaceBuilder()
                      .with_lambda_graph(0.3, 5, 2, 2.0, None)
                      .with_normalisation(True)
                      .with_spectral(True)
                      .with_sparsity_check(False)
                      .with_seed(3).build(items.tolist()))
        assert aspace.n_clusters > 0, desc
        assert aspace.nfeatures == dims, desc
        assert gl.nnodes == n_samples, desc


def test_builder_lambda_values_are_nonnegative():
    """(test_graph_factory.rs:355-385)"""
    items = make_moons_hd(100, 0.2, 0.35, 11, 999)
    aspace, _ = (ArrowSpaceBuilder()
                 .with_lambda_graph(0.3, 5, 2, 2.0, None)
                 .with_normalisation(True)
                 .with_spectral(True)
                 .with_seed(4).build(items.tolist()))
    lam = np.asarray(aspace.lambdas)
    assert np.all(lam >= 0.0)
    assert np.all(np.isfinite(lam))


def test_builder_with_high_noise():
    """High-overlap blobs still cluster (conservative K is correct)
    (test_graph_factory.rs:388-410)."""
    items = make_gaussian_blob(300, dims=8, spread=0.9, seed=6)
    aspace, _ = (ArrowSpaceBuilder()
                 .with_lambda_graph(0.4, 6, 3, 2.0, None)
                 .with_normalisation(True)
                 .with_seed(6).build(items.tolist()))
    assert aspace.n_clusters >= 2


def test_builder_normalization_effects():
    """(test_graph_factory.rs:413-445)"""
    items = make_moons_hd(75, 0.14, 0.45, 8, 654)
    a_norm, gl_norm = (ArrowSpaceBuilder()
                       .with_lambda_graph(0.3, 5, 2, 2.0, None)
                       .with_normalisation(True)
                       .with_seed(7).build(items.tolist()))
    a_raw, gl_raw = (ArrowSpaceBuilder()
                     .with_lambda_graph(0.3, 5, 2, 2.0, None)
                     .with_normalisation(False)
                     .with_seed(7).build(items.tolist()))
    assert gl_norm.graph_params.normalise is True
    assert gl_raw.graph_params.normalise is False
    assert a_norm.n_clusters > 0 and a_raw.n_clusters > 0
