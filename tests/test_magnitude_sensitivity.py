"""Magnitude sensitivity: normalised vs unnormalised behaviour.

Mirrors the reference's unnormalised-Laplacian suite
(reference: src/tests/test_laplacian_unnormalised.rs:37-377): parameter
preservation through the builder, deterministic clustering, cosine scale
invariance vs hybrid (magnitude-penalised) scale sensitivity, and
normalised-vs-unnormalised build comparisons.
"""

import math

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.core import ArrowItem
from data import make_moons_hd


def _cosine(a, b) -> float:
    return ArrowItem(a, 1.0).cosine_similarity(b)


def _magnitude_penalty(a, b) -> float:
    """exp(-|ln(|a|/|b|)|) — the reference's magnitude component
    (test_laplacian_unnormalised.rs:92-103)."""
    n1 = float(np.linalg.norm(a))
    n2 = float(np.linalg.norm(b))
    if n1 > 1e-12 and n2 > 1e-12:
        return math.exp(-abs(math.log(n1 / n2)))
    return 0.0


def _hybrid(a, b, alpha, beta) -> float:
    n1 = float(np.linalg.norm(a))
    n2 = float(np.linalg.norm(b))
    cos = _cosine(a, b)
    if n1 > 1e-12 and n2 > 1e-12:
        return alpha * cos + beta * _magnitude_penalty(a, b)
    return cos


def test_builder_graph_params_preservation():
    """Graph parameters survive the builder; topk is reshaped by
    define_result_k (k=6 < 10 -> topk 4)
    (test_laplacian_unnormalised.rs:37-58)."""
    items = make_moons_hd(50, 0.18, 0.4, 7, 456)
    _, gl = (ArrowSpaceBuilder()
             .with_lambda_graph(0.25, 6, 3, 2.5, 0.15)
             .with_normalisation(False)
             .build(items.tolist()))
    assert gl.graph_params.eps == 0.25
    assert gl.graph_params.k == 6
    assert gl.graph_params.topk == 3 + 1  # define_result_k at k=6
    assert gl.graph_params.p == 2.5
    assert gl.graph_params.sigma == 0.15
    assert gl.graph_params.normalise is False


def test_with_deterministic_clustering():
    """Same seed -> same clustering
    (test_laplacian_unnormalised.rs:61-77)."""
    items = make_moons_hd(80, 0.50, 0.50, 9, 789)
    a1, _ = (ArrowSpaceBuilder().with_lambda_graph(0.3, 4, 2, 2.0, None)
             .with_seed(42).build(items.tolist()))
    a2, _ = (ArrowSpaceBuilder().with_lambda_graph(0.3, 4, 2, 2.0, None)
             .with_seed(42).build(items.tolist()))
    assert a1.n_clusters == a2.n_clusters
    np.testing.assert_array_equal(a1.cluster_assignments,
                                  a2.cluster_assignments)
    np.testing.assert_allclose(np.asarray(a1.lambdas),
                               np.asarray(a2.lambdas), rtol=1e-12)


def test_cosine_similarity_scale_invariance():
    """cos(c1·a, c2·b) == cos(a, b)
    (test_laplacian_unnormalised.rs:105-129)."""
    items = make_moons_hd(2, 0.0, 1.0, 13, 321)
    a, b = items[0], items[1]
    assert _cosine(a * 3.5, b * 0.2) == pytest.approx(_cosine(a, b),
                                                      abs=1e-10)


def test_hybrid_similarity_scale_sensitivity():
    """The magnitude-penalised blend differs under rescaling
    (test_laplacian_unnormalised.rs:132-160)."""
    items = make_moons_hd(2, 0.0, 1.0, 13, 654)
    a, b = items[0], items[1]
    h_orig = _hybrid(a, b, 0.7, 0.3)
    h_scaled = _hybrid(a * 5.0, b * 0.1, 0.7, 0.3)
    assert abs(h_orig - h_scaled) > 1e-6


def test_builder_normalized_vs_unnormalized_clustering():
    """Per-item rescaling leaves pairwise cosines identical
    (test_laplacian_unnormalised.rs:163-215)."""
    base = make_moons_hd(70, 0.16, 0.38, 11, 999)
    scales = np.array([1.0, 3.0, 0.5, 2.5, 1.5, 4.0, 0.8])
    unnorm = base * scales[np.arange(len(base)) % len(scales)][:, None]
    norms = np.linalg.norm(unnorm, axis=1, keepdims=True)
    normalized = np.where(norms > 1e-12, unnorm / norms, unnorm)

    for i in range(10):
        for j in range(i + 1, 10):
            assert _cosine(base[i], base[j]) == pytest.approx(
                _cosine(normalized[i], normalized[j]), abs=1e-10)


def test_builder_lambda_comparison_normalized_vs_unnormalized():
    """Normalise=True (StandardScaler pre-step) vs raw magnitudes yield
    different spectral indexes; both stay finite and non-negative
    (test_laplacian_unnormalised.rs:218-280)."""
    base = make_moons_hd(60, 0.18, 0.35, 10, 555)
    scales = np.array([10.0, 0.1, 5.0, 2.0, 0.5])
    unnorm = base * scales[np.arange(len(base)) % len(scales)][:, None]

    # eps widened vs the reference's 0.25 and no spectral overlay: at 0.25
    # the graph is so sparse that every λ is exactly 0 on both sides and
    # the comparison is vacuous (the reference test only prints diffs,
    # reference: test_laplacian_unnormalised.rs:264-279 has no assert)
    a_norm, _ = (ArrowSpaceBuilder()
                 .with_lambda_graph(1.0, 5, 2, 2.0, None)
                 .with_normalisation(True)
                 .with_seed(7).build(base.tolist()))
    a_unnorm, _ = (ArrowSpaceBuilder()
                   .with_lambda_graph(1.0, 5, 2, 2.0, None)
                   .with_normalisation(False)
                   .with_seed(7).build(unnorm.tolist()))

    ln = np.asarray(a_norm.lambdas)
    lu = np.asarray(a_unnorm.lambdas)
    assert np.all(np.isfinite(ln)) and np.all(np.isfinite(lu))
    assert np.all(ln >= 0.0) and np.all(lu >= 0.0)
    # magnitude information must show up: the two spectra differ
    assert np.max(np.abs(ln - lu)) > 1e-6


def test_magnitude_penalty_computation():
    """exp(-|ln r|) == min(r, 1/r), and similar scales beat dissimilar
    (test_laplacian_unnormalised.rs:283-330)."""
    item1 = np.array([1.0, 2.0, 3.0])
    same = np.array([1.5, 3.0, 4.5])
    diff = np.array([0.1, 0.2, 0.3])

    for other in (same, diff):
        r = np.linalg.norm(item1) / np.linalg.norm(other)
        assert _magnitude_penalty(item1, other) == pytest.approx(
            min(r, 1.0 / r), abs=1e-12)
    assert _magnitude_penalty(item1, same) > _magnitude_penalty(item1, diff)


def test_hybrid_similarity_components():
    """Sweep scale pairs: cosine stays invariant, hybrid decomposes exactly
    into 0.6*cos + 0.4*penalty (test_laplacian_unnormalised.rs:333-377)."""
    items = make_moons_hd(2, 0.0, 1.0, 10, 888)
    a, b = items[0], items[1]
    base_cos = _cosine(a, b)
    for s1 in (0.1, 0.5, 1.0, 2.0, 10.0):
        for s2 in (0.1, 0.5, 1.0, 2.0, 10.0):
            sa, sb = a * s1, b * s2
            cos = _cosine(sa, sb)
            hybrid = _hybrid(sa, sb, 0.6, 0.4)
            manual = 0.6 * cos + 0.4 * _magnitude_penalty(sa, sb)
            assert hybrid == pytest.approx(manual, abs=1e-10)
            assert cos == pytest.approx(base_cos, abs=1e-10)
