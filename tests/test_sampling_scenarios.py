"""Inline-sampling behavioural scenarios through the full builder.

Mirrors the sampler half of the reference's builder suite
(reference: src/tests/test_builder.rs:146-543): high-rate / aggressive
simple sampling, simple vs density-adaptive, outlier preservation,
uniform data, duplicates, multi-run statistics, sampled-vs-full builds,
λ-quality under sampling, and seeded determinism.  Builds are seeded so
the assertions are exact where the reference's are statistical.
"""

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.sampling import SamplerType
from data import make_gaussian_blob, make_moons_hd


def _kept(aspace) -> int:
    return int(np.sum(aspace.cluster_sizes))


def test_simple_random_high_rate():
    """Simple(0.8) keeps ~80% of rows (test_builder.rs:146-171)."""
    rows = make_gaussian_blob(297, dims=10, spread=0.8, seed=1)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_inline_sampling(SamplerType.simple(0.8))
                  .with_lambda_graph(1.0, 3, 3, 2.0, None)
                  .with_seed(42).build(rows.tolist()))
    ratio = _kept(aspace) / len(rows)
    assert 0.70 <= ratio <= 0.90, ratio
    assert aspace.data.shape == (297, 10)  # all items preserved in data
    assert gl.nnodes == 297


def test_simple_random_aggressive_sampling():
    """Simple(0.2) still yields a valid build (test_builder.rs:173-207)."""
    rows = make_gaussian_blob(99, dims=10, spread=0.5, seed=2)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_inline_sampling(SamplerType.simple(0.2))
                  .with_lambda_graph(1.0, 5, 5, 2.0, None)
                  .with_seed(7).build(rows.tolist()))
    ratio = _kept(aspace) / len(rows)
    assert 0.08 <= ratio <= 0.35, ratio
    assert np.all(np.isfinite(np.asarray(aspace.lambdas)))


def test_simple_random_vs_density_adaptive():
    """(test_builder.rs:209-249)"""
    rows = make_moons_hd(100, 0.10, 0.30, 10, 42)
    a_simple, _ = (ArrowSpaceBuilder()
                   .with_inline_sampling(SamplerType.simple(0.5))
                   .with_lambda_graph(1e-3, 3, 3, 2.0, None)
                   .with_seed(42).build(rows.tolist()))
    a_adapt, _ = (ArrowSpaceBuilder()
                  .with_inline_sampling(SamplerType.density_adaptive(0.5))
                  .with_lambda_graph(1e-3, 3, 3, 2.0, None)
                  .with_seed(42).build(rows.tolist()))
    simple_ratio = _kept(a_simple) / len(rows)
    density_ratio = _kept(a_adapt) / len(rows)
    assert 0.40 <= simple_ratio <= 0.65, simple_ratio
    assert 0.30 <= density_ratio <= 0.70, density_ratio


def test_density_adaptive_sampling_basic():
    """Tiny two-cluster corpus with an outlier cluster
    (test_builder.rs:251-274)."""
    rows = [[1.0, 0.0, 0.0], [1.1, 0.1, 0.0], [1.0, 0.0, 0.1],
            [1.1, 0.1, 0.1], [5.0, 5.0, 5.0], [5.1, 5.0, 5.0],
            [5.0, 5.1, 5.0], [5.0, 5.0, 5.1]]
    aspace, gl = (ArrowSpaceBuilder()
                  .with_inline_sampling(SamplerType.density_adaptive(0.5))
                  .with_lambda_graph(1.0, 3, 3, 2.0, None)
                  .with_seed(3).build(rows))
    assert aspace.data.shape == (8, 3)
    assert gl.nnodes == 8
    assert gl.matrix.shape[1] == 3  # F'xF' feature graph


def test_constant_sampler_preserves_outliers():
    """High-rate sampling keeps the outlier region represented in the
    data matrix (test_builder.rs:276-301)."""
    rows = make_gaussian_blob(99, dims=3, spread=0.3, seed=4)
    rows = np.concatenate([rows, np.full((4, 3), 10.0)
                           + np.random.default_rng(4).normal(0, 0.1, (4, 3))])
    aspace, _ = (ArrowSpaceBuilder()
                 .with_lambda_graph(0.5, 3, 2, 2.0, 0.25)
                 .with_inline_sampling(SamplerType.simple(0.8))
                 .with_seed(8).build(rows.tolist()))
    row_sums = np.asarray(aspace.data).sum(axis=1)
    assert np.any(row_sums > 15.0)  # outlier rows survive in the data


def test_density_adaptive_with_uniform_data():
    """(test_builder.rs:303-314)"""
    rows = make_moons_hd(50, 0.3, 0.52, 10, 42)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_inline_sampling(SamplerType.density_adaptive(0.5))
                  .with_lambda_graph(1.0, 5, 5, 2.0, None)
                  .with_seed(9).build(rows.tolist()))
    assert aspace.data.shape[1] == 10
    assert gl.nnodes == 50


def test_density_adaptive_aggressive_sampling():
    """(test_builder.rs:343-371)"""
    rows = make_moons_hd(50, 0.10, 0.40, 10, 42)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_inline_sampling(SamplerType.density_adaptive(0.5))
                  .with_lambda_graph(2.0, 5, 5, 2.0, None)
                  .with_seed(10).build(rows.tolist()))
    assert aspace.data.shape == (50, 10)
    assert gl.nnodes == 50
    assert gl.matrix.shape[0] == 10  # feature graph
    assert _kept(aspace) >= 4


def test_density_adaptive_with_duplicates():
    """Duplicate-heavy regions sample efficiently
    (test_builder.rs:374-403)."""
    rows = [[1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [1.001, 2.001, 3.001],
            [1.0, 2.0, 3.0], [5.0, 6.0, 7.0], [5.0, 6.0, 7.0],
            [5.001, 6.001, 7.001]]
    aspace, gl = (ArrowSpaceBuilder()
                  .with_inline_sampling(SamplerType.density_adaptive(0.5))
                  .with_lambda_graph(1.0, 3, 3, 2.0, None)
                  .with_seed(11).build(rows))
    assert aspace.data.shape == (7, 3)
    assert gl.nnodes > 0
    assert 1 <= aspace.n_clusters <= 5


def test_density_adaptive_sampling_statistics():
    """Multiple sizes/dims stay structurally valid
    (test_builder.rs:405-422)."""
    for i in range(1, 4):
        rows = make_moons_hd(50 * i, 0.5, 0.2, 10 * i, 42 * i)
        aspace, gl = (ArrowSpaceBuilder()
                      .with_inline_sampling(
                          SamplerType.density_adaptive(0.5))
                      .with_sparsity_check(False)
                      .with_seed(i).build(rows.tolist()))
        assert aspace.data.shape == (50 * i, 10 * i)
        assert gl.nnodes == 50 * i


def test_density_adaptive_vs_no_sampling():
    """(test_builder.rs:424-455)"""
    rows = make_gaussian_blob(99, dims=10, spread=0.5, seed=5)
    a_full, gl_full = (ArrowSpaceBuilder()
                       .with_lambda_graph(1.0, 5, 5, 2.0, None)
                       .with_inline_sampling(None)
                       .with_seed(12).build(rows.tolist()))
    a_sampled, gl_sampled = (ArrowSpaceBuilder()
                             .with_inline_sampling(
                                 SamplerType.density_adaptive(0.5))
                             .with_lambda_graph(1.0, 5, 5, 2.0, None)
                             .with_seed(12).build(rows.tolist()))
    # the data matrix holds ALL items either way; sampling affects only
    # which rows inform the clustering
    assert a_sampled.data.shape == a_full.data.shape
    assert _kept(a_sampled) < _kept(a_full)
    assert gl_sampled.nnodes > 0 and gl_full.nnodes > 0


def test_density_adaptive_maintains_lambda_quality():
    """λ stays non-negative with nonzero variance under sampling across
    sizes (test_builder.rs:457-489)."""
    for i in (1, 2):
        dims = 100 * i
        rows = make_moons_hd(33 * i, 0.25 * i, 0.25 * i, dims, 128 * i)
        aspace, _ = (ArrowSpaceBuilder()
                     .with_lambda_graph(1.0, 3, 3, 2.0, 0.5)
                     .with_inline_sampling(
                         SamplerType.density_adaptive(0.4))
                     .with_sparsity_check(False)
                     .with_seed(128 * i).build(rows.tolist()))
        lam = np.asarray(aspace.lambdas)
        assert np.all(lam >= 0.0)
        assert np.any(np.abs(lam - lam.mean()) > 1e-12), (dims, 128 * i)


def test_builder_unit_norm_build_works():
    """Unit-normalised inputs build identically-shaped state to raw
    inputs (test_builder.rs:508-543)."""
    raw = make_moons_hd(80, 0.50, 0.50, 9, 789)
    norms = np.linalg.norm(raw, axis=1, keepdims=True)
    unit = np.where(norms > 1e-12, raw / norms, raw)

    a_unit, _ = (ArrowSpaceBuilder()
                 .with_lambda_graph(0.3, 4, 2, 2.0, None)
                 .with_normalisation(False)
                 .with_dims_reduction(False, None)
                 .with_inline_sampling(None)
                 .with_seed(42).build(unit.tolist()))
    a_raw, _ = (ArrowSpaceBuilder()
                .with_lambda_graph(0.3, 4, 2, 2.0, None)
                .with_normalisation(False)
                .with_dims_reduction(False, None)
                .with_inline_sampling(None)
                .with_seed(42).build(raw.tolist()))
    assert a_unit.data.shape == a_raw.data.shape
    assert a_unit.n_clusters >= 1 and a_raw.n_clusters >= 1
