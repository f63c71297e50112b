"""JL projection tests, mirroring tests/test_reduction.rs:12-126."""

import numpy as np
import pytest

from arrowspace_tpu.reduction import (ImplicitProjection, compute_jl_dimension,
                                      project_matrix)


def test_jl_dimension_formula():
    import math
    # r = max(32, ceil(8 ln n / eps^2))
    assert compute_jl_dimension(17, 0.3) == max(
        32, math.ceil(8 * math.log(17) / 0.09))
    assert compute_jl_dimension(3, 1.0) == 32  # floor at 32
    assert compute_jl_dimension(10000, 0.3) == math.ceil(
        8 * math.log(10000) / 0.09)


def test_projection_determinism():
    proj = ImplicitProjection(100, 40, seed=77)
    q = np.random.default_rng(0).normal(size=100)
    a = proj.project(q)
    b = proj.project(q)
    np.testing.assert_array_equal(a, b)
    # same seed -> same matrix
    proj2 = ImplicitProjection(100, 40, seed=77)
    np.testing.assert_array_equal(a, proj2.project(q))
    # different seed -> different projection
    proj3 = ImplicitProjection(100, 40, seed=78)
    assert not np.allclose(a, proj3.project(q))


def test_projection_linearity_and_scale():
    proj = ImplicitProjection(64, 32, seed=5)
    rng = np.random.default_rng(1)
    x, y = rng.normal(size=64), rng.normal(size=64)
    px, py = proj.project(x), proj.project(y)
    np.testing.assert_allclose(proj.project(x + y), px + py, rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_allclose(proj.project(3.0 * x), 3.0 * px, rtol=1e-6)


def test_projection_preserves_distances_statistically():
    """JL property: pairwise distances preserved within ~eps on average."""
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(20, 512))
    proj = ImplicitProjection(512, 128, seed=9)
    ppts = np.asarray(project_matrix(pts, proj))
    orig = np.linalg.norm(pts[:, None] - pts[None, :], axis=2)
    red = np.linalg.norm(ppts[:, None] - ppts[None, :], axis=2)
    mask = orig > 0
    ratios = red[mask] / orig[mask]
    assert abs(np.mean(ratios) - 1.0) < 0.1
    assert np.all(ratios > 0.5) and np.all(ratios < 1.5)


def test_project_matrix_shape():
    pts = np.random.default_rng(3).normal(size=(10, 96))
    proj = ImplicitProjection(96, 48, seed=11)
    out = np.asarray(project_matrix(pts, proj))
    assert out.shape == (10, 48)
    np.testing.assert_allclose(out[4], proj.project(pts[4]), rtol=1e-6)


def test_projection_zero_vector():
    """Zero in, zero out (test_reduction.rs:60-70)."""
    proj = ImplicitProjection(40, 10, seed=1)
    out = np.asarray(proj.project(np.zeros(40)))
    assert out.shape == (10,)
    assert np.all(np.abs(out) < 1e-10)


def test_projection_preserves_scale_and_nontrivial():
    """JL norm preservation within a loose band, and the projection of a
    non-zero vector is non-zero (test_reduction.rs:96-126)."""
    proj = ImplicitProjection(50, 15, seed=3)
    q = np.ones(50)
    out = np.asarray(proj.project(q))
    ratio = np.linalg.norm(out) / np.linalg.norm(q)
    assert 0.5 < ratio < 2.0
    assert np.any(np.abs(out) > 1e-10)


def test_project_matrix_zero_and_row_independence():
    """Zero matrix projects to zero; distinct rows project to distinct
    vectors (test_reduction.rs:151-187)."""
    proj = ImplicitProjection(20, 6, seed=4)
    zeros = np.asarray(project_matrix(np.zeros((3, 20)), proj))
    assert np.all(np.abs(zeros) < 1e-10)
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(4, 20))
    out = np.asarray(project_matrix(pts, proj))
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.allclose(out[i], out[j])


def test_jl_dimension_bounds_and_monotonicity():
    """The r = max(32, ceil(8 ln n / eps^2)) formula's shape
    (test_reduction.rs:189-289): floor at 32, grows with n, shrinks with
    eps, and the reference's absolute anchors."""
    # minimum bound: n=2, eps=0.9 -> ~6.9 -> clamped to 32
    assert compute_jl_dimension(2, 0.9) == 32
    # grows with n
    assert compute_jl_dimension(10_000, 0.1) > compute_jl_dimension(100, 0.1)
    # inversely proportional to epsilon
    assert compute_jl_dimension(5000, 0.1) > compute_jl_dimension(5000, 0.2)
    # large dataset anchor: 1M rows at eps=0.1 -> 8 ln(1e6)/0.01 ~ 11k
    d = compute_jl_dimension(1_000_000, 0.1)
    assert 10_000 <= d < 20_000
    # tight epsilon anchor: 10k rows at eps=0.05 -> >= 25k
    assert compute_jl_dimension(10_000, 0.05) >= 25_000
    # very small epsilon: 500 rows at eps=0.01 -> >= 400k
    assert compute_jl_dimension(500, 0.01) >= 400_000
    # reasonable range sweep
    for n, eps in ((100, 0.2), (1000, 0.15), (10_000, 0.1)):
        d = compute_jl_dimension(n, eps)
        assert 32 <= d < 100_000


def test_full_pipeline_projection_finite():
    """Matrix -> project -> all values finite at the right shape
    (test_reduction.rs:291-318)."""
    data = (np.arange(20 * 100, dtype=np.float64) * 0.01).reshape(20, 100)
    proj = ImplicitProjection(100, 15, seed=6)
    out = np.asarray(project_matrix(data, proj))
    assert out.shape == (20, 15)
    assert np.all(np.isfinite(out))


def test_projection_state_is_seed_only():
    """The persisted identity of a projection is (orig, reduced, seed) —
    the reference stores only those 24 bytes and regenerates the matrix
    (test_reduction.rs:320-333; reduction.rs:168-203).  This repo caches
    the regenerated matrix host-side for batch speed (a documented
    divergence), but the cache must be derived state: a fresh instance
    with the same triple projects identically."""
    a = ImplicitProjection(1000, 100, seed=9)
    q = np.ones(1000)
    out_a = np.asarray(a.project(q))
    assert out_a.shape == (100,)
    b = ImplicitProjection(1000, 100, seed=9)
    np.testing.assert_array_equal(out_a, np.asarray(b.project(q)))
    assert (a.original_dim, a.reduced_dim, a.seed) == (1000, 100, 9)
