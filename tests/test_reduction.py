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
