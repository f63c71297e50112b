"""ArrowItem / ArrowSpace container tests, mirroring tests/test_arrow.rs
and the unnormalised-magnitude checks in
tests/test_laplacian_unnormalised.rs."""

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.core import ArrowFeature, ArrowItem, ArrowSpace
from arrowspace_tpu.taumode import TauMode
from data import make_moons_hd


# --- ArrowItem primitives ---------------------------------------------------

def test_arrow_item_basics():
    a = ArrowItem([1.0, 2.0, 3.0], 0.5)
    b = ArrowItem([4.0, 5.0, 6.0], 0.0)
    assert len(a) == 3 and not a.is_empty()
    assert a.dot(b) == pytest.approx(32.0)
    assert ArrowItem.norm([3.0, 4.0]) == pytest.approx(5.0)
    assert a.euclidean_distance(ArrowItem([1.0, 2.0, 3.0], 0.0)) == 0.0
    assert ArrowItem([1.0, 1.0], 0).euclidean_distance(
        ArrowItem([4.0, 5.0], 0)) == pytest.approx(5.0)


def test_cosine_similarity_zero_guard():
    a = ArrowItem([1.0, 0.0], 0.0)
    assert a.cosine_similarity([0.0, 1.0]) == pytest.approx(0.0)
    z = ArrowItem([0.0, 0.0], 0.0)
    assert z.cosine_similarity([1.0, 1.0]) == 0.0


def test_lambda_similarity_blend():
    a = ArrowItem([1.0, 0.0], 0.5)
    b = ArrowItem([1.0, 0.0], 0.6)
    # cos = 1, λ-sim = 0.9 -> 0.7·1 + 0.3·0.9 = 0.97
    assert a.lambda_similarity(b, 0.7) == pytest.approx(0.97)
    # Δλ clamps at 1
    c = ArrowItem([1.0, 0.0], 5.0)
    assert a.lambda_component_similarity(c) == 0.0
    with pytest.raises(AssertionError):
        a.lambda_similarity(ArrowItem([1.0, 0.0, 0.0], 0.1), 0.5)


def test_item_inplace_ops():
    a = ArrowItem([1.0, 2.0], 0.0)
    a.add_inplace(ArrowItem([3.0, 4.0], 0.0))
    np.testing.assert_allclose(a.item, [4.0, 6.0])
    a.mul_inplace(ArrowItem([2.0, 0.5], 0.0))
    np.testing.assert_allclose(a.item, [8.0, 3.0])
    a.scale(0.5)
    np.testing.assert_allclose(a.item, [4.0, 1.5])


# --- ArrowSpace construction -------------------------------------------------

def test_arrowspace_new_validation():
    with pytest.raises(AssertionError):
        ArrowSpace.new(np.zeros((0, 3)))
    with pytest.raises(AssertionError, match="one arrow"):
        ArrowSpace.new([[1.0, 2.0]])


def test_get_set_item_and_feature():
    rows = np.arange(12, dtype=float).reshape(4, 3)
    aspace = ArrowSpace.new(rows)
    it = aspace.get_item(2)
    np.testing.assert_allclose(it.item, [6.0, 7.0, 8.0])
    feat = aspace.get_feature(1)
    np.testing.assert_allclose(feat.feature, [1.0, 4.0, 7.0, 10.0])
    aspace.set_item(0, ArrowItem([9.0, 9.0, 9.0], 0.0))
    np.testing.assert_allclose(np.asarray(aspace.data[0]), 9.0)
    aspace.set_feature(2, ArrowFeature([1.0, 1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(aspace.data[:, 2]), 1.0)
    with pytest.raises(AssertionError):
        aspace.get_item(99)


# --- In-place algebra with λ maintenance (core.rs:614-727) -------------------

def _built_space():
    rows = make_moons_hd(40, noise=0.1, hd_noise=0.05, dims=8, seed=2)
    return (ArrowSpaceBuilder()
            .with_lambda_graph(1.0, 5, 3, 2.0, None)  # connected graph
            .with_seed(4).build(rows.tolist()))


def test_add_items_recomputes_lambdas():
    aspace, gl = _built_space()
    # nnodes bookkeeping: gl.nnodes equals nitems, required by add_items
    before = np.asarray(aspace.lambdas).copy()
    aspace.add_items(0, 1, gl)
    after = np.asarray(aspace.lambdas)
    assert not np.allclose(before, after)  # λ recomputed after mutation
    # row 0 actually mutated
    with pytest.raises(AssertionError):
        aspace.add_items(0, 999, gl)


def test_scale_item_lambda_invariance():
    """λτ with Median τ changes under scaling (τ scales with coords), but
    Fixed-τ λ is scale-invariant — verify both behaviours."""
    aspace, gl = _built_space()
    aspace.taumode = TauMode.fixed(0.5)
    aspace.recompute_lambdas(gl)
    before = np.asarray(aspace.lambdas).copy()
    aspace.scale_item(3, 2.0, gl)
    after = np.asarray(aspace.lambdas)
    # scaling one row leaves its own E and G invariant (both are
    # scale-free) => with fixed τ all lambdas unchanged
    np.testing.assert_allclose(before, after, rtol=1e-9)


def test_mul_items():
    aspace, gl = _built_space()
    row0 = np.asarray(aspace.data[0]).copy()
    row1 = np.asarray(aspace.data[1]).copy()
    aspace.mul_items(0, 1, gl)
    np.testing.assert_allclose(np.asarray(aspace.data[0]), row0 * row1,
                               rtol=1e-12)


def test_update_lambdas_shape_check():
    aspace, _ = _built_space()
    with pytest.raises(AssertionError):
        aspace.update_lambdas(np.zeros(3))


# --- unnormalised vs normalised magnitude sensitivity ------------------------

def test_unnormalised_magnitude_sensitivity():
    """Raw magnitudes must influence the graph when normalise=False
    (tests/test_laplacian_unnormalised.rs:106-377)."""
    rows = make_moons_hd(50, noise=0.1, hd_noise=0.05, dims=8, seed=6)
    scaled = rows.copy()
    scaled[::2] *= 100.0  # wildly different magnitudes

    b1 = ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None) \
        .with_seed(8)
    a1, _ = b1.build(rows.tolist())
    b2 = ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None) \
        .with_seed(8)
    a2, _ = b2.build(scaled.tolist())
    # λ distributions must differ (magnitude info kept)
    assert not np.allclose(np.asarray(a1.lambdas), np.asarray(a2.lambdas))


def test_cluster_of_and_lambdas_accessor():
    aspace, _ = _built_space()
    lam = aspace.lambdas_list()
    assert lam.shape == (40,)
    seen = {aspace.cluster_of(i) for i in range(aspace.nitems)}
    assert any(v is not None for v in seen)
    assert aspace.cluster_of(10 ** 6) is None


def test_densematrix_to_vecvec():
    from arrowspace_tpu.core import densematrix_to_vecvec
    out = densematrix_to_vecvec(np.arange(6).reshape(2, 3))
    assert out == [[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]]


def test_single_row_lambda_refresh_equals_full_recompute():
    """The O(1)-row λ maintenance must produce exactly the same vector as
    the reference's full batch recompute (SURVEY.md §3.5)."""
    aspace, gl = _built_space()
    import copy
    aspace2 = copy.copy(aspace)
    aspace2.data = aspace.data
    aspace2.lambdas = aspace.lambdas

    aspace.add_items(2, 5, gl)           # fast path
    aspace2.data = aspace2.data.at[2].add(aspace2.data[5])
    aspace2.recompute_lambdas(gl)        # full batch

    np.testing.assert_allclose(np.asarray(aspace.lambdas),
                               np.asarray(aspace2.lambdas), rtol=1e-9)
