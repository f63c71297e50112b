"""Transcribed numeric expectations from the reference's own test suite.

VERDICT r2 item 6(a): the reference's tests in
/root/reference/src/tests/*.rs were swept for HARDCODED numeric
expectations (as opposed to invariants, which tests mirror elsewhere);
every genuinely numeric assert found is transcribed here with its
file:line so the semantics are pinned against the reference's own
stated values, not just this repo's self-generated goldens.

Sweep notes (what was NOT transcribed and why): the overwhelming
majority of reference asserts are loose invariants (λ >= 0, radius > 0,
sparsity in (0, 0.95), result counts) already covered by
test_spectral_invariants.py / test_taumode.py / test_clustering.py;
the 1e-10 hybrid-similarity decomposition of
test_laplacian_unnormalised.rs:360-377 is covered by
test_magnitude_sensitivity.py; the staged==monolithic 1e-6 equalities
of test_eigenmaps.rs:182/262/326 by test_eigenmaps.py.
"""

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.clustering import euclidean_dist
from arrowspace_tpu.taumode import TAU_FLOOR, TauMode, select_tau
from data import make_moons_hd


def test_tau_floor_value():
    """taumode.rs:84: TAU_FLOOR = 1e-10; test_taumode.rs:321 asserts it
    is < 1e-6."""
    assert TAU_FLOOR == 1e-10
    assert TAU_FLOOR < 1e-6


def test_select_tau_fixed_reference_values():
    """test_taumode.rs:14-38."""
    energies = [0.1, 0.5, 1.0]
    assert select_tau(energies, TauMode.fixed(0.3)) == 0.3
    assert select_tau(energies, TauMode.fixed(-0.1)) == TAU_FLOOR
    assert select_tau(energies, TauMode.fixed(0.0)) == TAU_FLOOR
    assert select_tau(energies, TauMode.fixed(float("nan"))) == TAU_FLOOR
    assert select_tau(energies, TauMode.fixed(float("inf"))) == TAU_FLOOR


def test_select_tau_mean_reference_values():
    """test_taumode.rs:41-64."""
    assert select_tau([1.0, 2.0, 3.0], TauMode.mean()) == \
        pytest.approx(2.0, abs=1e-12)
    with_nan = [1.0, float("nan"), 3.0, float("inf"), 2.0]
    assert select_tau(with_nan, TauMode.mean()) == \
        pytest.approx(2.0, abs=1e-12)
    all_invalid = [float("nan"), float("inf"), float("-inf")]
    assert select_tau(all_invalid, TauMode.mean()) == TAU_FLOOR
    assert select_tau([], TauMode.mean()) == TAU_FLOOR


def test_select_tau_median_reference_values():
    """test_taumode.rs:66-92."""
    assert select_tau([3.0, 1.0, 2.0], TauMode.median()) == 2.0
    assert select_tau([1.0, 2.0, 3.0, 4.0], TauMode.median()) == \
        pytest.approx(2.5, abs=1e-12)
    assert select_tau([5.0], TauMode.median()) == 5.0


def test_euclidean_dist_reference_values():
    """test_clustering.rs:20-42: sqrt(3), identity 0, 1-d |5-2|=3."""
    assert euclidean_dist([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]) == \
        pytest.approx(np.sqrt(3.0), abs=1e-10)
    assert euclidean_dist([3.5, -2.1, 4.8], [3.5, -2.1, 4.8]) == \
        pytest.approx(0.0, abs=1e-10)
    assert euclidean_dist([5.0], [2.0]) == pytest.approx(3.0, abs=1e-10)


def test_builder_parameter_preservation_graph_factory():
    """test_graph_factory.rs:245-268: eps 0.123, k 7, p 3.5,
    sigma 0.456 survive the builder; topk is REWRITTEN to 4 by
    define_result_k (builder.rs:225-233: 5 < k < 10 -> 4) — the
    reference test spells the expectation `3 + 1`."""
    items = make_moons_hd(50, noise=0.2, hd_noise=0.4, dims=7, seed=321)
    b = (ArrowSpaceBuilder()
         .with_lambda_graph(0.123, 7, 3, 3.5, 0.456)
         .with_normalisation(False)
         .with_inline_sampling(None))
    _, gl = b.build(items.tolist())
    gp = gl.graph_params
    assert gp.eps == 0.123
    assert gp.k == 7
    assert gp.topk == 3 + 1
    assert gp.p == 3.5
    assert gp.sigma == 0.456
    assert gp.normalise is False


def test_builder_parameter_preservation_unnormalised():
    """test_laplacian_unnormalised.rs:38-56: eps 0.25, k 6, p 2.5,
    sigma 0.15; topk again 3 -> 4 via define_result_k (k=6)."""
    items = make_moons_hd(50, noise=0.18, hd_noise=0.4, dims=7, seed=456)
    b = (ArrowSpaceBuilder()
         .with_lambda_graph(0.25, 6, 3, 2.5, 0.15)
         .with_normalisation(False)
         .with_inline_sampling(None))
    _, gl = b.build(items.tolist())
    gp = gl.graph_params
    assert gp.eps == 0.25 and gp.k == 6 and gp.topk == 4
    assert gp.p == 2.5 and gp.sigma == 0.15 and gp.normalise is False


def test_implicit_projection_zero_vector():
    """test_reduction.rs:60-68: a zero vector projects to all
    |x| < 1e-10."""
    from arrowspace_tpu.reduction import ImplicitProjection
    proj = ImplicitProjection(40, 10)
    out = np.asarray(proj.project(np.zeros(40)))
    assert out.shape == (10,)
    assert np.all(np.abs(out) < 1e-10)


def test_project_query_zero_vector_through_builder():
    """test_querying_proj.rs:608-631: with dims reduction active, a
    zero query projects to near-zero (|x| < 1e-8) at the reduced
    dimension."""
    rng = np.random.default_rng(11)
    items = rng.uniform(0.1, 1.0, (60, 100))
    b = (ArrowSpaceBuilder()
         .with_lambda_graph(0.2, 4, 2, 2.0, None)
         .with_dims_reduction(True, 0.8)
         .with_sparsity_check(False)
         .with_inline_sampling(None))
    aspace, _gl = b.build(items.tolist())
    assert aspace.projection_matrix is not None
    projected = np.asarray(aspace.project_query(np.zeros(100)))
    assert projected.shape[0] == aspace.projection_matrix.reduced_dim
    assert np.all(np.abs(projected) < 1e-8)
