"""Builder-level tests, mirroring tests/test_builder.rs."""

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder, ConfigValue
from arrowspace_tpu.sampling import SamplerType
from arrowspace_tpu.taumode import TauMode
from data import make_gaussian_hd, make_moons_hd


def test_defaults_match_reference():
    """builder.rs:59-91."""
    b = ArrowSpaceBuilder()
    assert b.lambda_eps == 1e-3
    assert b.lambda_k == 6
    assert b.lambda_topk == 3
    assert b.lambda_p == 2.0
    assert b.lambda_sigma is None
    assert b.normalise is False
    assert b.sparsity_check is False
    assert b.sampling == SamplerType.simple(0.6)
    assert b.cluster_max_clusters is None
    assert b.cluster_radius == 1.0
    assert b.clustering_seed is None
    assert b.deterministic_clustering is False
    assert b.use_dims_reduction is False
    assert b.rp_eps == 0.3
    assert b.synthesis == TauMode.median()


def test_define_result_k_heuristic():
    """builder.rs:225-233: k<=5 -> topk 3; k<10 -> topk 4; else user's."""
    b = ArrowSpaceBuilder().with_lambda_graph(0.5, 4, 9, 2.0, None)
    b.define_result_k()
    assert b.lambda_topk == 3
    b = ArrowSpaceBuilder().with_lambda_graph(0.5, 7, 9, 2.0, None)
    b.define_result_k()
    assert b.lambda_topk == 4
    b = ArrowSpaceBuilder().with_lambda_graph(0.5, 20, 9, 2.0, None)
    b.define_result_k()
    assert b.lambda_topk == 9


def test_with_seed_enables_deterministic():
    b = ArrowSpaceBuilder().with_seed(7)
    assert b.clustering_seed == 7
    assert b.deterministic_clustering is True


def test_build_end_to_end_shapes():
    rows = make_moons_hd(120, noise=0.08, hd_noise=0.05, dims=16, seed=1)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_lambda_graph(1.0, 5, 3, 2.0, None)
                  .with_seed(42)
                  .build(rows.tolist()))
    assert aspace.nitems == 120
    assert aspace.nfeatures == 16
    # canonical quirk: graph over the F' feature rows
    assert gl.shape() == (16, 16)
    assert gl.nnodes == 120
    lam = np.asarray(aspace.lambdas)
    assert lam.shape == (120,)
    assert np.all(np.isfinite(lam))
    assert np.any(lam != 0.0)
    # clustering metadata recorded
    assert aspace.n_clusters >= 2
    assert aspace.cluster_radius > 0.0


def test_build_deterministic_with_seed():
    rows = make_moons_hd(100, noise=0.1, hd_noise=0.05, dims=10, seed=2)
    a1, _ = ArrowSpaceBuilder().with_seed(5).build(rows.tolist())
    a2, _ = ArrowSpaceBuilder().with_seed(5).build(rows.tolist())
    np.testing.assert_array_equal(np.asarray(a1.lambdas),
                                  np.asarray(a2.lambdas))
    assert a1.n_clusters == a2.n_clusters


def test_build_with_dims_reduction():
    rows = make_gaussian_hd(140, spread=0.5, dims=96, seed=3)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_lambda_graph(1.0, 6, 3, 2.0, None)
                  .with_dims_reduction(True, 1.0)
                  .with_seed(17)
                  .build(rows.tolist()))
    assert aspace.projection_matrix is not None
    assert aspace.reduced_dim is not None
    assert aspace.reduced_dim <= 48  # min(jl_dim, F/2)
    assert gl.shape() == (aspace.reduced_dim, aspace.reduced_dim)


def test_build_no_sampling():
    rows = make_moons_hd(80, noise=0.1, hd_noise=0.05, dims=8, seed=4)
    aspace, _ = (ArrowSpaceBuilder()
                 .with_inline_sampling(None)
                 .with_seed(3)
                 .build(rows.tolist()))
    # without sampling all rows participate (assigned or soft/dropped)
    assert aspace.nitems == 80


def test_spectral_build():
    rows = make_moons_hd(60, noise=0.1, hd_noise=0.05, dims=12, seed=5)
    aspace, gl = (ArrowSpaceBuilder()
                  .with_spectral(True)
                  .with_seed(9)
                  .build(rows.tolist()))
    assert aspace.signals is not None
    assert aspace.signals.shape == (12, 12)


def test_config_typed_roundtrip():
    b = (ArrowSpaceBuilder()
         .with_lambda_graph(0.5, 8, 4, 3.0, 0.25)
         .with_synthesis(TauMode.percentile(0.75))
         .with_seed(11))
    cfg = b.builder_config_typed()
    assert cfg["lambda_eps"].as_f64() == 0.5
    assert cfg["lambda_k"].as_usize() == 8
    assert cfg["synthesis"].as_tau_mode() == TauMode.percentile(0.75)
    assert cfg["clustering_seed"].value == 11
    # JSON round-trip
    for key, val in cfg.items():
        back = ConfigValue.from_json(val.to_json())
        assert back == val, key


def test_display_cookie_format():
    s = str(ArrowSpaceBuilder())
    assert "lambda_eps=0.001" in s
    assert "synthesis=Median" in s
    assert "sampling=Simple(0.6)" in s
    assert "persistence=None" in s


def test_clustering_produces_valid_assignments():
    """Every assignment is None or a valid centroid id; sizes sum to the
    number of assigned rows (test_arrow.rs:96-118)."""
    rows = make_moons_hd(90, noise=0.1, hd_noise=0.05, dims=10, seed=22)
    aspace, _ = (ArrowSpaceBuilder()
                 .with_lambda_graph(1.0, 5, 3, 2.0, None)
                 .with_seed(7).build(rows.tolist()))
    assigned = 0
    for i in range(aspace.nitems):
        c = aspace.cluster_of(i)
        if c is not None:
            assert 0 <= c < aspace.n_clusters
            assigned += 1
    assert int(aspace.cluster_sizes.sum()) == assigned
    assert aspace.n_clusters == len(aspace.cluster_sizes)


def test_lambda_computation_with_different_tau_modes():
    """Different tau policies must produce different lambdas
    (test_arrow.rs:163-199)."""
    rows = make_moons_hd(60, noise=0.1, hd_noise=0.05, dims=10, seed=23)
    lams = {}
    for name, mode in [("median", TauMode.median()),
                       ("mean", TauMode.mean()),
                       ("fixed", TauMode.fixed(0.25)),
                       ("p75", TauMode.percentile(0.75))]:
        aspace, _ = (ArrowSpaceBuilder()
                     .with_lambda_graph(1.0, 5, 3, 2.0, None)
                     .with_synthesis(mode)
                     .with_seed(9).build(rows.tolist()))
        lams[name] = np.asarray(aspace.lambdas)
        assert np.all(np.isfinite(lams[name]))
    assert not np.allclose(lams["median"], lams["fixed"])
    assert not np.allclose(lams["mean"], lams["p75"])


def test_normalisation_flag_changes_graph():
    """normalise=True must alter the built graph
    (test_arrow.rs:80-94, 201-258)."""
    rows = (make_moons_hd(50, noise=0.1, hd_noise=0.05, dims=8, seed=24)
            * 7.0 + 2.0)
    a1, g1 = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None)
              .with_seed(3).build(rows.tolist()))
    a2, g2 = (ArrowSpaceBuilder().with_lambda_graph(1.0, 5, 3, 2.0, None)
              .with_normalisation(True).with_seed(3).build(rows.tolist()))
    assert not np.allclose(np.asarray(g1.matrix), np.asarray(g2.matrix))
    assert g2.graph_params.normalise is True
