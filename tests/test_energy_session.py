"""EnergySearchSession (index.py): the fused streaming serving path for
energy indices must reproduce the one-shot search_energy_batch API
exactly on CPU/f64, handle partial tail batches, and reject dimension
mismatches.  Serving semantics mirrored: energymaps.rs:368-407 scoring
with core.rs:533-549 query-λ preparation."""

import numpy as np
import pytest

from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.energymaps import EnergyParams, build_energy
from arrowspace_tpu.index import ArrowIndex


@pytest.fixture(scope="module")
def energy_index():
    rng = np.random.default_rng(5)
    centers = rng.uniform(0, 1, (40, 16))
    rows = centers[rng.integers(0, 40, 800)] + rng.normal(0, 0.02, (800, 16))
    b = (ArrowSpaceBuilder().with_seed(7).with_dims_reduction(True, 0.3)
         .with_inline_sampling(None))
    aspace, gl = build_energy(
        b, rows.tolist(),
        EnergyParams(split_quantile=0.2, allow_tall_graphs=True))
    return ArrowIndex(aspace, gl, b), rows


def test_energy_session_matches_batch_api(energy_index):
    idx, rows = energy_index
    rng = np.random.default_rng(1)
    queries = rows[rng.integers(0, rows.shape[0], 24)] * 1.01

    want_s, want_i = idx.search_energy(queries, k=5, w_lambda=1.0,
                                       w_dirichlet=0.5)
    sess = idx.make_energy_session(batch_size=8, k=5, w_lambda=1.0,
                                   w_dirichlet=0.5)
    sess.warmup()
    got = list(sess.search_stream([queries[i:i + 8]
                                   for i in range(0, 24, 8)]))
    assert len(got) == 3
    got_s = np.concatenate([s for s, _ in got])
    got_i = np.concatenate([i for _, i in got])
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-9)


def test_energy_session_partial_tail(energy_index):
    idx, rows = energy_index
    sess = idx.make_energy_session(batch_size=8, k=4)
    batches = [rows[:8] * 1.01, rows[8:11] * 1.01]  # tail of 3
    got = list(sess.search_stream(batches))
    assert got[0][1].shape == (8, 4)
    assert got[1][1].shape == (3, 4)
    s_ref, i_ref = idx.search_energy(batches[1], k=4)
    np.testing.assert_array_equal(got[1][1], i_ref)
    np.testing.assert_allclose(got[1][0], s_ref, rtol=1e-9)


def test_energy_session_dim_mismatch_raises(energy_index):
    idx, rows = energy_index
    sess = idx.make_energy_session(batch_size=4, k=3)
    bad = np.ones((4, rows.shape[1] + 3))
    with pytest.raises(ValueError, match="features"):
        list(sess.search_stream([bad]))


def test_energy_session_weight_sweep(energy_index):
    """Weights ride as device scalars (one executable across weight
    configs); each weight pair must still match the one-shot API."""
    idx, rows = energy_index
    queries = rows[5:9] * 1.02
    for wl, wd in ((1.0, 0.5), (0.3, 1.7), (0.0, 1.0)):
        sess = idx.make_energy_session(batch_size=4, k=5, w_lambda=wl,
                                       w_dirichlet=wd)
        (s, i), = list(sess.search_stream([queries]))
        s_ref, i_ref = idx.search_energy(queries, k=5, w_lambda=wl,
                                         w_dirichlet=wd)
        np.testing.assert_array_equal(i, i_ref)
        np.testing.assert_allclose(s, s_ref, rtol=1e-9)


