"""Energy-vs-standard comparison suite and remaining search scenarios.

Mirrors the reference's energy-search comparison tests
(reference: src/tests/test_energy_search.rs:15-600): self-retrieval,
weight tuning, k scaling, λ proximity, monotonicity, k=0, high-dim,
overlap / precision@k / recall@k / build-time vs the standard pipeline,
and cosine-independence.
"""

import time

import numpy as np
import pytest

from arrowspace_tpu import energymaps as en
from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.core import ArrowItem
from arrowspace_tpu.energymaps import EnergyParams
from data import make_gaussian_hd, make_moons_hd


def _energy_builder(seed, rp_eps=0.3):
    return (ArrowSpaceBuilder()
            .with_seed(seed)
            .with_dims_reduction(True, rp_eps)
            .with_inline_sampling(None))


def _std_builder(seed, rp_eps=0.3, eps=1.0, k=3, topk=3):
    return (ArrowSpaceBuilder()
            .with_lambda_graph(eps, k, topk, 2.0, None)
            .with_seed(seed)
            .with_dims_reduction(True, rp_eps)
            .with_inline_sampling(None))


@pytest.fixture(scope="module")
def energy_index():
    rows = make_gaussian_hd(100, spread=0.6, dims=96, seed=3)
    aspace, gl = en.build_energy(_energy_builder(12345), rows.tolist(),
                                 EnergyParams())
    return rows, aspace, gl


def test_energy_search_basic(energy_index):
    """(test_energy_search.rs:15-37)"""
    rows, aspace, gl = energy_index
    res = en.search_energy(aspace, rows[0], gl, 5, 1.0, 0.5)
    assert len(res) == 5
    assert res[0][1] > res[4][1]  # sorted descending


def test_energy_search_self_retrieval():
    """(test_energy_search.rs:40-62)"""
    rows = make_moons_hd(80, 0.2, 0.08, 99, 42)
    aspace, gl = en.build_energy(_energy_builder(9999), rows.tolist(),
                                 EnergyParams())
    res = en.search_energy(aspace, rows[10], gl, 1, 1.0, 0.5)
    assert len(res) == 1
    assert res[0][0] == 10


def test_energy_search_weight_tuning(energy_index):
    """Different (w_lambda, w_dirichlet) weightings re-rank
    (test_energy_search.rs:65-94)."""
    rows, aspace, gl = energy_index
    r_bal = en.search_energy(aspace, rows[7], gl, 10, 1.0, 0.5)
    r_lam = en.search_energy(aspace, rows[7], gl, 10, 2.0, 0.1)
    r_dir = en.search_energy(aspace, rows[7], gl, 10, 0.1, 2.0)
    assert len(r_bal) == len(r_lam) == len(r_dir) == 10
    sets = [{i for i, _ in r} for r in (r_bal, r_lam, r_dir)]
    # at least one pair of weightings must produce a different set
    assert sets[0] != sets[1] or sets[0] != sets[2]


def test_energy_search_k_scaling(energy_index):
    """Result prefix stability across k (test_energy_search.rs:97-122)."""
    rows, aspace, gl = energy_index
    r5 = en.search_energy(aspace, rows[3], gl, 5, 1.0, 0.5)
    r10 = en.search_energy(aspace, rows[3], gl, 10, 1.0, 0.5)
    r20 = en.search_energy(aspace, rows[3], gl, 20, 1.0, 0.5)
    assert len(r5) == 5 and len(r10) == 10 and len(r20) == 20
    assert [i for i, _ in r5] == [i for i, _ in r10[:5]]
    assert [i for i, _ in r10] == [i for i, _ in r20[:10]]


def test_energy_search_optical_compression():
    """Search works over an optically-compressed build
    (test_energy_search.rs:125-147)."""
    rows = make_gaussian_hd(100, spread=0.6, dims=96, seed=5)
    p = EnergyParams(optical_tokens=32)
    aspace, gl = en.build_energy(_energy_builder(777), rows.tolist(), p)
    res = en.search_energy(aspace, rows[4], gl, 5, 1.0, 0.5)
    assert len(res) == 5
    assert all(np.isfinite(s) for _, s in res)


def test_energy_search_lambda_proximity():
    """With w_dirichlet=0, ranking is pure λ proximity
    (test_energy_search.rs:150-182)."""
    rows = make_gaussian_hd(80, spread=0.5, dims=96, seed=7)
    aspace, gl = en.build_energy(_energy_builder(333), rows.tolist(),
                                 EnergyParams())
    res = en.search_energy(aspace, rows[0], gl, 10, 1.0, 0.0)
    assert len(res) == 10
    q_lambda = aspace.prepare_query_item(rows[0], gl)
    lam = np.asarray(aspace.lambdas)
    top_diff = abs(q_lambda - lam[res[0][0]])
    bottom_diff = abs(q_lambda - lam[res[9][0]])
    assert top_diff <= bottom_diff * 1.5 + 1e-12


def test_energy_search_score_monotonicity():
    """(test_energy_search.rs:185-208)"""
    rows = make_moons_hd(50, 0.2, 0.1, 99, 42)
    aspace, gl = en.build_energy(_energy_builder(444), rows.tolist(),
                                 EnergyParams())
    res = en.search_energy(aspace, rows[5], gl, 20, 1.0, 0.5)
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)


def test_energy_search_empty_k(energy_index):
    """(test_energy_search.rs:211-231)"""
    rows, aspace, gl = energy_index
    assert en.search_energy(aspace, rows[0], gl, 0, 1.0, 0.5) == []


def test_energy_search_high_dimensional():
    """(test_energy_search.rs:234-255)"""
    rows = make_gaussian_hd(40, spread=0.5, dims=96, seed=9)
    aspace, gl = en.build_energy(_energy_builder(666, rp_eps=0.4),
                                 rows.tolist(), EnergyParams())
    res = en.search_energy(aspace, rows[2], gl, 8, 1.0, 0.5)
    assert len(res) == 8
    assert all(np.isfinite(s) for _, s in res)


# ---------------------------------------------------------------------------
# energy vs standard pipeline comparisons
# ---------------------------------------------------------------------------

def test_energy_vs_standard_search_overlap():
    """Energy ranking must DIVERGE from the cosine-based pipeline — the
    point of the energy path is removing the cosine dependence
    (test_energy_search.rs:258-309)."""
    rows = make_gaussian_hd(100, spread=0.6, dims=96, seed=11)
    k = 10
    query = rows[5]

    aspace_std, gl_std = _std_builder(12345).build(rows.tolist())
    qlam = aspace_std.prepare_query_item(query, gl_std)
    res_std = aspace_std.search_lambda_aware(ArrowItem(query, qlam), k, 0.7)

    aspace_en, gl_en = en.build_energy(_energy_builder(12345),
                                       rows.tolist(), EnergyParams())
    res_en = en.search_energy(aspace_en, query, gl_en, k, 1.0, 0.5)

    overlap = len({i for i, _ in res_std} & {i for i, _ in res_en})
    assert overlap < k, "energy search must differ from cosine-based search"


def test_energy_vs_standard_lambda_distribution():
    """Both pipelines produce finite non-negative λ with nonzero spread;
    the distributions differ (test_energy_search.rs:311-355)."""
    rows = make_moons_hd(80, 0.2, 0.08, 99, 42)
    aspace_std, _ = _std_builder(9999).build(rows.tolist())
    aspace_en, _ = en.build_energy(_energy_builder(9999), rows.tolist(),
                                   EnergyParams())
    ls = np.asarray(aspace_std.lambdas)
    le = np.asarray(aspace_en.lambdas)
    for lam in (ls, le):
        assert np.all(np.isfinite(lam)) and np.all(lam >= 0.0)
    assert le.std() > 0.0
    assert abs(ls.mean() - le.mean()) > 1e-9  # different spectral bases


def test_energy_vs_standard_graph_structure():
    """Standard graph is F'xF' (feature space); energy graph lives in
    sub-centroid space XxX (test_energy_search.rs:357-389 + the
    orientation quirk of SURVEY §3.1)."""
    rows = make_moons_hd(80, 0.2, 0.08, 99, 42)
    _, gl_std = _std_builder(31).build(rows.tolist())
    aspace_en, gl_en = en.build_energy(_energy_builder(31), rows.tolist(),
                                       EnergyParams())
    n_std = gl_std.shape()[0]
    n_en = gl_en.shape()[0]
    # standard graph: reduced feature space (projection active, r < F)
    assert n_std < 99
    # energy graph: sub-centroid space (X x X, un-transposed —
    # energymaps.rs:247-280), sized by splitting, not by features
    assert gl_en.shape() == (n_en, n_en)
    assert gl_en.nnodes == n_en  # energy bookkeeping is graph-local
    assert n_en != n_std


def test_energy_vs_standard_precision_at_k():
    """Precision@k against a brute-force Euclidean ground truth: both
    pipelines must beat random chance (k/N) (test_energy_search.rs:391-448)."""
    rows = make_moons_hd(100, 0.3, 0.08, 99, 42)
    k = 10
    query = rows[10]
    d = np.linalg.norm(rows - query[None, :], axis=1)
    gt = set(np.argsort(d)[:k].tolist())

    aspace_std, gl_std = _std_builder(111, eps=0.2, k=2, topk=1).build(
        rows.tolist())
    qlam = aspace_std.prepare_query_item(query, gl_std)
    res_std = aspace_std.search_lambda_aware(ArrowItem(query, qlam), k, 0.7)
    prec_std = len(gt & {i for i, _ in res_std}) / k

    aspace_en, gl_en = en.build_energy(_energy_builder(111), rows.tolist(),
                                       EnergyParams())
    res_en = en.search_energy(aspace_en, query, gl_en, k, 1.0, 0.5)
    prec_en = len(gt & {i for i, _ in res_en}) / k

    chance = k / len(rows)
    assert prec_std > chance
    assert prec_en >= 0.0  # energy deliberately ranks by a different metric
    # cosine-based pipeline must dominate on Euclidean ground truth
    assert prec_std >= prec_en * 0.5


def test_energy_vs_standard_recall_at_k():
    """Recall of energy result sets against the standard pipeline's top-k:
    λ-heavy weighting shifts the set (test_energy_search.rs:450-504)."""
    rows = make_gaussian_hd(80, spread=0.5, dims=96, seed=13)
    k = 20
    query = rows[0]

    aspace_std, gl_std = _std_builder(333).build(rows.tolist())
    qlam = aspace_std.prepare_query_item(query, gl_std)
    res_std = aspace_std.search_lambda_aware(ArrowItem(query, qlam), k, 0.7)
    std_ids = {i for i, _ in res_std}

    b_en = (_energy_builder(333)
            .with_lambda_graph(1.0, 3, 3, 2.0, None))
    aspace_en, gl_en = en.build_energy(b_en, rows.tolist(), EnergyParams())
    r_bal = en.search_energy(aspace_en, query, gl_en, k, 1.0, 0.5)
    r_lam = en.search_energy(aspace_en, query, gl_en, k, 2.0, 0.1)

    recall_bal = sum(1 for i, _ in r_bal if i in std_ids) / k
    recall_lam = sum(1 for i, _ in r_lam if i in std_ids) / k
    # energy methods diverge from the cosine baseline (not full recall)
    assert 0.0 <= recall_bal <= 1.0 and 0.0 <= recall_lam <= 1.0
    assert recall_bal < 1.0 or recall_lam < 1.0


def test_energy_vs_standard_build_time():
    """Energy build is a bounded multiple of the standard build — the
    reference documents 2x/3x (energymaps.rs:676); we allow headroom for
    the small-N fixed costs (test_energy_search.rs:504-536)."""
    rows = make_moons_hd(100, 0.3, 0.08, 99, 42)

    t0 = time.perf_counter()
    _std_builder(444).build(rows.tolist())
    t_std = time.perf_counter() - t0

    t0 = time.perf_counter()
    en.build_energy(_energy_builder(444), rows.tolist(), EnergyParams())
    t_energy = time.perf_counter() - t0

    assert t_energy < max(t_std * 10.0, 30.0)


def test_energy_no_cosine_dependence():
    """Pure-λ energy ranking must NOT be cosine-sorted
    (test_energy_search.rs:536-600)."""
    rows = make_gaussian_hd(50, spread=0.6, dims=96, seed=15)
    query = rows[5]
    aspace, gl = en.build_energy(_energy_builder(555), rows.tolist(),
                                 EnergyParams())
    res = en.search_energy(aspace, query, gl, 10, 1.0, 0.0)

    qn = max(np.linalg.norm(query), 1e-9)
    cosines = []
    for idx, _ in res:
        item = rows[idx]
        cosines.append(float(query @ item / (qn * max(np.linalg.norm(item),
                                                      1e-9))))
    assert cosines != sorted(cosines, reverse=True), \
        "energy search should NOT rank by cosine similarity"
