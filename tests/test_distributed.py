"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arrowspace_tpu.graph import GraphParams
from arrowspace_tpu.parallel import (distributed_index_step,
                                     distributed_lambda_aware_topk,
                                     make_mesh,
                                     sharded_compute_taumode_lambdas)
from arrowspace_tpu.ops.search import batched_lambda_aware_topk
from arrowspace_tpu.taumode import TauMode, compute_taumode_lambdas
from helpers import oracle_adjacency, oracle_laplacian
from data import make_moons_hd


@pytest.fixture(scope="module")
def mesh(request):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _setup(n=128, f=16, seed=0):
    rows = make_moons_hd(n, noise=0.08, hd_noise=0.05, dims=f, seed=seed)
    adj = oracle_adjacency(rows[:12], eps=1.0, topk=4, p=2.0, sigma=None)
    lap = oracle_laplacian(adj)[:f, :f] if adj.shape[0] >= f else None
    # build a graph over features instead (canonical shape): use transpose
    adjf = oracle_adjacency(rows.T[:, :32], eps=1.0, topk=4, p=2.0,
                            sigma=None)
    lapf = oracle_laplacian(adjf)
    return jnp.asarray(rows), jnp.asarray(lapf)


def test_sharded_lambdas_match_single_device(mesh):
    items, lap = _setup()
    single = compute_taumode_lambdas(items, lap, TauMode.median())
    sharded = sharded_compute_taumode_lambdas(items, lap, TauMode.median(),
                                              mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-12)
    # result is actually sharded over the mesh
    assert len(sharded.sharding.device_set) == 8


def test_distributed_topk_matches_single_device(mesh):
    items, lap = _setup(n=256)
    lambdas = compute_taumode_lambdas(items, lap, TauMode.median())
    queries = items[:4] * 1.01
    q_lam = compute_taumode_lambdas(queries, lap, TauMode.median())
    alpha = jnp.asarray(0.8, dtype=items.dtype)

    s_single, i_single = batched_lambda_aware_topk(
        queries, q_lam, items, lambdas, alpha, k=10)
    s_dist, i_dist = distributed_lambda_aware_topk(
        queries, q_lam, items, lambdas, 0.8, 10, mesh)

    np.testing.assert_allclose(np.asarray(s_dist), np.asarray(s_single),
                               rtol=1e-12)
    # indices may differ only on exact ties; verify score-set equality and
    # index agreement away from ties
    np.testing.assert_array_equal(np.asarray(i_dist), np.asarray(i_single))


def test_distributed_search_session_matches_single(mesh):
    """The pipelined multi-chip serving session must return exactly what
    the single-program query path returns (λ prep + scoring + merged
    top-k fused into one sharded dispatch), including partial batches."""
    from arrowspace_tpu.parallel import DistributedSearchSession

    items, lap = _setup(n=256)
    lambdas = compute_taumode_lambdas(items, lap, TauMode.median())

    sess = DistributedSearchSession(items, lambdas, lap, mesh,
                                    batch_size=8, k=10, alpha=0.8,
                                    taumode=TauMode.median(), depth=2)
    sess.warmup()

    rng = np.random.default_rng(11)
    batches = [np.asarray(items[rng.integers(0, 256, 8)]) * 1.01
               for _ in range(5)] + [np.asarray(items[:3]) * 1.02]
    got = list(sess.search_stream(batches))
    assert len(got) == 6
    assert got[-1][1].shape == (3, 10)

    for qb, (s, i) in zip(batches, got):
        q = jnp.asarray(qb)
        qlam = compute_taumode_lambdas(q, lap, TauMode.median())
        s_ref, i_ref = batched_lambda_aware_topk(
            q, qlam, items, lambdas, jnp.asarray(0.8, items.dtype), k=10)
        np.testing.assert_array_equal(i, np.asarray(i_ref))
        np.testing.assert_allclose(s, np.asarray(s_ref), rtol=1e-12)


def test_distributed_session_projected_index(mesh):
    """from_index over a dims-reduced index: the projected query prepares
    λ against the r x r graph while the raw query scores raw items —
    results must match the one-shot ArrowIndex.search exactly (both
    paths share the same f64 CPU backend here)."""
    from arrowspace_tpu.index import ArrowIndex
    from arrowspace_tpu.parallel import DistributedSearchSession

    rng = np.random.default_rng(17)
    centers = rng.uniform(0.2, 0.8, (6, 96))
    rows = centers[rng.integers(0, 6, 512)] + rng.normal(0, 0.05,
                                                         (512, 96))
    idx = ArrowIndex.build(rows, eps=1.0, k=5, topk=3, seed=9,
                           sampling=None, dims_reduction=True, rp_eps=0.9)
    assert idx.aspace.projection_matrix is not None

    sess = DistributedSearchSession.from_index(idx, mesh, batch_size=8,
                                               k=7, alpha=0.85)
    sess.warmup()
    q = rows[:8] * 1.01
    (s, i), = tuple(sess.search_stream([q]))
    s_ref, i_ref = idx.search(q, k=7, alpha=0.85)
    np.testing.assert_array_equal(i, np.asarray(i_ref))
    np.testing.assert_allclose(s, np.asarray(s_ref), rtol=1e-10)

    # an un-projected session over a reduced graph must refuse clearly
    with pytest.raises(ValueError, match="projection"):
        DistributedSearchSession(
            idx.aspace.data, idx.aspace.lambdas,
            jnp.asarray(idx.gl.matrix), mesh, batch_size=8, k=7)


def test_distributed_session_tall_graph_index(mesh):
    """from_index over an allow_tall_graphs energy index (graph nodes >
    F): query-λ preparation must pad instead of raising the n>F error,
    matching the single-chip session (regression: pad_tall was not
    threaded through the mesh session)."""
    from arrowspace_tpu import energymaps as en
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.energymaps import EnergyParams
    from arrowspace_tpu.index import ArrowIndex
    from arrowspace_tpu.parallel import DistributedSearchSession

    rng = np.random.default_rng(0)
    centers = rng.uniform(0, 1, (40, 16))
    rows = centers[rng.integers(0, 40, 800)] + rng.normal(0, 0.02,
                                                          (800, 16))
    b = (ArrowSpaceBuilder().with_seed(7).with_dims_reduction(True, 0.3)
         .with_inline_sampling(None))
    aspace, gl = en.build_energy(
        b, rows.tolist(),
        EnergyParams(split_quantile=0.2, allow_tall_graphs=True))
    assert gl.shape()[0] > aspace.nfeatures
    idx = ArrowIndex(aspace, gl, b)

    sess = DistributedSearchSession.from_index(idx, mesh, batch_size=4,
                                               k=5, alpha=0.9)
    sess.warmup()
    (s, i), = tuple(sess.search_stream([rows[:4] * 1.01]))
    s_ref, i_ref = idx.search(rows[:4] * 1.01, k=5, alpha=0.9)
    np.testing.assert_array_equal(i, np.asarray(i_ref))


def test_distributed_index_step_runs(mesh):
    """The full device-side step compiles and executes over the mesh."""
    items, _ = _setup(n=128, f=16)
    centroids = items[:10]
    queries = items[:2] * 1.02
    params = GraphParams(eps=1.0, k=5, topk=3, p=2.0, sigma=None,
                         normalise=False, sparsity_check=False)
    lambdas, scores, idx = distributed_index_step(
        items, centroids, queries, TauMode.median(), params, 5, mesh)
    assert lambdas.shape == (128,)
    assert scores.shape == (2, 5)
    assert idx.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_distributed_pruned_matches_oracle(mesh):
    """Mesh-sharded cell screen: unflagged rows equal the full-scan
    oracle (same lowest-global-id ties); flags reduce any-shard OR."""
    from arrowspace_tpu.parallel import distributed_pruned_topk
    from arrowspace_tpu.pruned import build_cells

    rng = np.random.default_rng(11)
    cents = rng.uniform(0.2, 0.8, (8, 24))
    rows = cents[rng.integers(0, 8, 768)] \
        + rng.normal(0, 0.03, (768, 24))
    lam = rng.uniform(0, 1, 768)
    cells = build_cells(rows, lam, cap=16, seed=3, iters=4)
    assert cells.cent.shape[0] % 8 == 0   # unit axis shards evenly
    qi = rng.integers(0, 768, 12)
    q, ql = rows[qi] * 1.02, lam[qi]
    so, io = batched_lambda_aware_topk(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(rows),
        jnp.asarray(lam), jnp.asarray(0.9), k=10)
    s, i, fl = distributed_pruned_topk(
        jnp.asarray(q), jnp.asarray(ql), cells, 0.9, 10, mesh,
        m_cells=4)
    s, i, fl = np.asarray(s), np.asarray(i), np.asarray(fl)
    certified = 0
    for b in range(12):
        if not fl[b]:
            certified += 1
            np.testing.assert_array_equal(i[b], np.asarray(io)[b])
            np.testing.assert_allclose(s[b], np.asarray(so)[b],
                                       rtol=1e-12)
    # per-shard m=4 scans 32 cells total on clustered data: most of a
    # clustered batch must certify or the mesh screen is useless
    assert certified >= 8, (certified, fl)


def test_distributed_pruned_duplicate_cross_shard_tie(mesh):
    """Exact duplicates placed in DIFFERENT shards must resolve to the
    lowest global id after the mesh merge (the two-key sort upgrade
    over a plain top_k merge)."""
    from arrowspace_tpu.parallel import distributed_pruned_topk
    from arrowspace_tpu.pruned import build_cells

    rng = np.random.default_rng(13)
    rows = _clustered_rows(rng, n=512, f=16, centers=6)
    rows[400] = rows[7]
    lam = rng.uniform(0, 1, 512)
    lam[400] = lam[7]
    cells = build_cells(rows, lam, cap=8, seed=5, iters=4)
    u = cells.cent.shape[0]
    q, ql = rows[7:8] * 1.01, lam[7:8]
    # scan everything: exact, no flags, ties by global id
    s, i, fl = distributed_pruned_topk(
        jnp.asarray(q), jnp.asarray(ql), cells, 0.9, 6, mesh,
        m_cells=u // 8)
    i = np.asarray(i)
    assert not np.asarray(fl)[0]
    assert 7 in i[0] and 400 in i[0]
    assert list(i[0]).index(7) < list(i[0]).index(400)


def _clustered_rows(rng, n, f, centers):
    c = rng.uniform(0.2, 0.8, (centers, f))
    return c[rng.integers(0, centers, n)] + rng.normal(0, 0.03, (n, f))


def test_uneven_shard_raises(mesh):
    items, lap = _setup(n=130)
    lambdas = compute_taumode_lambdas(items, lap, TauMode.median())
    with pytest.raises(AssertionError, match="padded"):
        distributed_lambda_aware_topk(items[:2], lambdas[:2], items,
                                      lambdas, 0.8, 5, mesh)


def test_hierarchical_2d_topk_matches_single_device():
    """(dcn=2, ici=4) mesh: hierarchical merge must equal the flat top-k."""
    from arrowspace_tpu.parallel import (distributed_lambda_aware_topk_2d,
                                         make_mesh_2d)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh2d = make_mesh_2d(2, 4)
    items, lap = _setup(n=256)
    lambdas = compute_taumode_lambdas(items, lap, TauMode.median())
    queries = items[:4] * 1.01
    q_lam = compute_taumode_lambdas(queries, lap, TauMode.median())

    s_single, i_single = batched_lambda_aware_topk(
        queries, q_lam, items, lambdas,
        jnp.asarray(0.8, items.dtype), k=10)
    s_2d, i_2d = distributed_lambda_aware_topk_2d(
        queries, q_lam, items, lambdas, 0.8, 10, mesh2d)

    np.testing.assert_allclose(np.asarray(s_2d), np.asarray(s_single),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(i_2d), np.asarray(i_single))


def test_distributed_topk_pallas_per_shard(mesh):
    """Pallas streaming top-k inside shard_map (interpret mode on CPU)."""
    items, lap = _setup(n=256)
    items = items.astype(jnp.float32)
    lambdas = compute_taumode_lambdas(items, lap.astype(jnp.float32),
                                      TauMode.median())
    queries = items[:4] * 1.01
    q_lam = compute_taumode_lambdas(queries, lap.astype(jnp.float32),
                                    TauMode.median())
    s_ref, i_ref = distributed_lambda_aware_topk(
        queries, q_lam, items, lambdas, 0.8, 10, mesh)
    s_pal, i_pal = distributed_lambda_aware_topk(
        queries, q_lam, items, lambdas, 0.8, 10, mesh, use_pallas=True)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_sharded_fused_taulambda_matches_single_device(mesh):
    """Fused tau+lambda pallas kernel inside shard_map (interpret on CPU)."""
    items, lap = _setup()
    items32 = items.astype(jnp.float32)
    lap32 = lap.astype(jnp.float32)
    single = compute_taumode_lambdas(items32, lap32, TauMode.median())
    sharded = sharded_compute_taumode_lambdas(
        items32, lap32, TauMode.median(), mesh, use_pallas=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-5, atol=1e-7)


def test_streamed_matches_in_memory():
    """Out-of-core streaming (chunked) must equal the in-memory paths."""
    from arrowspace_tpu.ops.streaming import (streamed_lambda_topk,
                                              streamed_taumode_lambdas)
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk
    rng = np.random.default_rng(5)
    n, f = 1000, 16
    items = rng.uniform(0.1, 1.0, (n, f)).astype(np.float32)
    graph_rows = rng.uniform(0.1, 1.0, (f, 8))
    from helpers import oracle_adjacency, oracle_laplacian
    lap = oracle_laplacian(oracle_adjacency(graph_rows, eps=1.0, topk=4,
                                            p=2.0, sigma=None))

    lam_stream = streamed_taumode_lambdas(items, lap, TauMode.median(),
                                          chunk=256)
    lam_ref = np.asarray(compute_taumode_lambdas(
        jnp.asarray(items), jnp.asarray(lap, dtype=jnp.float32),
        TauMode.median()))
    np.testing.assert_allclose(lam_stream, lam_ref, rtol=1e-5)

    q = items[:4] * 1.01
    qlam = lam_ref[:4]
    s_stream, i_stream = streamed_lambda_topk(q, qlam, items, lam_ref,
                                              0.9, 10, chunk=256)
    s_ref, i_ref = batched_lambda_aware_topk(
        jnp.asarray(q), jnp.asarray(qlam), jnp.asarray(items),
        jnp.asarray(lam_ref), jnp.float32(0.9), k=10)
    np.testing.assert_allclose(s_stream, np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_array_equal(i_stream, np.asarray(i_ref))


def test_sharded_clustering_invariants(mesh):
    """Mesh-sharded incremental clustering: device distance tiles, host
    rules.  Invariants of the incremental scan must hold, and the result
    must land within the single-chip chunked mode's cluster-count scale."""
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.parallel import sharded_incremental_clustering
    from arrowspace_tpu.sampling import SamplerType
    from arrowspace_tpu.clustering import _incremental_clustering_chunked

    rng = np.random.default_rng(29)
    centers = rng.uniform(0, 1, (6, 16))
    rows = centers[rng.integers(0, 6, 8192)] + rng.normal(0, 0.04,
                                                          (8192, 16))
    items = jax.device_put(jnp.asarray(rows),
                           jax.sharding.NamedSharding(
                               mesh, jax.sharding.PartitionSpec("items",
                                                                None)))

    b = ArrowSpaceBuilder()
    b.sampling = SamplerType.simple(0.6)
    s = SamplerType.simple(0.6).make(seed=5)
    cents, assigns, sizes = sharded_incremental_clustering(
        items, b, 16, 0.3, s, mesh, rounds_chunk=512)

    assert 1 <= cents.shape[0] <= 16
    assert len(assigns) == 8192
    assert sum(sizes) == sum(1 for a in assigns if a is not None)
    for a in assigns:
        assert a is None or 0 <= a < cents.shape[0]

    b2 = ArrowSpaceBuilder()
    b2.sampling = SamplerType.simple(0.6)
    s2 = SamplerType.simple(0.6).make(seed=5)
    c_chunk, _, _ = _incremental_clustering_chunked(
        b2, rows, 16, 16, 0.3, s2, chunk=512)
    assert abs(cents.shape[0] - c_chunk.shape[0]) <= 6


def test_distributed_build_step_end_to_end(mesh):
    """Sharded build -> query: clustering over the mesh feeds the
    replicated graph build, sharded λτ, and the distributed top-k — the
    full multi-chip path (SURVEY §2 TPU-mapping, build-tile sharding)."""
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.parallel import distributed_build_step

    rng = np.random.default_rng(31)
    centers = rng.uniform(0.2, 0.8, (5, 16))
    rows = centers[rng.integers(0, 5, 4096)] + rng.normal(0, 0.04,
                                                          (4096, 16))
    items = jnp.asarray(rows)
    queries = items[:4] * 1.01
    params = GraphParams(eps=1.0, k=5, topk=3, p=2.0, sigma=None,
                         normalise=False, sparsity_check=False)
    b = ArrowSpaceBuilder()
    b.sampling = None

    centroids, lambdas, scores, idx = distributed_build_step(
        items, b, queries, TauMode.median(), params, 5, mesh,
        max_clusters=12, radius=0.3)
    assert lambdas.shape == (4096,)
    assert scores.shape == (4, 5)
    # each query's own source item ranks first (clustered data)
    for qi in range(4):
        assert int(idx[qi][0]) == qi
    assert np.all(np.isfinite(np.asarray(lambdas)))


def test_sharded_clustering_tail_round(mesh):
    """shard_n not divisible by the round chunk: the clamped device
    window's results must align with the host rows (regression: the tail
    round silently paired rows with other rows' distances)."""
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.parallel import sharded_incremental_clustering
    from arrowspace_tpu.sampling import SamplerType

    rng = np.random.default_rng(61)
    centers = rng.uniform(0, 1, (6, 16))
    rows = centers[rng.integers(0, 6, 8192)] + rng.normal(0, 0.03,
                                                          (8192, 16))
    items = jax.device_put(jnp.asarray(rows),
                           jax.sharding.NamedSharding(
                               mesh, jax.sharding.PartitionSpec("items",
                                                                None)))
    b = ArrowSpaceBuilder()
    b.sampling = None
    s = SamplerType.simple(1.0).make(seed=1)
    # shard_n = 1024, chunk = 300 -> rounds of 300/300/300/124
    cents, assigns, sizes = sharded_incremental_clustering(
        items, b, 16, 0.3, s, mesh, rounds_chunk=300)
    assert len(assigns) == 8192
    assert all(a is not None for a in assigns)  # no sampling: all decided
    assert sum(sizes) == 8192
    # clustered data: every row's assigned centroid is its true nearest
    # within the relaxed radius
    d = np.linalg.norm(rows[:, None, :] - cents[None, :, :], axis=2) ** 2
    a = np.asarray(assigns)
    chosen = d[np.arange(8192), a]
    assert np.all(chosen <= 0.3 * 1.5 + 1e-9)


def test_distributed_binned_matches_xla(mesh):
    """Per-shard binned kernel + all_gather merge must match the XLA
    distributed path exactly on collision-free data, with zero flags."""
    from arrowspace_tpu.parallel.distributed import (
        distributed_lambda_aware_topk)

    rng = np.random.default_rng(3)
    n, f, b, k = 8 * 512, 16, 4, 6
    items = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)))
    lambdas = jnp.asarray(rng.uniform(0, 1, n))
    q = jnp.asarray(rng.uniform(0.1, 1.0, (b, f)))
    qlam = jnp.asarray(rng.uniform(0, 1, b))

    s_x, i_x = distributed_lambda_aware_topk(
        q, qlam, items, lambdas, 0.8, k, mesh, kernel="xla")
    s_b, i_b, fl = distributed_lambda_aware_topk(
        q, qlam, items, lambdas, 0.8, k, mesh, kernel="binned", tile=256)
    assert np.asarray(fl).sum() == 0
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_x),
                               rtol=1e-6)


def test_distributed_binned_flags_shard_collision(mesh):
    """>depth same-bin duplicates inside ONE shard must surface in the
    merged flags (pmax across shards)."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_topk_depth_for
    from arrowspace_tpu.parallel.distributed import (
        distributed_lambda_aware_topk)

    rng = np.random.default_rng(5)
    tile, shard_n, f, k = 256, 2048, 16, 6
    n = 8 * shard_n
    items = np.asarray(rng.uniform(0.1, 1.0, (n, f)))
    q = np.asarray(rng.uniform(0.1, 1.0, (2, f)))
    depth = binned_topk_depth_for(k)
    # same bin (lane 37) of shard 3, > depth copies of query 0
    base = 3 * shard_n
    for j in range(depth + 2):
        items[base + j * tile + 37] = q[0]
    lambdas = jnp.asarray(np.full(n, 0.5))
    qlam = jnp.asarray([0.5, 0.5])

    s, i, fl = distributed_lambda_aware_topk(
        jnp.asarray(q), qlam, jnp.asarray(items), lambdas, 1.0, k, mesh,
        kernel="binned", tile=tile)
    fl = np.asarray(fl)
    assert fl[0] == 1, "shard collision must flag the query"
    # repair path: the exact distributed result restores all duplicates
    s_x, i_x = distributed_lambda_aware_topk(
        jnp.asarray(q), qlam, jnp.asarray(items), lambdas, 1.0, k, mesh,
        kernel="xla")
    expect = [base + j * tile + 37 for j in range(depth + 2)][:k]
    assert list(np.asarray(i_x)[0][:len(expect)]) == expect


def test_distributed_session_binned_parity_and_repair_wiring(mesh):
    """A binned-kernel mesh session must match the XLA session on
    collision-free data, and the driver must route flagged rows through
    the session's repair callback (wiring pinned by injecting a flag)."""
    from arrowspace_tpu.parallel.distributed import (
        DistributedSearchSession)

    rng = np.random.default_rng(7)
    n, f, b = 8 * 1024, 16, 4
    items = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)))
    lambdas = jnp.asarray(rng.uniform(0, 1, n))
    _, lap = _setup(64, f, seed=2)
    lap = jnp.asarray(np.asarray(lap)[:f, :f])
    batches = [np.asarray(rng.uniform(0.1, 1.0, (b, f)))
               for _ in range(3)]

    ref = DistributedSearchSession(items, lambdas, lap, mesh, b, k=5,
                                   kernel="xla")
    bn = DistributedSearchSession(items, lambdas, lap, mesh, b, k=5,
                                  kernel="binned")
    assert bn._repair is not None
    for (s_r, i_r), (s_b, i_b) in zip(ref.search_stream(batches),
                                      bn.search_stream(batches)):
        np.testing.assert_array_equal(i_b, i_r)
        np.testing.assert_allclose(s_b, s_r, rtol=1e-6)

    # flag-injection: wrap the step to mark row 0 flagged; the driver
    # must call repair (the injected row has NO fired det bin, so the
    # strided repair's pure current-top-k rescore path runs), whose
    # exact result equals the XLA row
    orig_step = bn._step

    def step_with_flag(q):
        s, ii, qlam, det = orig_step(q)
        ii = jnp.asarray(np.asarray(ii))
        ii = ii.at[0, -1].set(1)
        return s, ii, qlam, det

    bn._step = step_with_flag
    out = list(bn.search_stream(batches[:1]))
    (s_out, i_out), = out
    s_ref, i_ref = next(iter(ref.search_stream(batches[:1])))
    np.testing.assert_array_equal(i_out, i_ref)


@pytest.mark.parametrize("alpha", [1.0, 0.8])
def test_distributed_session_strided_repair_restores_exactness(mesh,
                                                               alpha):
    """A >depth same-bin duplicate storm inside ONE shard must flag, and
    the session's STRIDED repair (fired (shard, bin) slice + current
    top-k rescored against the sharded corpus) must restore the exact
    XLA-session result end-to-end through the stream driver.  alpha<1
    exercises the λ term of the repair score in the f64 oracle config
    (λ/alpha must not be truncated to f32 on the way in)."""
    from arrowspace_tpu.ops.pallas_bintopk import (binned_topk_depth_for,
                                                   binned_layout)
    from arrowspace_tpu.parallel.distributed import (
        DistributedSearchSession)

    rng = np.random.default_rng(11)
    shard_n, f, b, k = 8192, 16, 4, 6
    n = 8 * shard_n
    depth = binned_topk_depth_for(k)
    items = np.asarray(rng.uniform(0.1, 1.0, (n, f)))
    q0 = np.asarray(rng.uniform(0.1, 1.0, (b, f)))
    # the session resolves the kernel layout per shard — place >depth
    # copies of query 0 in ONE local bin of shard 3
    _, tile, lane_split, _, _ = binned_layout(b, shard_n, f, k)
    bins = tile // lane_split
    base = 3 * shard_n
    dup_rows = [base + 5 + j * bins for j in range(depth + 2)
                if 5 + j * bins < shard_n]
    assert len(dup_rows) > depth, (dup_rows, bins, shard_n)
    for g in dup_rows:
        items[g] = q0[0]
    lambdas = jnp.asarray(np.full(n, 0.5))
    _, lap = _setup(64, f, seed=3)
    lap = jnp.asarray(np.asarray(lap)[:f, :f])

    ref = DistributedSearchSession(jnp.asarray(items), lambdas, lap,
                                   mesh, b, k=k, alpha=alpha,
                                   kernel="xla")
    bn = DistributedSearchSession(jnp.asarray(items), lambdas, lap,
                                  mesh, b, k=k, alpha=alpha,
                                  kernel="binned")
    repair_calls = []
    inner = bn._repair

    def spy(q_block, qlam, rows, **kw):
        repair_calls.append((rows.copy(), kw.get("det_rows")))
        return inner(q_block, qlam, rows, **kw)

    bn._repair = spy
    (s_b, i_b), = list(bn.search_stream([q0]))
    (s_r, i_r), = list(ref.search_stream([q0]))
    assert repair_calls and 0 in repair_calls[0][0], \
        "the duplicate storm must flag query 0 into the repair path"
    assert repair_calls[0][1] is not None, \
        "the driver must hand the repair the gathered det plane rows"
    np.testing.assert_array_equal(i_b, i_r)
    np.testing.assert_allclose(s_b, s_r, rtol=1e-6)
    # the duplicates all come back, lowest global index first
    assert list(i_r[0][:len(dup_rows)]) == dup_rows


def test_distributed_session_prepared_corpus_matches_raw(mesh):
    """The per-shard prepared corpus (normalise + bucket-pad hoisted to
    session construction, the multi-chip analogue of
    prepare_binned_corpus) must be bitwise-identical to the raw per-
    dispatch path."""
    from arrowspace_tpu.parallel.distributed import (
        DistributedSearchSession)

    rng = np.random.default_rng(13)
    n, f, b = 8 * 1024, 16, 4
    items = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)))
    lambdas = jnp.asarray(rng.uniform(0, 1, n))
    _, lap = _setup(64, f, seed=5)
    lap = jnp.asarray(np.asarray(lap)[:f, :f])
    batches = [np.asarray(rng.uniform(0.1, 1.0, (b, f)))
               for _ in range(2)]

    prep = DistributedSearchSession(items, lambdas, lap, mesh, b, k=5,
                                    kernel="binned")
    raw = DistributedSearchSession(items, lambdas, lap, mesh, b, k=5,
                                   kernel="binned", prepare_corpus=False)
    for (s_p, i_p), (s_r, i_r) in zip(prep.search_stream(batches),
                                      raw.search_stream(batches)):
        np.testing.assert_array_equal(i_p, i_r)
        np.testing.assert_array_equal(s_p, s_r)


# ---------------------------------------------------------------------------
# DistributedEnergySearchSession — the mesh ENERGY serving session
# (energymaps.rs:368-407 semantics over the sharded z-plane)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def energy_index_800():
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.energymaps import EnergyParams, build_energy
    from arrowspace_tpu.index import ArrowIndex
    rng = np.random.default_rng(5)
    centers = rng.uniform(0, 1, (40, 16))
    rows = centers[rng.integers(0, 40, 800)] + rng.normal(0, 0.02,
                                                          (800, 16))
    b = (ArrowSpaceBuilder().with_seed(7).with_dims_reduction(True, 0.3)
         .with_inline_sampling(None))
    aspace, gl = build_energy(
        b, rows.tolist(),
        EnergyParams(split_quantile=0.2, allow_tall_graphs=True))
    return ArrowIndex(aspace, gl, b), rows


def test_distributed_energy_session_matches_single(mesh, energy_index_800):
    """from_index over a built energy index: the mesh session (per-shard
    z-plane + all_gather merge) must reproduce the one-shot
    search_energy API exactly on CPU/f64, incl. a partial tail batch."""
    from arrowspace_tpu.parallel import DistributedEnergySearchSession

    idx, rows = energy_index_800
    assert idx.nitems % 8 == 0, idx.nitems
    sess = DistributedEnergySearchSession.from_index(
        idx, mesh, batch_size=8, k=5, w_lambda=1.0, w_dirichlet=0.5)
    sess.warmup()
    batches = [rows[:8] * 1.01, rows[8:11] * 1.01]  # tail of 3
    got = list(sess.search_stream(batches))
    assert got[0][1].shape == (8, 5) and got[1][1].shape == (3, 5)
    for qb, (s, i) in zip(batches, got):
        s_ref, i_ref = idx.search_energy(qb, k=5, w_lambda=1.0,
                                         w_dirichlet=0.5)
        np.testing.assert_array_equal(i, np.asarray(i_ref))
        np.testing.assert_allclose(s, np.asarray(s_ref), rtol=1e-9)


def test_distributed_energy_weight_sweep(mesh, energy_index_800):
    """Weights ride as closure constants per session; each pair matches
    the one-shot API (mirrors the single-chip weight-sweep test)."""
    from arrowspace_tpu.parallel import DistributedEnergySearchSession

    idx, rows = energy_index_800
    queries = rows[5:9] * 1.02
    for wl, wd in ((0.3, 1.7), (0.0, 1.0)):
        sess = DistributedEnergySearchSession.from_index(
            idx, mesh, batch_size=4, k=5, w_lambda=wl, w_dirichlet=wd)
        (s, i), = list(sess.search_stream([queries]))
        s_ref, i_ref = idx.search_energy(queries, k=5, w_lambda=wl,
                                         w_dirichlet=wd)
        np.testing.assert_array_equal(i, np.asarray(i_ref))
        np.testing.assert_allclose(s, np.asarray(s_ref), rtol=1e-9)


def test_distributed_energy_binned_matches_chunked(mesh):
    """The per-shard BINNED energy kernel session equals the exact
    chunked-scorer session on storm-free data (end to end through the
    stream driver)."""
    from arrowspace_tpu.parallel import DistributedEnergySearchSession
    from arrowspace_tpu.taumode import TauMode

    rng = np.random.default_rng(23)
    n, f, b, k = 8 * 1024, 16, 4, 5
    items = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)))
    lambdas = jnp.asarray(rng.uniform(0, 1, n))
    _, lap = _setup(64, f, seed=5)
    lap = jnp.asarray(np.asarray(lap)[:f, :f])
    batches = [np.asarray(rng.uniform(0.1, 1.0, (b, f)))
               for _ in range(2)]

    ref = DistributedEnergySearchSession(items, lambdas, lap, mesh, b,
                                         k=k, kernel="chunked",
                                         taumode=TauMode.median())
    bn = DistributedEnergySearchSession(items, lambdas, lap, mesh, b,
                                        k=k, kernel="binned",
                                        taumode=TauMode.median())
    assert bn._repair is not None and ref._repair is None
    for (s_b, i_b), (s_r, i_r) in zip(bn.search_stream(batches),
                                      ref.search_stream(batches)):
        np.testing.assert_array_equal(i_b, i_r)
        np.testing.assert_allclose(s_b, s_r, rtol=1e-5)


def test_distributed_energy_prepared_corpus_matches_raw(mesh):
    """The per-shard prepared z corpus (pad + ||z||² hoisted to
    construction) must be bitwise-identical to the raw path."""
    from arrowspace_tpu.parallel import DistributedEnergySearchSession
    from arrowspace_tpu.taumode import TauMode

    rng = np.random.default_rng(29)
    n, f, b = 8 * 1024, 16, 4
    items = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)))
    lambdas = jnp.asarray(rng.uniform(0, 1, n))
    _, lap = _setup(64, f, seed=5)
    lap = jnp.asarray(np.asarray(lap)[:f, :f])
    batches = [np.asarray(rng.uniform(0.1, 1.0, (b, f)))
               for _ in range(2)]

    prep = DistributedEnergySearchSession(items, lambdas, lap, mesh, b,
                                          k=5, kernel="binned",
                                          taumode=TauMode.median())
    raw = DistributedEnergySearchSession(items, lambdas, lap, mesh, b,
                                         k=5, kernel="binned",
                                         prepare_corpus=False,
                                         taumode=TauMode.median())
    for (s_p, i_p), (s_r, i_r) in zip(prep.search_stream(batches),
                                      raw.search_stream(batches)):
        np.testing.assert_array_equal(i_p, i_r)
        np.testing.assert_array_equal(s_p, s_r)


def test_distributed_energy_strided_repair_restores_exactness(mesh):
    """A >depth duplicate storm inside ONE shard's bin must flag, and the
    mesh strided ENERGY repair (fired (shard, local-bin) slices rescored
    against the sharded z corpus) must restore the exact chunked-session
    result end-to-end through the stream driver."""
    from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_layout,
                                                   binned_topk_depth_for)
    from arrowspace_tpu.parallel import DistributedEnergySearchSession
    from arrowspace_tpu.taumode import TauMode

    rng = np.random.default_rng(31)
    shard_n, f, b, k = 8192, 16, 4, 6
    n = 8 * shard_n
    depth = binned_topk_depth_for(k)
    items = np.asarray(rng.uniform(0.1, 1.0, (n, f)))
    q0 = np.asarray(rng.uniform(0.1, 1.0, (b, f)))
    # duplicates of query 0 (z == items here: no projection/signals, so
    # d² = 0 ties them at the top) in ONE local bin of shard 3
    _, tile, lane_split, _, _ = binned_energy_layout(b, shard_n, f, k)
    bins = tile // lane_split
    base = 3 * shard_n
    dup_rows = [base + 5 + j * bins for j in range(depth + 2)
                if 5 + j * bins < shard_n]
    assert len(dup_rows) > depth, (dup_rows, bins, shard_n)
    for g in dup_rows:
        items[g] = q0[0]
    lambdas = jnp.asarray(np.full(n, 0.5))
    _, lap = _setup(64, f, seed=3)
    lap = jnp.asarray(np.asarray(lap)[:f, :f])

    ref = DistributedEnergySearchSession(jnp.asarray(items), lambdas,
                                         lap, mesh, b, k=k,
                                         kernel="chunked",
                                         taumode=TauMode.median())
    bn = DistributedEnergySearchSession(jnp.asarray(items), lambdas,
                                        lap, mesh, b, k=k,
                                        kernel="binned",
                                        taumode=TauMode.median())
    repair_calls = []
    inner = bn._repair

    def spy(q_block, qlam, rows, **kw):
        repair_calls.append((rows.copy(), kw.get("det_rows")))
        return inner(q_block, qlam, rows, **kw)

    bn._repair = spy
    (s_b, i_b), = list(bn.search_stream([q0]))
    (s_r, i_r), = list(ref.search_stream([q0]))
    assert repair_calls and 0 in repair_calls[0][0], \
        "the duplicate storm must flag query 0 into the repair path"
    assert repair_calls[0][1] is not None, \
        "the driver must hand the repair the gathered det plane rows"
    np.testing.assert_array_equal(i_b, i_r)
    np.testing.assert_allclose(s_b, s_r, rtol=1e-6)
    assert list(i_r[0][:len(dup_rows)]) == dup_rows


def test_distributed_energy_session_projected_index(mesh):
    """from_index over a dims-reduced ENERGY index: queries must project
    inside the step (λ prep AND z-plane in reduced space) and match the
    one-shot search_energy exactly — regression for handing the session
    pre-projected items with no query projection."""
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.energymaps import EnergyParams, build_energy
    from arrowspace_tpu.index import ArrowIndex
    from arrowspace_tpu.parallel import DistributedEnergySearchSession

    rng = np.random.default_rng(17)
    centers = rng.uniform(0.2, 0.8, (6, 96))
    rows = centers[rng.integers(0, 6, 512)] + rng.normal(0, 0.05,
                                                         (512, 96))
    b = (ArrowSpaceBuilder().with_seed(9).with_dims_reduction(True, 0.9)
         .with_inline_sampling(None))
    aspace, gl = build_energy(
        b, rows.tolist(),
        EnergyParams(split_quantile=0.2, allow_tall_graphs=True))
    assert aspace.projection_matrix is not None
    idx = ArrowIndex(aspace, gl, b)
    assert idx.nitems % 8 == 0, idx.nitems

    sess = DistributedEnergySearchSession.from_index(idx, mesh,
                                                     batch_size=8, k=7)
    sess.warmup()
    q = rows[:8] * 1.01
    (s, i), = tuple(sess.search_stream([q]))
    s_ref, i_ref = idx.search_energy(q, k=7)
    np.testing.assert_array_equal(i, np.asarray(i_ref))
    np.testing.assert_allclose(s, np.asarray(s_ref), rtol=1e-9)
