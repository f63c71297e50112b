"""Pallas kernel correctness on CPU (interpret mode) — the TPU path is
exercised by bench.py on real hardware."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arrowspace_tpu.ops.pallas_topk import fused_lambda_topk
from arrowspace_tpu.ops.search import batched_lambda_aware_topk


def _data(n, f, b, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0.1, 1.0, (b, f)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32),
            jnp.asarray(rng.uniform(0.1, 1.0, (n, f)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32))


@pytest.mark.parametrize("n,tile", [(1000, 256), (2048, 512), (777, 256)])
def test_fused_topk_matches_xla(n, tile):
    q, qlam, x, xlam = _data(n, 64, 4)
    k = 8
    s1, i1 = fused_lambda_topk(q, qlam, x, xlam, 0.9, k=k, tile=tile,
                               interpret=True)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.9), k=k)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fused_topk_query_chunking():
    # B > 128 triggers the internal VMEM-budget chunking
    q, qlam, x, xlam = _data(512, 32, 130)
    s1, i1 = fused_lambda_topk(q, qlam, x, xlam, 0.7, k=5, tile=256,
                               interpret=True)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.7), k=5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fused_topk_wide_features_many_blocks():
    """Wide feature dim + a batch spanning several 128-blocks with a
    padded tail; every row must match the XLA oracle up to f32
    accumulation-order rounding."""
    q, qlam, x, xlam = _data(600, 1024, 700, seed=3)
    s1, i1 = fused_lambda_topk(q, qlam, x, xlam, 0.8, k=6, tile=256,
                               interpret=True)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.8), k=6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    # at f=1024 the kernel's f32 accumulation order differs from XLA's,
    # so near-duplicate cosines can flip ranks — indices must agree
    # except where the two paths' scores are within f32 rounding
    i1, i2 = np.asarray(i1), np.asarray(i2)
    s1, s2 = np.asarray(s1), np.asarray(s2)
    flips = i1 != i2
    assert flips.mean() < 0.01, f"{flips.sum()} index mismatches"
    np.testing.assert_allclose(s1[flips], s2[flips], atol=2e-5)


def test_fused_topk_k_larger_than_tile_tail():
    # padding rows must never appear in the results
    q, qlam, x, xlam = _data(300, 16, 2)
    s, i = fused_lambda_topk(q, qlam, x, xlam, 1.0, k=20, tile=256,
                             interpret=True)
    assert np.asarray(i).max() < 300


# --- fused lambda batch kernel ----------------------------------------------

def test_fused_lambda_batch_matches_xla():
    from arrowspace_tpu.ops.pallas_lambda import fused_lambda_batch
    from arrowspace_tpu.taumode import (TauMode, select_tau_batch,
                                        synthetic_lambda_batch)
    from helpers import oracle_adjacency, oracle_laplacian

    rng = np.random.default_rng(3)
    n_nodes, f, n_items = 24, 40, 700
    rows = rng.uniform(0.1, 1.0, (n_items, f)).astype(np.float32)
    graph_rows = rng.uniform(0.1, 1.0, (n_nodes, 8))
    lap = oracle_laplacian(
        oracle_adjacency(graph_rows, eps=1.0, topk=4, p=2.0, sigma=None)
    ).astype(np.float32)

    x = jnp.asarray(rows)
    lapj = jnp.asarray(lap)
    taus = select_tau_batch(x, TauMode.median())
    l_pallas = fused_lambda_batch(x, lapj, taus, tile=256, interpret=True)
    l_xla = synthetic_lambda_batch(x, lapj, taus)
    np.testing.assert_allclose(np.asarray(l_pallas), np.asarray(l_xla),
                               rtol=2e-5, atol=1e-7)


def test_fused_lambda_batch_rejects_oversized_graph():
    from arrowspace_tpu.ops.pallas_lambda import fused_lambda_batch
    with pytest.raises(ValueError):
        fused_lambda_batch(jnp.ones((4, 3), jnp.float32),
                           jnp.eye(5, dtype=jnp.float32),
                           jnp.ones((4,), jnp.float32), interpret=True)


# --- fused tau selection kernel ----------------------------------------------

def test_fused_select_tau_matches_scalar_oracle():
    from arrowspace_tpu.ops.pallas_tau import fused_select_tau
    from arrowspace_tpu.taumode import TauMode, select_tau
    rng = np.random.default_rng(11)
    x = rng.normal(0.5, 1.0, (300, 77)).astype(np.float64)
    x[3, 5] = np.nan
    x[7, 0] = np.inf
    x[9] = np.nan  # all-nonfinite row -> TAU_FLOOR
    cases = [("median", 0.5, TauMode.median()),
             ("percentile", 0.3, TauMode.percentile(0.3)),
             ("mean", 0.5, TauMode.mean())]
    for kind, pct, mode in cases:
        out = np.asarray(fused_select_tau(jnp.asarray(x), kind=kind,
                                          pct=pct, tile=256, interpret=True))
        for i in range(x.shape[0]):
            assert out[i] == pytest.approx(select_tau(x[i], mode),
                                           rel=1e-9), (kind, i)


# --- fully-fused tau+lambda kernel -------------------------------------------

def test_fused_taulambda_matches_two_pass():
    from arrowspace_tpu.ops.pallas_taulambda import fused_taulambda_batch
    from arrowspace_tpu.taumode import (TauMode, select_tau_batch,
                                        synthetic_lambda_batch)
    from helpers import oracle_adjacency, oracle_laplacian

    rng = np.random.default_rng(13)
    rows = rng.uniform(0.1, 1.0, (700, 40)).astype(np.float32)
    rows[5, 2] = np.inf  # non-finite filtering inside tau
    graph_rows = rng.uniform(0.1, 1.0, (24, 8))
    lap = oracle_laplacian(oracle_adjacency(
        graph_rows, eps=1.0, topk=4, p=2.0, sigma=None)).astype(np.float32)
    x, L = jnp.asarray(rows), jnp.asarray(lap)
    cases = [("median", 0.5, 0.0, TauMode.median()),
             ("percentile", 0.7, 0.0, TauMode.percentile(0.7)),
             ("mean", 0.5, 0.0, TauMode.mean()),
             ("fixed", 0.5, 0.3, TauMode.fixed(0.3))]
    for kind, pct, fixed, mode in cases:
        out = fused_taulambda_batch(x, L, kind=kind, pct=pct, fixed=fixed,
                                    tile=256, interpret=True)
        ref = synthetic_lambda_batch(x, L, select_tau_batch(x, mode))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-7), kind


def test_fused_taulambda_fits_budget():
    from arrowspace_tpu.ops.pallas_taulambda import fused_taulambda_fits
    assert fused_taulambda_fits(1_000_000, 128, 128)
    assert not fused_taulambda_fits(1_000_000, 768, 768)


# --- bin-accumulator streaming top-k kernel ---------------------------------

def _bin_data(n, f, b, seed=0):
    return _data(n, f, b, seed)


@pytest.mark.parametrize("n,tile,k", [(1000, 256, 8), (2048, 512, 10),
                                      (777, 256, 5)])
def test_binned_topk_matches_xla(n, tile, k):
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    q, qlam, x, xlam = _bin_data(n, 64, 4)
    s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, 0.9, k=k, tile=tile,
                                    interpret=True, block_b=4)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.9), k=k)
    ok = np.asarray(fl) == 0
    assert ok.all(), "random data should not collide deeper than D"
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_binned_topk_block_padding():
    """Batch not a multiple of the query block: padded rows must not
    leak into results."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    q, qlam, x, xlam = _bin_data(900, 32, 5)
    s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, 0.8, k=6, tile=256,
                                    interpret=True, block_b=4)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.8), k=6)
    assert np.asarray(fl).shape == (5,)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_binned_topk_flags_deep_collision_and_repair_restores_exactness():
    """>D copies of the top row in ONE bin: the kernel must flag the
    query, and pallas_binned_topk_with_repair must restore the exact
    lax.top_k result (lowest-index tie order) via the merge kernel."""
    import arrowspace_tpu.ops.search as search_mod
    from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                                   binned_topk_depth_for)
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair

    rng = np.random.default_rng(5)
    n, f, tile, k = 3000, 48, 256, 8
    q = jnp.asarray(rng.uniform(0.1, 1.0, (2, f)), jnp.float32)
    qlam = jnp.asarray(rng.uniform(0, 1, (2,)), jnp.float32)
    x = np.asarray(rng.uniform(0.1, 1.0, (n, f)), np.float32)
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
    depth = binned_topk_depth_for(k)
    binpos = 37
    for j in range(depth + 3):  # > D same-bin copies of the query row
        x[j * tile + binpos] = np.asarray(q[0])
    xj = jnp.asarray(x)

    s, i, fl = binned_lambda_topk(q, qlam, xj, xlam, 1.0, k=k, tile=tile,
                                  interpret=True, block_b=2)
    assert np.asarray(fl)[0] == 1, "deep collision must be flagged"

    rs, ri = pallas_binned_topk_with_repair(
        q, qlam, xj, xlam, 1.0, k=k, tile=256, interpret=True)

    s2, i2 = batched_lambda_aware_topk(q, qlam, xj, xlam,
                                       jnp.float32(1.0), k=k)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2))


def test_binned_topk_duplicate_tie_order_within_pool():
    """Duplicates spread across DIFFERENT bins must come back in
    lowest-global-index order without any flag (the pool tie-break is by
    index, not pool position)."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    rng = np.random.default_rng(11)
    n, f, tile, k = 2000, 32, 256, 6
    q = jnp.asarray(rng.uniform(0.1, 1.0, (1, f)), jnp.float32)
    qlam = jnp.asarray([0.5], jnp.float32)
    x = np.asarray(rng.uniform(0.1, 1.0, (n, f)), np.float32)
    xlam = jnp.asarray(np.full(n, 0.5, np.float32))
    # 4 copies of the query at CONSECUTIVE indices (distinct bins)
    for j in range(4):
        x[700 + j] = np.asarray(q[0])
    xj = jnp.asarray(x)
    s, i, fl = binned_lambda_topk(q, qlam, xj, xlam, 1.0, k=k, tile=tile,
                                  interpret=True, block_b=1)
    s2, i2 = batched_lambda_aware_topk(q, qlam, xj, xlam,
                                       jnp.float32(1.0), k=k)
    np.testing.assert_array_equal(np.asarray(i)[0, :4],
                                  np.asarray([700, 701, 702, 703]))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
    assert np.asarray(fl)[0] == 0


def test_binned_topk_bucket_padding_masked():
    """Corpus sizes that bucket-pad (n != bucket_rows(n)) must never
    return padding indices."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    q, qlam, x, xlam = _bin_data(1500, 16, 2, seed=9)
    s, i, fl = binned_lambda_topk(q, qlam, x, xlam, 0.5, k=12, tile=256,
                                  interpret=True, block_b=2)
    assert np.asarray(i).max() < 1500
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.5), k=12)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_fused_select_tau_wide_f_subblocked():
    """Wide-F sub-blocking (F=768 -> sub=256): results identical to the
    single-block structure and to the scalar oracle; the fit gate routes
    F past the VMEM budget to the XLA path."""
    from arrowspace_tpu.ops.pallas_tau import (_sub_rows_for,
                                               fused_select_tau,
                                               fused_select_tau_fits)
    from arrowspace_tpu.taumode import TauMode, select_tau

    assert _sub_rows_for(128) == 1024     # narrow F: whole tile
    assert _sub_rows_for(768) < 1024      # wide F: sub-blocked
    assert fused_select_tau_fits(768)
    assert not fused_select_tau_fits(1536)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1100, 768)).astype(np.float32)
    x[3, 5] = np.nan
    out = np.asarray(fused_select_tau(jnp.asarray(x), kind="median",
                                      interpret=True))
    ref = np.array([select_tau(x[i], TauMode.median())
                    for i in range(x.shape[0])], dtype=np.float32)
    np.testing.assert_allclose(out[:1100], ref, rtol=5e-5, atol=1e-9)


def test_binned_topk_fuzz_shapes_and_k():
    """Randomised sweep of (n, f, b, k, alpha, tile, block, fold
    variant) against the XLA oracle: unflagged rows must match exactly;
    flagged rows (rare) are excluded here (their repair path is pinned
    elsewhere).  The fold variants (lane_split with/without pre_reduce
    — the production auto defaults at serving scale) are sampled so the
    pre-reduce combine and its loser-max detector get fuzzed too."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk

    rng = np.random.default_rng(99)
    for trial in range(8):
        n = int(rng.integers(300, 4000))
        f = int(rng.choice([8, 17, 32, 96]))
        b = int(rng.integers(1, 7))
        k = int(rng.choice([1, 3, 11, 29]))
        alpha = float(rng.uniform(0.0, 1.0))
        tile = int(rng.choice([256, 512]))
        block = int(rng.choice([2, 4, 8]))
        lane_split = int(rng.choice([1, 2, 4]))
        pre_reduce = bool(rng.random() < 0.5) and lane_split > 1
        q, qlam, x, xlam = _data(n, f, b, seed=trial)
        s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, alpha,
                                        k=min(k, n), tile=tile,
                                        interpret=True, block_b=block,
                                        lane_split=lane_split,
                                        pre_reduce=pre_reduce)
        s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                           jnp.float32(alpha), k=min(k, n))
        ok = np.asarray(fl) == 0
        np.testing.assert_array_equal(np.asarray(i1)[ok],
                                      np.asarray(i2)[ok],
                                      err_msg=f"trial {trial} "
                                      f"(n={n} f={f} b={b} k={k} "
                                      f"a={alpha:.2f} tile={tile} "
                                      f"r={lane_split} pre={pre_reduce})")
        np.testing.assert_allclose(np.asarray(s1)[ok],
                                   np.asarray(s2)[ok], atol=2e-5)


def test_binned_topk_deep_split_deep_depth_fuzz():
    """The serving-scale resident-block configs (benchmarks/
    honest_sweep.py): deep pre-reduce splits (r = 8/16) with depth 4 —
    narrow bins raise the >D-collision rate, depth 4 restores it; the
    fold/detector algebra must stay exact at every (r, depth).  Unflagged
    rows must match the XLA oracle exactly.  (No no-flag assertion: at
    tile 256 / r 16 there are only 16 bins, where >D collisions on
    random data are genuinely likely — the flag firing IS the contract;
    production bins are >= 64.)"""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk

    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(600, 5000))
        f = int(rng.choice([16, 64, 128]))
        b = int(rng.choice([4, 8]))
        k = int(rng.choice([3, 10, 11]))
        alpha = float(rng.uniform(0.0, 1.0))
        tile = int(rng.choice([256, 512]))
        r = int(rng.choice([8, 16]))
        depth = int(rng.choice([3, 4]))
        assert k <= depth * (tile // r)
        q, qlam, x, xlam = _bin_data(n, f, b, seed=100 + trial)
        s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, alpha, k=k,
                                        tile=tile, interpret=True,
                                        block_b=b, lane_split=r,
                                        pre_reduce=True, depth=depth)
        s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                           jnp.float32(alpha), k=k)
        ok = np.asarray(fl) == 0
        np.testing.assert_array_equal(
            np.asarray(i1)[ok], np.asarray(i2)[ok],
            err_msg=f"trial {trial} (n={n} f={f} b={b} k={k} "
                    f"a={alpha:.2f} tile={tile} r={r} d={depth})")
        np.testing.assert_allclose(np.asarray(s1)[ok], np.asarray(s2)[ok],
                                   atol=2e-5)


def test_resolve_layout_fits_padded_block():
    """bsz < block_b: the kernel pads queries UP to block_b before the
    pallas_call, so the auto tile must fit the PADDED block.  A prior
    revision fitted min(bsz, block_b) and picked a tile whose footprint
    blew the scoped-VMEM budget after padding (review finding)."""
    from arrowspace_tpu.ops.pallas_bintopk import (_layout_fits,
                                                   _resolve_layout)
    # the reviewer's crash shape: 64-query batch, 1M corpus, plain fold
    b, t, r, pre = _resolve_layout(64, 1_000_000, 128, 10, 3, False,
                                   0, 0, 0, False, 3, 6)
    assert _layout_fits(b, t, 128, 3, 4, 6 if pre else 3, r), (b, t, r)
    # manual block_b larger than the batch: same invariant
    b2, t2, r2, pre2 = _resolve_layout(64, 1_000_000, 128, 10, 3, False,
                                       256, 0, 0, False, 3, 6)
    assert b2 == 256
    assert _layout_fits(b2, t2, 128, 3, 4, 6 if pre2 else 3, r2), (t2, r2)


def test_resolve_layout_partial_pin_keeps_auto_pre_reduce():
    """Pinning only block_b (or tile) must keep the pre-sweep auto
    pre-reduce fold at serving scale (r 2 f32 / 8 bf16) — a prior
    revision silently degraded any partial pin to the plain fold
    (review finding)."""
    from arrowspace_tpu.ops.pallas_bintopk import _resolve_layout
    b, t, r, pre = _resolve_layout(2048, 1_000_000, 128, 10, 3, False,
                                   256, 0, 0, None, 3, 6)
    assert (r, pre) == (2, True)
    b, t, r, pre = _resolve_layout(2048, 1_000_000, 128, 10, 3, True,
                                   256, 0, 0, None, 3, 6)
    assert (r, pre) == (8, True)
    # below the serving gate the partial pin stays plain
    b, t, r, pre = _resolve_layout(2048, 65_535, 128, 10, 3, False,
                                   256, 0, 0, None, 3, 6)
    assert (r, pre) == (1, False)


@pytest.mark.parametrize("k", [64, 100, 128])
def test_binned_topk_kband_matches_xla(k):
    """The (48, 128] band (VERDICT r3 item 4): depth-4 insertion network,
    exact vs the XLA oracle on collision-free data, flags quiet."""
    from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                                   binned_topk_depth_for)
    assert binned_topk_depth_for(k) == 4
    q, qlam, x, xlam = _bin_data(2048, 32, 3, seed=k)
    s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, 0.9, k=k, tile=512,
                                    interpret=True, block_b=3)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.9), k=k)
    assert (np.asarray(fl) == 0).all()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_binned_topk_kband_deep_collision_repairs():
    """k=64 with > depth (4) same-bin duplicates must flag and repair to
    the exact result through pallas_binned_topk_with_repair."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair

    rng = np.random.default_rng(64)
    n, f, tile, k = 4096, 32, 512, 64
    q = jnp.asarray(rng.uniform(0.1, 1.0, (2, f)), jnp.float32)
    qlam = jnp.asarray(rng.uniform(0, 1, (2,)), jnp.float32)
    x = np.asarray(rng.uniform(0.1, 1.0, (n, f)), np.float32)
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
    binpos = 11
    for j in range(6):                    # > depth 4 same-bin copies
        x[j * tile + binpos] = np.asarray(q[0])
    xj = jnp.asarray(x)
    _, _, fl = binned_lambda_topk(q, qlam, xj, xlam, 1.0, k=k, tile=tile,
                                  interpret=True, block_b=2)
    assert np.asarray(fl)[0] == 1
    rs, ri = pallas_binned_topk_with_repair(q, qlam, xj, xlam, 1.0, k=k,
                                            tile=tile, interpret=True)
    s2, i2 = batched_lambda_aware_topk(q, qlam, xj, xlam,
                                       jnp.float32(1.0), k=k)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2))


def test_kband_auto_layout_fits_and_dispatches_binned():
    """Layout pins for the (48, 128] serving band: the auto layout keeps
    bins 512 at depth 4 inside the VMEM budget, and the serving dispatch
    (session_kernel_kind) routes the whole band to the binned kernel —
    the r3 auto-dispatch fell off to the ~7x-slower merge kernel here."""
    from arrowspace_tpu.index import session_kernel_kind
    from arrowspace_tpu.ops.pallas_bintopk import (_layout_fits,
                                                   binned_layout,
                                                   binned_topk_depth_for)
    for k in (64, 100, 128):
        d = binned_topk_depth_for(k)
        b, t, r, pre, n_pad = binned_layout(2048, 1_000_000, 128, k)
        assert t // r == 512, (k, b, t, r)
        assert _layout_fits(b, t, 128, d, 4, 6 if pre else 3, r), (b, t, r)
        assert k <= d * (t // r)
    import jax
    if jax.default_backend() == "tpu":       # gate is backend-dependent
        for k in (64, 100, 128):
            assert session_kernel_kind(1_000_000, k, 128) == "binned"
        assert session_kernel_kind(1_000_000, 129, 128) == "xla"


def test_binned_topk_prepared_corpus_matches_raw():
    """prepare_binned_corpus + prepared=True must be bitwise-identical
    to the raw-items path (the session hoists the normalise+bucket-pad
    producer out of the per-dispatch program): same scores, indices AND
    flags, at more than one batch geometry (block padding included)."""
    from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                                   prepare_binned_corpus)
    for n, f, b, k in ((3000, 32, 4, 7), (900, 16, 5, 3)):
        q, qlam, x, xlam = _bin_data(n, f, b, seed=n)
        s1, i1, f1 = binned_lambda_topk(q, qlam, x, xlam, 0.9, k=k,
                                        interpret=True)
        xh, xl = prepare_binned_corpus(x, xlam, bsz=b, k=k)
        s2, i2, f2 = binned_lambda_topk(q, qlam, xh, xl, 0.9, k=k,
                                        interpret=True, prepared=True,
                                        n_items=n)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


# ---------------------------------------------------------------------------
# Energy bin-accumulator kernel (ops/pallas_bintopk.binned_energy_topk)
# ---------------------------------------------------------------------------

def _energy_data(n, g, b, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(b, g)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32),
            jnp.asarray(rng.normal(size=(n, g)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32))


def _energy_oracle(zq, qlam, z, xlam, wl, wd, k):
    from arrowspace_tpu.energymaps import _energy_score_topk_chunked
    return _energy_score_topk_chunked(
        zq, qlam, z, xlam, jnp.float32(wl), jnp.float32(wd), k=k,
        chunk=128)


@pytest.mark.parametrize("n,tile,k", [(1000, 256, 8), (2048, 512, 10),
                                      (777, 256, 5)])
def test_binned_energy_matches_chunked(n, tile, k):
    from arrowspace_tpu.ops.pallas_bintopk import binned_energy_topk
    zq, qlam, z, xlam = _energy_data(n, 48, 4, seed=n)
    s1, i1, fl = binned_energy_topk(zq, qlam, z, xlam, 1.0, 0.5, k=k,
                                    tile=tile, interpret=True, block_b=4)
    s2, i2 = _energy_oracle(zq, qlam, z, xlam, 1.0, 0.5, k)
    assert (np.asarray(fl) == 0).all(), \
        "random data should not collide deeper than D"
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_binned_energy_block_padding_and_chunking():
    """B not a multiple of the query block (pad path) and B larger than
    the block (chunk path) both reproduce the chunked oracle."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_energy_topk
    zq, qlam, z, xlam = _energy_data(900, 32, 5, seed=7)
    s1, i1, fl = binned_energy_topk(zq, qlam, z, xlam, 0.7, 1.3, k=6,
                                    tile=256, interpret=True, block_b=2)
    s2, i2 = _energy_oracle(zq, qlam, z, xlam, 0.7, 1.3, 6)
    assert np.asarray(fl).shape == (5,)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_binned_energy_prepared_corpus_matches_raw():
    """prepare_binned_energy_corpus + prepared=True must be bitwise-
    identical to the raw path (the energy session hoists the z-plane
    pad + norm reduce out of the per-dispatch program)."""
    from arrowspace_tpu.ops.pallas_bintopk import (
        binned_energy_topk, prepare_binned_energy_corpus)
    for n, g, b, k in ((2048, 48, 4, 8), (900, 32, 5, 6)):
        zq, qlam, z, xlam = _energy_data(n, g, b, seed=n)
        s1, i1, f1 = binned_energy_topk(zq, qlam, z, xlam, 1.0, 0.5, k=k,
                                        interpret=True)
        zx, xl, xn = prepare_binned_energy_corpus(z, xlam, bsz=b, k=k)
        s2, i2, f2 = binned_energy_topk(zq, qlam, zx, xl, 1.0, 0.5, k=k,
                                        interpret=True, prepared=True,
                                        n_items=n, z_norms=xn)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_binned_energy_duplicate_tie_order():
    """Exact duplicate z-rows in the SAME bin (stride = tile) and in
    different bins: tie order must match lax.top_k (lowest index)."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_energy_topk
    rng = np.random.default_rng(11)
    n, g, tile, k = 900, 16, 256, 6
    z = rng.normal(size=(n, g))
    for j in (5, 5 + tile, 5 + 2 * tile, 300):   # 3 same-bin + 1 other
        z[j] = z[5]
    xlam = np.full(n, 0.4, np.float32)
    zq = jnp.asarray(z[5][None, :], jnp.float32)
    zj = jnp.asarray(z, jnp.float32)
    s1, i1, fl = binned_energy_topk(zq, jnp.asarray([0.4], jnp.float32),
                                    zj, jnp.asarray(xlam), 1.0, 0.5, k=k,
                                    tile=tile, interpret=True, block_b=1)
    s2, i2 = _energy_oracle(zq, jnp.asarray([0.4], jnp.float32), zj,
                            jnp.asarray(xlam), 1.0, 0.5, k)
    if (np.asarray(fl) == 0).all():
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        # ties resolve to lowest GLOBAL index regardless of bin: 300 is
        # in a different bin than the stride-tile copies but sorts
        # between them
        assert list(np.asarray(i1)[0][:4]) == [5, 5 + tile, 300,
                                               5 + 2 * tile]


def test_binned_energy_flags_deep_collision():
    """>depth copies of the best row in ONE bin: the kernel must flag the
    query (the dispatch in search_energy_batch re-runs flagged rows
    through the exact chunked path)."""
    from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_topk,
                                                   binned_topk_depth_for)
    rng = np.random.default_rng(13)
    n, g, tile, k = 1100, 16, 256, 8
    depth = binned_topk_depth_for(k)
    z = rng.normal(size=(n, g)) * 5.0            # spread => dupes win
    dup_rows = [9 + d * tile for d in range(depth + 1)]  # one bin
    for j in dup_rows:
        z[j] = z[9]
    xlam = np.full(n, 0.5, np.float32)
    zq = jnp.asarray(z[9][None, :], jnp.float32)
    zj = jnp.asarray(z, jnp.float32)
    s1, i1, fl = binned_energy_topk(zq, jnp.asarray([0.5], jnp.float32),
                                    zj, jnp.asarray(xlam), 1.0, 0.5, k=k,
                                    tile=tile, interpret=True, block_b=1)
    assert np.asarray(fl)[0] == 1, \
        "depth+1 same-bin top rows must raise the miss flag"
    # and the exact path recovers all depth+1 duplicates in index order
    s2, i2 = _energy_oracle(zq, jnp.asarray([0.5], jnp.float32), zj,
                            jnp.asarray(xlam), 1.0, 0.5, k)
    assert list(np.asarray(i2)[0][:depth + 1]) == dup_rows


def test_binned_energy_fuzz_shapes_and_k():
    """Randomised sweep of (n, g, b, k, weights, tile, block, fold
    variant) against the chunked oracle; unflagged rows must match
    exactly.  lane_split/pre_reduce sampled as in the cosine fuzz (the
    energy production default is r4 pre-reduce at serving scale)."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_energy_topk
    rng = np.random.default_rng(17)
    for trial in range(8):
        n = int(rng.integers(300, 4000))
        g = int(rng.choice([8, 17, 48, 96]))
        b = int(rng.integers(1, 7))
        k = int(rng.choice([1, 3, 11, 29]))
        wl = float(rng.uniform(0.0, 2.0))
        wd = float(rng.uniform(0.0, 2.0))
        tile = int(rng.choice([256, 512]))
        block = int(rng.choice([2, 4, 8]))
        lane_split = int(rng.choice([1, 2, 4]))
        pre_reduce = bool(rng.random() < 0.5) and lane_split > 1
        zq, qlam, z, xlam = _energy_data(n, g, b, seed=100 + trial)
        kk = min(k, n)
        s1, i1, fl = binned_energy_topk(zq, qlam, z, xlam, wl, wd, k=kk,
                                        tile=tile, interpret=True,
                                        block_b=block,
                                        lane_split=lane_split,
                                        pre_reduce=pre_reduce)
        s2, i2 = _energy_oracle(zq, qlam, z, xlam, wl, wd, kk)
        ok = np.asarray(fl) == 0
        np.testing.assert_array_equal(
            np.asarray(i1)[ok], np.asarray(i2)[ok],
            err_msg=f"trial {trial} (n={n} g={g} b={b} k={kk} "
            f"wl={wl:.2f} wd={wd:.2f} tile={tile} "
            f"r={lane_split} pre={pre_reduce})")
        np.testing.assert_allclose(np.asarray(s1)[ok],
                                   np.asarray(s2)[ok], atol=2e-5)


@pytest.mark.parametrize("layout", ["sublane", "sublane_mm",
                                    "bisect", "bisect_lane",
                                    "bisect4", "bisect4_mm"])
def test_fused_select_tau_sublane_layouts_match_lane(layout):
    """The sublane-sorted τ layouts (sublane = sort production) and the
    bisection SELECTION layouts (bisect = r4 candidate: binary search on
    the sortable-int value range, no exchange network) must agree
    bitwise with the lane layout (same values, same extraction
    arithmetic), including non-finite filtering, non-power-of-two F and
    percentile.  (On the real chip sublane ≡ lane exactly too, but
    sublane_mm is inexact — the f32 MXU identity-matmul transpose
    truncates; it stays interpret/CPU-only.)"""
    from arrowspace_tpu.ops.pallas_tau import fused_select_tau
    rng = np.random.default_rng(29)
    for f in (24, 64, 128):
        x = rng.normal(size=(700, f)).astype(np.float32)
        x[3, 5] = np.nan
        x[17, :] = np.inf
        xj = jnp.asarray(x)
        for kind, pct in (("median", 0.5), ("percentile", 0.25),
                          ("mean", 0.5)):
            a = np.asarray(fused_select_tau(xj, kind=kind, pct=pct,
                                            tile=256, interpret=True,
                                            layout="lane"))
            b = np.asarray(fused_select_tau(xj, kind=kind, pct=pct,
                                            tile=256, interpret=True,
                                            layout=layout))
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"f={f} kind={kind}")


def test_binned_topk_alpha1_bitwise_cosine_anchor():
    """The fma score form must keep the alpha=1 cosine anchor BITWISE:
    c1=0 so the kernel score is exactly the f32-accumulated cosine and
    the flush shift adds 0.0 (value-preserving)."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    rng = np.random.default_rng(41)
    n, f, b = 4096, 16, 4
    x = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)).astype(np.float32))
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0.1, 1.0, (b, f)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32))
    s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, 1.0, k=5, tile=512,
                                    interpret=True, block_b=b)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(1.0), k=5)
    ok = np.asarray(fl) == 0
    np.testing.assert_array_equal(np.asarray(i1)[ok], np.asarray(i2)[ok])
    np.testing.assert_array_equal(np.asarray(s1)[ok], np.asarray(s2)[ok])


def test_bisect_tau_duplicates_and_signed_zero():
    """Selection-specific edges the sort path gets for free: (a) ties —
    the even-m upper statistic must resolve to the SAME duplicated value
    (the cnt_lo >= hi+1 shortcut), (b) the next-distinct-value hop when
    the two middle ranks straddle different values, (c) -0.0/+0.0 whose
    sortable-int patterns differ but values compare equal."""
    from arrowspace_tpu.ops.pallas_tau import fused_select_tau
    rng = np.random.default_rng(31)
    f = 32
    x = rng.choice([-2.0, -0.5, 0.25, 1.5, 3.0], size=(700, f)) \
        .astype(np.float32)                       # heavy duplicates
    x[5, :] = 7.0                                 # all-equal row
    x[9, : f // 2] = -0.0
    x[9, f // 2:] = 0.0                           # median spans -0/+0
    x[12, ::3] = np.nan                           # odd/even m mix
    xj = jnp.asarray(x)
    for kind, pct in (("median", 0.5), ("percentile", 0.5)):
        ref = np.asarray(fused_select_tau(xj, kind=kind, pct=pct,
                                          tile=256, interpret=True,
                                          layout="lane"))
        got = np.asarray(fused_select_tau(xj, kind=kind, pct=pct,
                                          tile=256, interpret=True,
                                          layout="bisect"))
        np.testing.assert_array_equal(ref, got, err_msg=kind)


@pytest.mark.parametrize("lane_split", [2, 4])
def test_binned_topk_lane_split_matches_xla(lane_split):
    """lane_split folds r lane sub-tiles into tile/r bins (the big-block
    VMEM enabler): results must stay exact vs the XLA oracle including
    tie order, bucket-pad masking, and the duplicate-storm flag/repair
    contract at the narrower bin width."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    q, qlam, x, xlam = _bin_data(3000, 64, 6, seed=11)
    s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, 0.9, k=9, tile=512,
                                    interpret=True, block_b=6,
                                    lane_split=lane_split)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.9), k=9)
    assert (np.asarray(fl) == 0).all()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    # duplicate storm: >depth copies of the top item in ONE bin must
    # flag under lane_split too, and repair must restore exactness
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair
    xs = np.asarray(x).copy()
    bins = 512 // lane_split
    top = xs[7] / np.linalg.norm(xs[7])
    for j in range(6):           # 6 copies > depth 3, same bin (stride)
        xs[7 + j * bins] = top * (1.0 + 1e-7)
    xj = jnp.asarray(xs)
    s, i, fl = binned_lambda_topk(q[:6], qlam[:6], xj, xlam, 1.0, k=9,
                                  tile=512, interpret=True, block_b=6,
                                  lane_split=lane_split)
    rs, ri = pallas_binned_topk_with_repair(
        q[:6], qlam[:6], xj, xlam, 1.0, k=9, tile=512, interpret=True,
        block_b=6, lane_split=lane_split)
    s2, i2 = batched_lambda_aware_topk(q[:6], qlam[:6], xj, xlam,
                                       jnp.float32(1.0), k=9)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2))


@pytest.mark.parametrize("lane_split", [2, 4, 8])
def test_binned_topk_pre_reduce_matches_xla(lane_split):
    """pre_reduce max-combines the r lane sub-tiles into ONE depth-D
    fold (the VPU fold-work reducer): unflagged results must stay exact
    vs the XLA oracle, and the loser-max detector must flag any query
    whose true top-k lost a pre-reduce max (the repair then restores
    exactness) — including under a same-group duplicate storm."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair
    q, qlam, x, xlam = _bin_data(3000, 64, 6, seed=13)
    s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, 0.9, k=9, tile=512,
                                    interpret=True, block_b=6,
                                    lane_split=lane_split, pre_reduce=True)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.9), k=9)
    ok = np.asarray(fl) == 0
    np.testing.assert_allclose(np.asarray(s1)[ok], np.asarray(s2)[ok],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1)[ok], np.asarray(i2)[ok])

    # two TRUE-top items in the SAME pre-reduce group (lane l, sub-tiles
    # j and j+1): the loser is dropped by the combine, so the loser-max
    # detector MUST flag, and repair must restore the exact result.
    # Queries are made parallel to the crafted vector so the colliding
    # pair is unambiguously the true top-2 (cos == 1 > every other row).
    bins = 512 // lane_split
    xs = np.asarray(x).copy()
    top = xs[7] / np.linalg.norm(xs[7])
    xs[7] = top * 2.0
    xs[7 + bins] = top * 3.0            # same lane, next sub-tile
    xj = jnp.asarray(xs)
    qt = jnp.asarray(np.tile(top, (6, 1)).astype(np.float32))
    s, i, fl = binned_lambda_topk(qt, qlam[:6], xj, xlam, 1.0, k=9,
                                  tile=512, interpret=True, block_b=6,
                                  lane_split=lane_split, pre_reduce=True)
    assert (np.asarray(fl) == 1).all()
    rs, ri = pallas_binned_topk_with_repair(
        qt, qlam[:6], xj, xlam, 1.0, k=9, tile=512, interpret=True,
        block_b=6, lane_split=lane_split, pre_reduce=True)
    s2, i2 = batched_lambda_aware_topk(qt, qlam[:6], xj, xlam,
                                       jnp.float32(1.0), k=9)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2))

def test_binned_topk_auto_layout_decision():
    """The sweep-tuned auto layout (benchmarks/honest_sweep2.py): at
    serving scale the resident-block pre-reduce layout pins bins =
    tile/lane_split to the k-dependent target (128 up to k=16 — one
    full vreg lane row), grows the query block to 1024, and prefers
    tile 2048; below the 65536-row serving gate and when nothing fits
    VMEM it falls back to the plain full-width fold."""
    from arrowspace_tpu.ops.pallas_bintopk import _auto_layout

    # serving headline config: 1M x 128, B=2048, k=10
    assert _auto_layout(2048, 1_000_000, 128, 10, 3, False, 3, 6) == \
        (1024, 2048, 16, True)
    assert _auto_layout(2048, 1_000_000, 128, 10, 3, True, 3, 6) == \
        (1024, 2048, 16, True)
    # latency config: block capped by the batch; tile 4096 halves the
    # grid steps (r4 rule — bins widen to 256 to keep r <= 16; per-pair
    # fold work scales with bins*r/tile so the economics are unchanged)
    assert _auto_layout(256, 1_000_000, 128, 10, 3, False, 3, 6) == \
        (256, 4096, 16, True)
    # sub-256 batches pad up to one 256 block
    assert _auto_layout(100, 1_000_000, 128, 10, 3, False, 3, 6)[0] == 256
    # wider pools as k grows (flag rate ~ C(k, D+1)/bins^D; thresholds
    # re-derived from measured chip flag counts — see _bins_target)
    b, t, r, pre = _auto_layout(2048, 1_000_000, 128, 13, 3, False, 3, 6)
    assert (t // r) == 256 and pre
    b, t, r, pre = _auto_layout(2048, 1_000_000, 128, 42, 3, False, 3, 6)
    assert (t // r) == 512 and pre
    # wide F: block backs off before the layout stops fitting
    b, t, r, pre = _auto_layout(2048, 500_000, 768, 10, 3, False, 3, 6)
    assert (t // r) == 128 and pre and b >= 256
    # below the serving gate: plain fold
    assert _auto_layout(2048, 65535, 128, 10, 3, False, 3, 6)[2:] == \
        (1, False)
    # past any (block, tile) fit: plain-fold fallback, Mosaic floor
    assert _auto_layout(2048, 1_000_000, 4096, 10, 3, False, 3, 6)[2:] == \
        (1, False)
    # energy-kernel plane counts still land the resident layout
    assert _auto_layout(2048, 1_000_000, 64, 10, 3, False, 4, 7) == \
        (1024, 2048, 16, True)


def test_binned_topk_auto_pre_reduce_exact_at_gate():
    """End-to-end: at n >= 65536 the default dispatch takes the
    pre-reduce fold and unflagged rows stay BITWISE-exact vs the XLA
    oracle — the r4 fma score form (alpha folded into the query, c1
    shift restored post-sort) is canonical in BOTH programs
    (ops/search._shifted_lambda_plane), so the r3 contract holds;
    flagged rows (if any) repair to exactness."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair
    rng = np.random.default_rng(29)
    n, f, b = 65536, 8, 4
    x = jnp.asarray(rng.uniform(0.1, 1.0, (n, f)).astype(np.float32))
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0.1, 1.0, (b, f)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32))
    s1, i1, fl = binned_lambda_topk(q, qlam, x, xlam, 0.9, k=5,
                                    interpret=True, block_b=b)
    s2, i2 = batched_lambda_aware_topk(q, qlam, x, xlam,
                                       jnp.float32(0.9), k=5)
    ok = np.asarray(fl) == 0
    np.testing.assert_array_equal(np.asarray(i1)[ok], np.asarray(i2)[ok])
    np.testing.assert_array_equal(np.asarray(s1)[ok], np.asarray(s2)[ok])
    rs, ri = pallas_binned_topk_with_repair(q, qlam, x, xlam, 0.9, k=5,
                                            interpret=True, block_b=b)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2))

@pytest.mark.parametrize("lane_split", [2, 4])
def test_binned_energy_pre_reduce_matches_chunked(lane_split):
    """Energy-kernel pre-reduce fold: unflagged rows exact vs the chunked
    oracle; a same-group duplicate pair (the pre-reduce loser is a true
    top-k element) must flag and repair through the exact path."""
    from arrowspace_tpu.ops.pallas_bintopk import binned_energy_topk
    zq, qlam, z, xlam = _energy_data(2048, 32, 5, seed=23)
    s1, i1, fl = binned_energy_topk(zq, qlam, z, xlam, 1.0, 0.5, k=9,
                                    tile=512, interpret=True, block_b=5,
                                    lane_split=lane_split, pre_reduce=True)
    s2, i2 = _energy_oracle(zq, qlam, z, xlam, 1.0, 0.5, 9)
    ok = np.asarray(fl) == 0
    np.testing.assert_array_equal(np.asarray(i1)[ok], np.asarray(i2)[ok])
    np.testing.assert_allclose(np.asarray(s1)[ok], np.asarray(s2)[ok],
                               atol=1e-6)

    # two best rows in the SAME pre-reduce group (lane l, sub-tiles j,
    # j+1): the combine drops one, so the loser-max detector MUST flag.
    # Duplicate BOTH the z row and its λ so the pair truly ties at the
    # top score (z alone leaves the λ term arbitrary).
    bins = 512 // lane_split
    zs = np.asarray(z).copy()
    zs[7 + bins] = zs[7]                 # same lane, next sub-tile
    ls = np.asarray(xlam).copy()
    ls[7 + bins] = ls[7]
    zj = jnp.asarray(zs)
    lj = jnp.asarray(ls)
    zq1 = jnp.asarray(zs[7][None, :], jnp.float32)
    ql1 = jnp.asarray([float(ls[7])], jnp.float32)
    s, i, fl = binned_energy_topk(zq1, ql1, zj, lj, 1.0, 0.5, k=9,
                                  tile=512, interpret=True, block_b=1,
                                  lane_split=lane_split, pre_reduce=True)
    assert np.asarray(fl)[0] == 1
    s2, i2 = _energy_oracle(zq1, ql1, zj, lj, 1.0, 0.5, 9)
    assert list(np.asarray(i2)[0][:2]) == [7, 7 + bins]
