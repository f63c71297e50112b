"""Strided-bin exact repair (ops/bin_repair) for the binned kernels.

The binned kernels flag queries that may miss a top-k element to a
>depth same-bin collision; the strided repair rescores ONLY the fired
bins' rows (bin(g) = g mod bins is a strided slice) + the query's
current top-k, and must restore the exact lax.top_k result — the same
contract the full-corpus merge repair satisfies, at ~1/15 the device
work.  These tests force deep collisions and pin end-to-end exactness
against the XLA oracles (reference semantics: core.rs:818-888 /
energymaps.rs:368-407)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arrowspace_tpu.ops.bin_repair import (MAX_FIRED, fired_bins_host,
                                           strided_energy_repair,
                                           strided_lambda_repair)
from arrowspace_tpu.ops.pallas_bintopk import (NEG_INF, binned_lambda_topk,
                                               binned_energy_topk,
                                               binned_topk_depth_for,
                                               prepare_binned_corpus,
                                               binned_layout)
from arrowspace_tpu.ops.search import batched_lambda_aware_topk


def _lambda_oracle(q, qlam, x, xlam, alpha, k):
    return batched_lambda_aware_topk(q, qlam, x, xlam,
                                     jnp.float32(alpha), k=k)


def _energy_oracle(zq, qlam, z, xlam, wl, wd, k):
    from arrowspace_tpu.energymaps import _energy_score_topk_chunked
    return _energy_score_topk_chunked(
        zq, qlam, z, xlam, jnp.float32(wl), jnp.float32(wd), k=k,
        chunk=128)


def test_fired_bins_host_basic_and_overflow():
    det = np.full((3, 8), NEG_INF, np.float32)
    det[0, 5] = 2.0                      # one fired bin
    det[1, [1, 3, 6]] = 4.0              # three fired bins -> overflow
    det[2, 2] = 0.5                      # below kth -> nothing fired
    kth = np.asarray([1.0, 1.0, 1.0], np.float32)
    fired, ok = fired_bins_host(det, kth)
    assert ok.tolist() == [True, False, True]
    assert fired[0].tolist() == [5, -1]
    assert fired[2].tolist() == [-1, -1]


def _collision_corpus(rng, n, f, bins, k, n_copies, binpos=37):
    """Corpus with n_copies duplicates of the query row in ONE bin."""
    q = np.asarray(rng.uniform(0.1, 1.0, (2, f)), np.float32)
    x = np.asarray(rng.uniform(0.1, 1.0, (n, f)), np.float32)
    for j in range(n_copies):
        x[binpos + j * bins] = q[0]
    return q, x


@pytest.mark.parametrize("alpha", [1.0, 0.8])
def test_strided_lambda_repair_restores_exactness(alpha):
    """>depth same-bin copies of the top row: the strided repair must
    reproduce lax.top_k bitwise (scores AND lowest-index tie order) for
    the flagged query, while touching only the fired bin's rows."""
    rng = np.random.default_rng(17)
    n, f, tile, k = 3000, 48, 256, 8
    depth = binned_topk_depth_for(k)
    bins = tile                                  # lane_split 1 (< 65536)
    q, x = _collision_corpus(rng, n, f, bins, k, depth + 3)
    qj = jnp.asarray(q)
    qlam = jnp.asarray(rng.uniform(0, 1, (2,)), jnp.float32)
    xj = jnp.asarray(x)
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))

    s, i, fl, det = binned_lambda_topk(
        qj, qlam, xj, xlam, alpha, k=k, tile=tile, interpret=True,
        block_b=2, return_det=True)
    assert np.asarray(det).shape == (2, bins)
    flags = np.asarray(fl)
    assert flags[0] == 1, "deep collision must be flagged"
    rows = np.nonzero(flags)[0]

    s_h = np.asarray(s)
    rs, ri = strided_lambda_repair(
        q[rows], np.asarray(qlam)[rows], np.asarray(det)[rows],
        s_h[rows, k - 1], np.asarray(i)[rows], xj, xlam, alpha,
        k=k, n=n, prepared=False, use_bf16=False)

    s2, i2 = _lambda_oracle(qj, qlam, xj, xlam, alpha, k)
    np.testing.assert_array_equal(ri, np.asarray(i2)[rows])
    np.testing.assert_allclose(rs, np.asarray(s2)[rows], atol=1e-6)


def test_strided_lambda_repair_prepared_corpus():
    """Session path: the repair runs against the PREPARED corpus
    (normalised + bucket-padded at construction) and must still match
    the oracle exactly, under the fully-auto kernel layout."""
    rng = np.random.default_rng(23)
    n, f, k, bsz = 6000, 48, 8, 8
    depth = binned_topk_depth_for(k)
    _, tile, lane_split, _, _ = binned_layout(bsz, n, f, k)
    bins = tile // lane_split
    assert 11 + (depth + 1) * bins < n, "collision stride must fit n"
    q, x = _collision_corpus(rng, n, f, bins, k, depth + 2, binpos=11)
    qj = jnp.asarray(q)
    qlam = jnp.asarray(rng.uniform(0, 1, (2,)), jnp.float32)
    xj = jnp.asarray(x)
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))

    xprep, lamprep = prepare_binned_corpus(xj, xlam, bsz=bsz, k=k)
    s, i, fl, det = binned_lambda_topk(
        qj, qlam, xprep, lamprep, 1.0, k=k, interpret=True,
        prepared=True, n_items=n, return_det=True)
    flags = np.asarray(fl)
    assert flags[0] == 1
    rows = np.nonzero(flags)[0]

    s_h = np.asarray(s)
    rs, ri = strided_lambda_repair(
        q[rows], np.asarray(qlam)[rows], np.asarray(det)[rows],
        s_h[rows, k - 1], np.asarray(i)[rows], xprep, lamprep, 1.0,
        k=k, n=n, prepared=True, use_bf16=False)

    s2, i2 = _lambda_oracle(qj, qlam, xj, xlam, 1.0, k)
    np.testing.assert_array_equal(ri, np.asarray(i2)[rows])
    np.testing.assert_allclose(rs, np.asarray(s2)[rows], atol=1e-6)


def test_strided_repair_overflow_falls_back():
    """A query with more than MAX_FIRED fired bins must be routed to the
    caller's fallback, and a missing fallback must raise."""
    rng = np.random.default_rng(31)
    n, f, tile, k = 3000, 48, 256, 8
    depth = binned_topk_depth_for(k)
    bins = tile
    q = np.asarray(rng.uniform(0.1, 1.0, (1, f)), np.float32)
    x = np.asarray(rng.uniform(0.1, 1.0, (n, f)), np.float32)
    # (MAX_FIRED + 1) DISTINCT bins, each with >depth copies of the top
    # row -> every one of those bins fires
    positions = [10, 20, 30]
    assert len(positions) == MAX_FIRED + 1
    for pos in positions:
        for j in range(depth + 1):
            x[pos + j * bins] = q[0]
    qj = jnp.asarray(q)
    qlam = jnp.asarray([0.5], jnp.float32)
    xj = jnp.asarray(x)
    xlam = jnp.asarray(np.full(n, 0.5, np.float32))

    s, i, fl, det = binned_lambda_topk(
        qj, qlam, xj, xlam, 1.0, k=k, tile=tile, interpret=True,
        block_b=1, return_det=True)
    assert np.asarray(fl)[0] == 1
    det_h, s_h, i_h = np.asarray(det), np.asarray(s), np.asarray(i)
    fired, ok = fired_bins_host(det_h, s_h[:, k - 1])
    assert not ok[0], "3 fired bins must overflow MAX_FIRED=2"

    with pytest.raises(RuntimeError, match="MAX_FIRED"):
        strided_lambda_repair(q, np.asarray(qlam), det_h, s_h[:, k - 1],
                              i_h, xj, xlam, 1.0, k=k, n=n,
                              prepared=False, use_bf16=False)

    s2, i2 = _lambda_oracle(qj, qlam, xj, xlam, 1.0, k)
    calls = []

    def fallback(rel_rows):
        calls.append(np.asarray(rel_rows).copy())
        return np.asarray(s2)[rel_rows], np.asarray(i2)[rel_rows]

    rs, ri = strided_lambda_repair(q, np.asarray(qlam), det_h,
                                   s_h[:, k - 1], i_h, xj, xlam, 1.0,
                                   k=k, n=n, prepared=False,
                                   use_bf16=False, fallback=fallback)
    assert len(calls) == 1 and calls[0].tolist() == [0]
    np.testing.assert_array_equal(ri, np.asarray(i2))


def test_repair_wrapper_uses_strided_path():
    """pallas_binned_topk_with_repair end-to-end through the strided
    repair: exact vs the oracle on a forced deep collision, including
    duplicate tie order (all copies returned lowest-index-first)."""
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair
    rng = np.random.default_rng(41)
    n, f, tile, k = 3000, 48, 256, 8
    depth = binned_topk_depth_for(k)
    q, x = _collision_corpus(rng, n, f, tile, k, depth + 3)
    qj = jnp.asarray(q)
    qlam = jnp.asarray(rng.uniform(0, 1, (2,)), jnp.float32)
    xj = jnp.asarray(x)
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))

    rs, ri = pallas_binned_topk_with_repair(
        qj, qlam, xj, xlam, 1.0, k=k, tile=tile, interpret=True)
    s2, i2 = _lambda_oracle(qj, qlam, xj, xlam, 1.0, k)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(rs), np.asarray(s2), atol=1e-6)


def test_repair_wrapper_strided_under_lane_split_fold():
    """The pre-reduce loser-max detector's flags must also repair
    exactly through the strided path: every combine loser of bin b has
    global index ≡ b (mod bins), so the strided slice covers it."""
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair
    rng = np.random.default_rng(43)
    n, f, tile, k, lane_split = 4096, 32, 512, 6, 4
    bins = tile // lane_split
    depth = binned_topk_depth_for(k)
    q, x = _collision_corpus(rng, n, f, bins, k, depth + 3, binpos=99)
    qj = jnp.asarray(q)
    qlam = jnp.asarray(rng.uniform(0, 1, (2,)), jnp.float32)
    xj = jnp.asarray(x)
    xlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))

    s, i, fl, det = binned_lambda_topk(
        qj, qlam, xj, xlam, 1.0, k=k, tile=tile, interpret=True,
        block_b=2, lane_split=lane_split, pre_reduce=True,
        return_det=True)
    assert np.asarray(det).shape == (2, bins)
    assert np.asarray(fl)[0] == 1

    rs, ri = pallas_binned_topk_with_repair(
        qj, qlam, xj, xlam, 1.0, k=k, tile=tile, interpret=True,
        lane_split=lane_split, pre_reduce=True)
    s2, i2 = _lambda_oracle(qj, qlam, xj, xlam, 1.0, k)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(rs), np.asarray(s2), atol=1e-6)


def test_strided_energy_repair_restores_exactness():
    """Energy-kernel analogue: >depth same-bin copies of the best row,
    repaired through the fired bin's strided slice, must match the
    chunked oracle exactly (ids) with scores equal to f32 resolution."""
    rng = np.random.default_rng(13)
    n, g, tile, k = 1100, 16, 256, 8
    depth = binned_topk_depth_for(k)
    bins = tile
    z = rng.normal(size=(n, g)) * 5.0
    dup_rows = [9 + d * bins for d in range(depth + 2)]
    for j in dup_rows:
        z[j] = z[9]
    xlam = jnp.asarray(np.full(n, 0.5, np.float32))
    zq = jnp.asarray(z[9][None, :], jnp.float32)
    zj = jnp.asarray(z, jnp.float32)
    qlam = jnp.asarray([0.5], jnp.float32)

    s, i, fl, det = binned_energy_topk(
        zq, qlam, zj, xlam, 1.0, 0.5, k=k, tile=tile, interpret=True,
        block_b=1, return_det=True)
    assert np.asarray(fl)[0] == 1
    s_h = np.asarray(s)

    rs, ri = strided_energy_repair(
        np.asarray(zq), np.asarray(qlam), np.asarray(det),
        s_h[:, k - 1], np.asarray(i), zj, xlam, None, 1.0, 0.5,
        k=k, n=n, prepared=False)

    s2, i2 = _energy_oracle(zq, qlam, zj, xlam, 1.0, 0.5, k)
    np.testing.assert_array_equal(ri, np.asarray(i2))
    np.testing.assert_allclose(rs, np.asarray(s2), atol=1e-6)
    assert ri[0, :depth + 2].tolist() == sorted(dup_rows)


def test_strided_repair_fuzz_full_equality():
    """Randomised sweep with PLANTED duplicate storms: end-to-end
    through pallas_binned_topk_with_repair the result must equal the
    XLA oracle on EVERY row — flagged rows included (the earlier kernel
    fuzz excluded them).  Storm count 1-3 per query also exercises the
    multi-fired and MAX_FIRED-overflow (full-merge fallback) paths;
    fold variants sampled as in the kernel fuzz."""
    from arrowspace_tpu.ops.search import pallas_binned_topk_with_repair

    rng = np.random.default_rng(123)
    for trial in range(8):
        n = int(rng.integers(1500, 6000))
        f = int(rng.choice([8, 24, 48]))
        b = int(rng.integers(1, 5))
        k = int(rng.choice([4, 8, 13]))
        tile = int(rng.choice([256, 512]))
        lane_split = int(rng.choice([1, 2, 4]))
        pre_reduce = bool(rng.random() < 0.5) and lane_split > 1
        bins = tile // lane_split
        depth = binned_topk_depth_for(k)
        alpha = float(rng.choice([1.0, 0.9, 0.7]))

        q = np.asarray(rng.uniform(0.1, 1.0, (b, f)), np.float32)
        x = np.asarray(rng.uniform(0.1, 1.0, (n, f)), np.float32)
        n_storms = int(rng.integers(1, 4))
        for _ in range(n_storms):
            binpos = int(rng.integers(0, bins))
            qi = int(rng.integers(0, b))
            copies = depth + 1 + int(rng.integers(0, 3))
            for j in range(copies):
                g = binpos + j * bins
                if g < n:
                    x[g] = q[qi]
        qj = jnp.asarray(q)
        qlam = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)
        xj = jnp.asarray(x)
        xlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))

        rs, ri = pallas_binned_topk_with_repair(
            qj, qlam, xj, xlam, alpha, k=k, tile=tile, interpret=True,
            lane_split=lane_split, pre_reduce=pre_reduce)
        s2, i2 = _lambda_oracle(qj, qlam, xj, xlam, alpha, k)
        msg = (f"trial {trial} (n={n} f={f} b={b} k={k} a={alpha} "
               f"tile={tile} r={lane_split} pre={pre_reduce} "
               f"storms={n_storms})")
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(i2),
                                      err_msg=msg)
        np.testing.assert_allclose(np.asarray(rs), np.asarray(s2),
                                   atol=2e-5, err_msg=msg)


def test_warm_step_compiles_repair_program():
    """warm_step must sweep the synthetic flagged-row repair over the
    padded_take flag-count buckets when the step carries a det plane,
    with operands shaped exactly like the driver's (full-batch
    scores/ids/qlam, fired det rows) — the strided-repair chunk AND the
    per-bucket device programs (the energy session's z projection)
    otherwise compile on the first flagged batch in production."""
    from arrowspace_tpu.index import warm_step

    bsz, dim, k, bins = 4, 8, 3, 16

    def step(q):
        s = jnp.zeros((bsz, k), jnp.float32)
        ii = jnp.zeros((bsz, k + 1), jnp.int32)
        qlam = jnp.zeros((bsz,), jnp.float32)
        det = jnp.full((bsz, bins), NEG_INF, jnp.float32)
        return s, ii, qlam, det

    calls = []

    def repair(q_block, qlam, rows, scores=None, ids=None, det_rows=None):
        calls.append((np.asarray(rows).copy(), det_rows.copy(),
                      scores.shape, q_block.shape))
        return (np.zeros((len(rows), k), np.float32),
                np.zeros((len(rows), k), np.int32))

    warm_step(step, bsz, dim, np.float32, repair=repair, k=k)
    # bucket sweep 1,2,4,8,16 with rows clamped to the batch
    assert [len(c[0]) for c in calls] == [1, 2, 4, 4, 4]
    for rows, det_rows, s_shape, q_shape in calls:
        assert det_rows.shape == (len(rows), bins)
        assert (det_rows[:, 0] == 1.0).all()
        assert (det_rows[:, 1:] == NEG_INF).all()
        assert s_shape == (bsz, k)
        assert q_shape == (bsz, dim)

    # a 3-tuple step (merge/xla kernels) must not invoke repair
    calls.clear()

    def step3(q):
        return (jnp.zeros((bsz, k), jnp.float32),
                jnp.zeros((bsz, k + 1), jnp.int32),
                jnp.zeros((bsz,), jnp.float32))

    warm_step(step3, bsz, dim, np.float32, repair=repair, k=k)
    assert not calls


def test_stream_driver_routes_det_plane_to_repair():
    """The stream driver must fetch the det plane rows for flagged
    queries and hand the repair the (scores, ids, det_rows) keyword
    operands of the strided repair."""
    from arrowspace_tpu.index import stream_search

    bsz, k, bins = 4, 3, 8

    def step(q):
        s = jnp.tile(jnp.arange(k, 0, -1, dtype=jnp.float32), (bsz, 1))
        i = jnp.tile(jnp.arange(k, dtype=jnp.int32), (bsz, 1))
        fl = jnp.asarray([0, 1, 0, 0], dtype=jnp.int32)
        qlam = jnp.full((bsz,), 0.25, dtype=jnp.float32)
        det = jnp.full((bsz, bins), NEG_INF, dtype=jnp.float32)
        det = det.at[1, 5].set(9.0)
        return s, jnp.concatenate([i, fl[:, None]], axis=1), qlam, det

    seen = {}

    def repair(q_block, qlam, rows, scores=None, ids=None, det_rows=None):
        seen["rows"] = rows.copy()
        seen["det_rows"] = det_rows.copy()
        seen["kth"] = scores[rows, k - 1].copy()
        seen["ids"] = ids[rows].copy()
        return (np.full((len(rows), k), 9.0, np.float32),
                np.full((len(rows), k), 77, np.int32))

    out = list(stream_search(step, [np.ones((bsz, 8))], bsz, 1,
                             np.float32, repair=repair))
    s0, i0 = out[0]
    assert seen["rows"].tolist() == [1]
    assert seen["det_rows"].shape == (1, bins)
    assert seen["det_rows"][0, 5] == 9.0
    np.testing.assert_allclose(seen["kth"], [1.0])
    assert (i0[1] == 77).all() and (i0[0] == [0, 1, 2]).all()


def test_block_diag_dot_matches_batched():
    """_block_diag_dot (the matvec-rounding fix: per-row candidate dots
    restructured as ONE 2D matmul + block diagonal) must extract the
    right (i, i-th block) entries for every row count including R < 16
    (the zero-padded query block) and R = 1.  Exact equality is pinned
    against a plain 2D matmul of the same shape family (the whole point
    of the fix); the batched dot_general it replaced is only allclose —
    even on CPU a per-batch-element MATVEC rounds differently from a
    matmul, which is precisely the cross-program divergence the fix
    removed on chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from arrowspace_tpu.ops.bin_repair import _block_diag_dot

    rng = np.random.default_rng(5)
    for r in (1, 2, 3, 16, 20):
        for f in (8, 33):
            q = jnp.asarray(rng.normal(size=(r, f)).astype(np.float32))
            rows = jnp.asarray(
                rng.normal(size=(r, 7, f)).astype(np.float32))
            got = np.asarray(_block_diag_dot(q, rows, jnp.float32))
            # same-family reference: one 2D matmul over the flattened
            # candidate rows, sliced to the block diagonal
            flat = rows.reshape(r * 7, f)
            full = np.asarray(jax.jit(
                lambda a, b: jax.lax.dot_general(
                    a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))(
                        jnp.pad(q, ((0, max(16, r) - r), (0, 0))), flat))
            want = np.stack([full[i, i * 7:(i + 1) * 7] for i in range(r)])
            np.testing.assert_array_equal(got, want, err_msg=f"r={r} f={f}")
            batched = np.asarray(jax.lax.dot_general(
                q, rows, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
            np.testing.assert_allclose(got, batched, rtol=2e-6, atol=2e-6,
                                       err_msg=f"r={r} f={f}")
