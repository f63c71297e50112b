"""Chord-surrogate energy serving (ops/energy_approx).

Contract under test: certified (unflagged) rows equal the exact chunked
oracle (_energy_score_topk_chunked) — ids exactly (lowest-global-id tie
order), scores to f32 eval noise on CPU (the bitwise claim is chip-
proven, like the other kernels') — and the surrogate plane is a SOUND
upper bound of the exact score for every pair, which is what makes the
certification exact rather than approximate.

Reference anchor: energymaps.rs:368-407 (the search_energy scoring the
certified results must reproduce).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arrowspace_tpu.energymaps import _energy_score_topk_chunked
from arrowspace_tpu.ops.energy_approx import (
    _fit_chords, binned_energy_topk_approx, prepare_energy_chord_sample)
from arrowspace_tpu.ops.pallas_bintopk import _padded_rows


def _data(n, g, b, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        cents = rng.normal(size=(16, g)) * 2
        z = (cents[rng.integers(0, 16, n)]
             + rng.normal(0, 0.5, (n, g))).astype(np.float32)
        zq = (z[rng.integers(0, n, b)] * 1.02).astype(np.float32)
    else:
        z = rng.normal(size=(n, g)).astype(np.float32)
        zq = rng.normal(size=(b, g)).astype(np.float32)
    lam = rng.uniform(0, 1, n).astype(np.float32)
    qlam = rng.uniform(0, 1, b).astype(np.float32)
    return (jnp.asarray(zq), jnp.asarray(qlam), jnp.asarray(z),
            jnp.asarray(lam))


def _prepared(z, lam, tile):
    """Manual prepare at a pinned (test-sized) tile, mirroring
    _prepare_energy_jit: pad + norms with the oracle's reduce."""
    n = z.shape[0]
    n_pad = _padded_rows(n, tile)
    zx = jnp.pad(z.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    xlam = jnp.pad(lam.astype(jnp.float32), (0, n_pad - n))
    xn = jnp.sum(zx * zx, axis=1)
    return zx, xlam, xn


def _run_approx(zq, qlam, z, lam, wl, wd, k, tile=32, block_b=4,
                seed=0):
    zx, xlam, xn = _prepared(z, lam, tile)
    z_samp, xn_samp = prepare_energy_chord_sample(zx, xn, z.shape[0],
                                                  seed=seed)
    s, i, fl = binned_energy_topk_approx(
        zq, qlam, zx, xlam, wl, wd, z_samp, xn_samp, k=k,
        n_items=z.shape[0], z_norms=xn, tile=tile,
        block_b=block_b, interpret=True)
    return np.asarray(s), np.asarray(i), np.asarray(fl)


# ------------------------------------------------------------ soundness


def test_chord_surrogate_dominates_exact_everywhere():
    """Brute-force: the fitted 2-chord+floor plane evaluated the
    kernel's way (f32, at d² = (qn + xn) − 2·q·x) is >= the oracle's
    f64 u for EVERY (query, item) pair — the inequality certification
    rests on."""
    for seed, clustered in ((0, False), (1, True)):
        zq, qlam, z, lam = _data(3000, 24, 8, seed=seed,
                                 clustered=clustered)
        zx, xlam, xn = _prepared(z, lam, 32)
        z_samp, xn_samp = prepare_energy_chord_sample(zx, xn, 3000,
                                                      seed=seed)
        qn = jnp.sum(zq * zq, axis=1)
        wd = jnp.float32(0.5)
        ca, cb = jax.device_get(_fit_chords(zq, qn, z_samp, xn_samp, wd))
        zqh, znh, xnh = (np.asarray(zq), np.asarray(z, np.float32),
                         np.asarray(jnp.sum(z * z, axis=1), np.float32))
        qnh = np.asarray(qn)
        for b in range(8):
            # f32 d² in the kernel's association
            d2f = ((np.float32(qnh[b]) + xnh)
                   - np.float32(2.0) * (znh @ zqh[b])).astype(np.float32)
            sur = np.maximum(
                ca[b, 0] * d2f + cb[b, 0],
                ca[b, 1] * np.minimum(d2f, cb[b, 2]) + cb[b, 1])
            d2 = np.float64(qnh[b]) + xnh.astype(np.float64) \
                - 2.0 * (znh.astype(np.float64) @ zqh[b].astype(np.float64))
            exact = 0.5 / (1.0 + np.sqrt(np.maximum(d2, 0.0)))
            assert (sur >= exact).all(), \
                (seed, b, float((exact - sur).max()))


# ------------------------------------------------- certified exactness


@pytest.mark.parametrize("n,k,clustered",
                         [(3000, 8, False), (2048, 10, True),
                          (777, 5, False)])
def test_approx_certified_rows_match_chunked_oracle(n, k, clustered):
    zq, qlam, z, lam = _data(n, 24, 6, seed=n, clustered=clustered)
    s1, i1, fl = _run_approx(zq, qlam, z, lam, 1.0, 0.5, k)
    s2, i2 = _energy_score_topk_chunked(zq, qlam, z, lam,
                                        jnp.float32(1.0), jnp.float32(0.5),
                                        k=k, chunk=512)
    s2, i2 = np.asarray(s2), np.asarray(i2)
    assert fl.shape == (6,)
    certified = int((fl == 0).sum())
    assert certified >= 1, "no query certified on benign data"
    for b in range(6):
        if fl[b] == 0:
            np.testing.assert_array_equal(i1[b], i2[b])
            # CPU-only slack: d² = (qn+xn) − 2·dot cancels catastrophic-
            # ally for near-duplicate pairs and the rsqrt plane amplifies
            # a one-ulp dot difference by ~wd/(2·√d²); the TPU matmul-
            # family guarantee (kernel dot ≡ oracle dot bitwise) is chip-
            # only — benchmarks/energy_approx_tpu.py proves 0.0 there.
            np.testing.assert_allclose(s1[b], s2[b], atol=5e-5)


def test_approx_block_padding_and_chunking():
    """B not a multiple of the block (pad path) and B larger than the
    block (chunk path) keep the certified-row contract."""
    zq, qlam, z, lam = _data(900, 16, 5, seed=7)
    s1, i1, fl = _run_approx(zq, qlam, z, lam, 0.7, 1.3, 6,
                             tile=256, block_b=2)
    s2, i2 = _energy_score_topk_chunked(zq, qlam, z, lam,
                                        jnp.float32(0.7), jnp.float32(1.3),
                                        k=6, chunk=512)
    s2, i2 = np.asarray(s2), np.asarray(i2)
    assert fl.shape == (5,)
    for b in range(5):
        if fl[b] == 0:
            np.testing.assert_array_equal(i1[b], i2[b])
            np.testing.assert_allclose(s1[b], s2[b], atol=1e-6)


def test_approx_duplicate_tie_order():
    """Duplicate z rows across the corpus: certified results keep the
    oracle's lowest-global-index tie order (two-key candidate sort)."""
    rng = np.random.default_rng(11)
    n, g, k = 900, 16, 6
    z = rng.normal(size=(n, g))
    for j in (5, 5 + 256, 5 + 512, 300):
        z[j] = z[5]
    lam = np.full(n, 0.4, np.float32)
    zq = jnp.asarray(z[5][None, :].repeat(2, axis=0), jnp.float32)
    qlam = jnp.asarray([0.4, 0.4], jnp.float32)
    zj = jnp.asarray(z, jnp.float32)
    lamj = jnp.asarray(lam)
    s1, i1, fl = _run_approx(zq, qlam, zj, lamj, 1.0, 0.5, k,
                             tile=256, block_b=2)
    s2, i2 = _energy_score_topk_chunked(zq, qlam, zj, lamj,
                                        jnp.float32(1.0), jnp.float32(0.5),
                                        k=k, chunk=512)
    for b in range(2):
        if fl[b] == 0:
            np.testing.assert_array_equal(i1[b], np.asarray(i2)[b])
            assert list(i1[b][:4]) == [5, 261, 517, 300]


def test_approx_flags_when_margin_vanishes():
    """A corpus of near-identical rows ties every score at the k-th
    boundary: certification MUST fail (strict margin), never silently
    return an uncertified ranking."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(16,)).astype(np.float32)
    z = np.tile(base, (600, 1)) + rng.normal(0, 1e-7, (600, 16)) \
        .astype(np.float32)
    lam = np.full(600, 0.5, np.float32)
    zq = jnp.asarray(base[None, :] * 1.01, jnp.float32)
    s, i, fl = _run_approx(zq, jnp.asarray([0.5], jnp.float32),
                           jnp.asarray(z), jnp.asarray(lam),
                           1.0, 0.5, 8)
    assert fl[0] == 1


def test_approx_rejects_unprepared():
    zq, qlam, z, lam = _data(500, 16, 2, seed=9)
    with pytest.raises(AssertionError, match="prepared"):
        binned_energy_topk_approx(
            zq, qlam, z, lam, 1.0, 0.5, z[:64], jnp.sum(z[:64] ** 2, 1),
            k=5, n_items=0, z_norms=None, interpret=True)


# ------------------------------------------------------------- session


def test_energy_session_approx_matches_exact_session(monkeypatch):
    """EnergySearchSession(approx=True) must return exactly what the
    exact binned session returns (certified rows bitwise at equal
    precision; uncertified rows via the chunked fallback) — forced onto
    the f32 binned path with interpret-mode kernels."""
    import arrowspace_tpu.energymaps as em_mod
    import arrowspace_tpu.index as ix_mod
    import arrowspace_tpu.ops.energy_approx as ea_mod
    import arrowspace_tpu.ops.pallas_bintopk as bk_mod
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.energymaps import EnergyParams, build_energy
    from arrowspace_tpu.index import ArrowIndex

    rng = np.random.default_rng(5)
    centers = rng.uniform(0, 1, (40, 16))
    rows = centers[rng.integers(0, 40, 800)] \
        + rng.normal(0, 0.02, (800, 16))
    b = (ArrowSpaceBuilder().with_seed(7).with_dims_reduction(True, 0.3)
         .with_inline_sampling(None))
    aspace, gl = build_energy(
        b, rows.tolist(),
        EnergyParams(split_quantile=0.2, allow_tall_graphs=True))
    idx = ArrowIndex(aspace, gl, b)
    # force the f32 binned serving path on CPU
    aspace.data = aspace.data.astype(jnp.float32)
    aspace.lambdas = aspace.lambdas.astype(jnp.float32)
    if getattr(aspace, "signals", None) is not None \
            and np.shape(aspace.signals)[0] > 0:
        aspace.signals = jnp.asarray(aspace.signals, jnp.float32)
    if getattr(aspace, "_energy_z_cache", None) is not None:
        aspace._energy_z_cache = None
    monkeypatch.setattr(em_mod, "_use_binned_energy", lambda n, k, g: True)

    orig_exact = bk_mod.binned_energy_topk
    orig_approx = ea_mod.binned_energy_topk_approx
    seen = {"flags": []}

    # interpret only — tile/block must stay auto so the kernels match
    # the session's prepared (auto-layout bucket-padded) corpus
    def interp_exact(*a, **kw):
        kw.setdefault("interpret", True)
        return orig_exact(*a, **kw)

    def interp_approx(*a, **kw):
        kw.setdefault("interpret", True)
        s, i, fl = orig_approx(*a, **kw)
        # force one uncertified row so the exact-binned fallback path
        # (index.binned_fallback) is exercised — the fallback must
        # reproduce the exact session bitwise for a certifiable row too
        fl = fl.at[0].set(1)
        seen["flags"].append(fl)
        return s, i, fl

    monkeypatch.setattr(bk_mod, "binned_energy_topk", interp_exact)
    monkeypatch.setattr(ea_mod, "binned_energy_topk_approx", interp_approx)
    # fresh step cache so the patched kernels are traced in
    monkeypatch.setattr(ix_mod, "_ENERGY_STEP", None)

    queries = (rows[rng.integers(0, 800, 8)] * 1.01).astype(np.float32)
    exact_sess = idx.make_energy_session(batch_size=8, k=5)
    (se, ie), = list(exact_sess.search_stream([queries]))
    approx_sess = idx.make_energy_session(batch_size=8, k=5, approx=True)
    assert approx_sess.kernel == "binned_approx"
    (sa, ia), = list(approx_sess.search_stream([queries]))
    np.testing.assert_array_equal(ia, ie)
    np.testing.assert_allclose(sa, se, atol=1e-6)
    assert seen["flags"], "approx kernel was not dispatched"


def test_energy_session_approx_requires_binned_path():
    """approx=True off the binned path (CPU chunked here) must raise,
    not silently serve unaccelerated."""
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.energymaps import EnergyParams, build_energy
    from arrowspace_tpu.index import ArrowIndex

    rng = np.random.default_rng(6)
    rows = rng.uniform(0, 1, (300, 16))
    b = (ArrowSpaceBuilder().with_seed(3).with_dims_reduction(True, 0.3)
         .with_inline_sampling(None))
    aspace, gl = build_energy(
        b, rows.tolist(),
        EnergyParams(split_quantile=0.2, allow_tall_graphs=True))
    idx = ArrowIndex(aspace, gl, b)
    with pytest.raises(ValueError, match="approx"):
        idx.make_energy_session(batch_size=4, k=5, approx=True)
