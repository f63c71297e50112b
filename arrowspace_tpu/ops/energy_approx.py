"""Approximate-fold energy serving: chord-surrogate fold + pooled-d²
exact rescore + per-query margin certification.

The exact energy kernel (ops/pallas_bintopk._energy_kernel) is
per-pair-OP bound, not stream bound: at 1M x 64 B=2048 its rsqrt2 score
plane (~13 VPU ops + 2 rsqrt per pair) runs 18.5 ms where the λ kernel's
4-op plane on identical shapes runs 7.9 ms (benchmarks/energy_form_ab).
An exact per-pair plane cannot reach the 150k-QPS target (≤ ~13.6 ms);
this module replaces it with a cheaper plane that still returns EXACT
results — or flags the query.

The surrogate (a sound upper bound, the lever of the whole design):

    u(d²) = w_D / (1 + √d²)  is CONVEX and decreasing in d², so every
    secant chord lies ON OR ABOVE u inside its interval, and the MAX of
    chords over intervals covering [0, hi] — plus a flat floor u(hi)
    beyond (u is decreasing) — is ≥ u for EVERY d² ≥ 0.

The kernel folds  ŝ = max_j(a_j·d² + b_j) − w_λ·|Δλ|  (~12 VPU ops/pair,
NO transcendentals) into the binned top-D pool, carrying each pool
winner's d² VALUE as a payload plane.  The flush then

  1. rescores EVERY pool entry exactly — elementwise rsqrt2 on the
     pooled d² (which is bitwise the chunked oracle's d²: same
     (qn + xn) − 2·dot association, matmul-family dot) plus a (B, D·L)
     xlam gather: NO corpus row gather, no extra matmuls;
  2. takes the exact top-k by two-key (-score, id) sort — the oracle's
     lowest-global-index tie order;
  3. certifies the query iff its k-th exact score STRICTLY beats the
     miss-detector plane's max: every item NOT in the pool lost a
     surrogate comparison, so exact(i) ≤ surrogate(i) ≤ det — one test
     covers both the chord approximation AND deep bin collisions.
     Uncertified queries are FLAGGED and the caller re-runs them through
     the exact chunked scorer (the same degrade-to-oracle contract as
     the pruned session).

Chord knots are fitted PER QUERY inside the jitted step from a sampled
d² distribution (SAMPLE_ROWS corpus rows prepared once per session),
concentrated on the LOW-d² TAIL where the competitive scores live:
knots [0, a≈sample-min, c≈p10] with a flat floor u(c) — moments
(min/mean/std), no sort/top_k (a lax.top_k fit measured 6.0 ms of the
25 ms round-1 wrapper).  Knot placement affects only tightness (flag
rate), never soundness.  A float-slop lift (1e-6·w_D) on the intercepts
absorbs f32 evaluation noise between the kernel's chord arithmetic and
the oracle's rsqrt2 plane, keeping the upper-bound property at the bit
level.

Host sim (1M x 64, λ ~ U(0,1), wl=1, wd=0.5, k=10, 512 queries):
tail knots certify 512/512 at J=2 chords; the round-1 spread knots
([p0.1, p99.5], J=3) left a 2.2% uncertified tail on chip — sag at the
score cut, not candidate count, was the binding term (flags were 45/2048
at both m=54 and m=118).

MEASURED OUTCOME (r5, on chip, 1M x 64 B=2048 k=10 — benchmarks/
energy_approx_tpu.py + energy_approx_ab2.py): the throughput bet is
NEGATIVE.  Exact binned kernel 18.75 ms; this kernel 19.0-19.5 ms at
depth 3 (1.2 % flags), 17.28 ms at depth 2 but with 13.8 % flags
(surrogate-order sag defeats shallow pools — see the depth note in
binned_energy_topk_approx), and the larger resident block OOMs in
Mosaic (the 3·depth+1 pool planes + ~26 chord-body temps exceed scoped
VMEM at block 1024).  The cheaper plane's ~6-op saving is almost
exactly cancelled by the d²-payload selects riding the fold (~2.1 ms
per per-pair op at this shape), so a certified-exact surrogate CANNOT
beat the exact per-pair plane at 1M x 64 — the 150k-QPS target is
unreachable in this design family; the exact kernel stays the serving
default.  What the module DOES deliver: a zero-cost per-query
exactness certificate (certified rows are bitwise the chunked oracle —
proven ids AND scores on chip at k=10/64) with a 98.8 % certification
rate on random data, and the flag + exact-fallback contract.

Reference anchor: energymaps.rs:368-407 (search_energy semantics being
served); the reference has no serving kernel — this is a TPU-native
capability with the reference's exact scoring as its contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bintopk import (INT_MAX, NEG_INF, _init_bins, _padded_rows,
                             _resolve_layout, binned_topk_depth_for)

__all__ = ["prepare_energy_chord_sample", "binned_energy_topk_approx",
           "SAMPLE_ROWS"]

SAMPLE_ROWS = 1024


def prepare_energy_chord_sample(z_prepared, z_norms, n: int, seed: int = 0):
    """One-time sampled-row gather for the per-query chord fit.

    Picks min(SAMPLE_ROWS, n) distinct REAL row indices (host RNG — the
    sample only steers knot placement, never soundness) and gathers
    their z rows + norms from the prepared corpus.  Returns
    (z_samp (S, G), xn_samp (S,))."""
    s = min(SAMPLE_ROWS, int(n))
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.choice(int(n), size=s, replace=False))
    return jnp.take(z_prepared, ids, axis=0), jnp.take(z_norms, ids, axis=0)


def _fit_chords(z_q, qn, z_samp, xn_samp, wd):
    """Per-query tail-knot chord coefficients for the surrogate bound.

    Knots [0, a, c] in d²-space from sample MOMENTS (min / mean − 1.28σ
    ≈ p10 for the near-normal d² of wide-G data): the competitive
    region is the low tail, so both chords and the flat floor u(c)
    concentrate the approximation there — sag at the score cut ~1e-4
    instead of the ~1e-3 of range-spanning knots.  Returns
    (ca (B, 2), cb (B, 3)) f32: two chord slopes, two intercepts + the
    floor, every intercept lifted by 1e-6·w_D so the f32-evaluated
    segment max stays ≥ the oracle's f32 u at every d² ≥ 0."""
    dt = z_q.dtype
    dots = jnp.dot(z_q, z_samp.T, preferred_element_type=dt)    # (B, S)
    d2s = (qn[:, None] + xn_samp[None, :]) - 2.0 * dots
    mn = jnp.min(d2s, axis=1)
    mu = jnp.mean(d2s, axis=1)
    sd = jnp.sqrt(jnp.maximum(
        jnp.mean(d2s * d2s, axis=1) - mu * mu, 0.0))
    a_k = jnp.maximum(jnp.asarray(1e-6, dt), 0.9 * mn)
    c_k = jnp.maximum(a_k * 1.69 + 1e-3, mu - 1.28 * sd)
    g0 = wd
    g1 = wd / (1.0 + jnp.sqrt(a_k))
    g2 = wd / (1.0 + jnp.sqrt(c_k))
    a1 = (g1 - g0) / a_k
    a2 = (g2 - g1) / (c_k - a_k)
    lift = wd * 1e-6
    b1 = jnp.broadcast_to(g0 + lift, a_k.shape)
    b2 = g1 - a2 * a_k + lift
    # the flat floor u(c_k) is chord 2 evaluated at a CLAMPED abscissa:
    # max(chord1(d²), chord2(min(d², c_k))) — one min instead of a
    # third segment's fma + max in the per-pair kernel plane.  Sound:
    # chord2 is a secant of convex u on [a, c] (≥ u there), below a
    # chord1 dominates, past c the clamp pins chord2 at g2 = u(c) ≥ u.
    ca = jnp.stack([a1, a2], axis=1).astype(jnp.float32)
    cb = jnp.stack([b1, b2, c_k], axis=1).astype(jnp.float32)
    return ca, cb


def _fold_tile_d2(run_refs, scores, gidx, d2, depth: int):
    """Depth-D insertion with a d² payload riding each (score, idx)
    pool entry — the payload follows its owner through the levels so
    every pool slot holds a consistent (surrogate, id, d²) triple.
    Strict > keeps the earliest arrival on ties (pallas_bintopk.
    _fold_tile's lax.top_k tie contract)."""
    run_s = run_refs[:depth]
    run_i = run_refs[depth:2 * depth]
    run_d = run_refs[2 * depth:3 * depth]
    det = run_refs[3 * depth]
    c, ci, cd = scores, gidx, d2
    for d in range(depth):
        rs, ri, rd = run_s[d][:], run_i[d][:], run_d[d][:]
        up = c > rs
        run_s[d][:] = jnp.where(up, c, rs)
        run_i[d][:] = jnp.where(up, ci, ri)
        run_d[d][:] = jnp.where(up, cd, rd)
        c = jnp.where(up, rs, c)
        ci = jnp.where(up, ri, ci)
        cd = jnp.where(up, rd, cd)
    det[:] = jnp.maximum(det[:], c)          # the (D+1)-th surrogate


def _init_bins_d2(run_refs, depth: int):
    _init_bins(run_refs[:2 * depth] + (run_refs[3 * depth],), depth)
    for d in range(depth):
        run_refs[2 * depth + d][:] = jnp.zeros_like(run_refs[2 * depth + d])


def _fold_subtiles_d2(run_refs, tile_scores, depth, lane_split,
                      pre_reduce):
    """pallas_bintopk._fold_subtiles with the d² payload: the
    pre-reduce max-combine carries the winner's d² (one extra select
    per pair); the discarded losers' running max still feeds the miss
    detector, so the certification (kth > det) stays sound."""
    if pre_reduce and lane_split > 1:
        c, ci, cd = tile_scores(0)
        lmax = None
        for j in range(1, lane_split):
            sj, gj, dj = tile_scores(j)
            up = sj > c
            loser = jnp.minimum(sj, c)
            lmax = loser if lmax is None else jnp.maximum(lmax, loser)
            c = jnp.where(up, sj, c)
            ci = jnp.where(up, gj, ci)
            cd = jnp.where(up, dj, cd)
        _fold_tile_d2(run_refs, c, ci, cd, depth)
        det = run_refs[3 * depth]
        det[:] = jnp.maximum(det[:], lmax)
    else:
        for j in range(lane_split):
            scores, gidx, d2 = tile_scores(j)
            _fold_tile_d2(run_refs, scores, gidx, d2, depth)


def _chord_kernel(zq_ref, qn_ref, qlam_ref, zx_ref, xn_ref, xlam_ref,
                  ca_ref, cb_ref, wl_ref, n_ref, *run_refs, tile: int,
                  depth: int, lane_split: int = 1,
                  pre_reduce: bool = False):
    """Surrogate-plane kernel: per-pair work is the oracle's d² (SAME
    (qn + xn) − 2·dot association, so the pooled payload is bitwise the
    chunked oracle's d²), the 2-chord + floor upper bound of the
    Dirichlet term, and the λ term — ~12 VPU ops/pair, no
    transcendentals.  Exactness lives in the WRAPPER (pooled-d² rescore
    + certification), not here."""
    t = pl.program_id(0)
    bins = tile // lane_split

    @pl.when(t == 0)
    def _init():
        _init_bins_d2(run_refs, depth)

    base = t * tile
    n = n_ref[0, 0]

    def _body_for(masked: bool):
        wl = wl_ref[0, 0]
        zq = zq_ref[:]                               # (B, G)
        qn = qn_ref[:].reshape(-1, 1)
        qlam = qlam_ref[:].reshape(-1, 1)
        a1 = ca_ref[:, 0:1]
        a2 = ca_ref[:, 1:2]
        b1 = cb_ref[:, 0:1]
        b2 = cb_ref[:, 1:2]
        ck = cb_ref[:, 2:3]
        local = jax.lax.broadcasted_iota(jnp.int32, (zq.shape[0], bins), 1)

        def tile_scores(j):
            zx = zx_ref[j * bins:(j + 1) * bins, :]  # (bins, G)
            dot = jax.lax.dot_general(
                zq, zx, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (B, bins)
            # d² in the ORACLE's association ((qn + xn) − 2·dot —
            # energymaps._energy_score_topk_chunked / bin_repair.
            # _energy_repair_chunk) so the pooled payload rescoring is
            # bitwise the oracle's arithmetic
            d2 = (qn + xn_ref[j * bins:(j + 1) * bins].reshape(1, -1)) \
                - 2.0 * dot
            # two segments, floor folded into chord 2's clamped
            # abscissa (see _fit_chords) — 1 min + 2 fma + 1 max
            u = jnp.maximum(d2 * a1 + b1,
                            jnp.minimum(d2, ck) * a2 + b2)
            d_lam = jnp.abs(qlam - xlam_ref[j * bins:(j + 1) * bins]
                            .reshape(1, -1))
            scores = u - wl * d_lam
            gidx = local + (base + j * bins)
            if masked:
                scores = jnp.where(gidx < n, scores, NEG_INF)
            return scores, gidx, d2

        _fold_subtiles_d2(run_refs, tile_scores, depth, lane_split,
                          pre_reduce)

    @pl.when(base + tile <= n)
    def _interior():
        _body_for(masked=False)

    @pl.when((base < n) & (base + tile > n))
    def _boundary():
        _body_for(masked=True)


@functools.partial(jax.jit, static_argnames=(
    "k", "depth", "tile", "interpret", "block_b", "lane_split",
    "pre_reduce", "n_items"))
def binned_energy_topk_approx(
    z_q: jax.Array,            # (B, G) — queries in z-space
    query_lambdas: jax.Array,  # (B,)
    z_items: jax.Array,        # (n_pad, G) — PREPARED corpus
    item_lambdas: jax.Array,   # (n_pad,) — prepared
    w_lambda,
    w_dirichlet,
    z_samp: jax.Array,         # (S, G) — prepare_energy_chord_sample
    xn_samp: jax.Array,        # (S,)
    *,
    k: int,
    n_items: int,              # true N (prepared corpora only)
    z_norms: jax.Array,        # (n_pad,) prepared ||z||²
    depth: int = 0,
    tile: int = 0,
    interpret: bool = False,
    block_b: int = 0,
    lane_split: int = 0,
    pre_reduce=None,
):
    """Certified-exact energy top-k on the chord-surrogate plane.

    Returns (scores (B, k), indices (B, k), flags (B,) int32).
    flags[b] == 0 certifies row b EXACT — bitwise the chunked oracle's
    scores and ids (search_energy semantics, energymaps.rs:368-407,
    lowest-global-index tie order).  flags[b] == 1 means certification
    failed (the best pruned surrogate bound reached the k-th exact
    score) and the caller MUST re-run that row through the exact
    chunked scorer; returned values for flagged rows are best-effort
    only.

    Requires a prepared corpus (prepare_binned_energy_corpus) and the
    chord sample (prepare_energy_chord_sample) — this is a serving-rate
    path; ad-hoc calls belong to binned_energy_topk."""
    assert n_items > 0 and z_norms is not None, \
        "approx kernel requires a prepared corpus"
    bsz, g = z_q.shape
    n = n_items
    dt = jnp.float32
    if depth <= 0:
        # SAME depth as the exact kernel — measured, not assumed
        # (benchmarks/energy_approx_ab2.py, 1M x 64 B=2048 k=10 on
        # chip): depth 2 runs 17.28 ms but flags 283/2048 (13.8 %),
        # depth 3 runs 19.54 ms at 25/2048 (1.2 %).  The naive
        # collision model (C(k,3)/bins² ≈ 0.7 %) under-counts depth-2
        # flags ~20x because the pool ranks by SURROGATE order: chord
        # sag compresses the competitive band, so exact-top-k items
        # lose surrogate comparisons to sag-level neighbours far more
        # often than uniform-hash collisions suggest.  At a 14 % flag
        # rate every served batch pays the exact-fallback rescan, which
        # costs more than the 2.3 ms the shallower fold saves.
        depth = binned_topk_depth_for(k)
    # planes calibrated from measured scoped-VMEM OOMs, not the body's
    # live-set count: Mosaic's stack allocator charges the chord body
    # ~26 (block, bins) temp planes (measured 17.0M/18.1M at block 1024
    # against the 16M limit — per-query chord columns broadcast to full
    # planes, the d² payload selects, and the pre-reduce combine) where
    # the exact energy kernel's body charges ~7.  planes_pre=28 lands
    # the resident block at 512; the extra corpus streams at B=2048
    # (4 vs 2) cost ~0.6 ms of HBM against a per-pair-op-bound kernel.
    block_b, tile, lane_split, pre_reduce = _resolve_layout(
        bsz, n, g, k, depth, False, block_b, lane_split, tile,
        pre_reduce, planes_plain=12, planes_pre=28)
    max_b = block_b

    if bsz % max_b != 0:
        pad_b = max_b - bsz % max_b
        qp = jnp.pad(z_q, ((0, pad_b), (0, 0)))
        qlp = jnp.pad(query_lambdas, (0, pad_b))
        outs = binned_energy_topk_approx(
            qp, qlp, z_items, item_lambdas, w_lambda, w_dirichlet,
            z_samp, xn_samp, k=k, n_items=n_items, z_norms=z_norms,
            depth=depth, tile=tile, interpret=interpret,
            block_b=block_b, lane_split=lane_split, pre_reduce=pre_reduce)
        return tuple(o[:bsz] for o in outs)

    if bsz > max_b:
        outs = [binned_energy_topk_approx(
            z_q[i:i + max_b], query_lambdas[i:i + max_b], z_items,
            item_lambdas, w_lambda, w_dirichlet, z_samp, xn_samp, k=k,
            n_items=n_items, z_norms=z_norms, depth=depth, tile=tile,
            interpret=interpret, block_b=block_b, lane_split=lane_split,
            pre_reduce=pre_reduce)
            for i in range(0, bsz, max_b)]
        return tuple(jnp.concatenate([o[j] for o in outs], axis=0)
                     for j in range(len(outs[0])))

    n_pad = _padded_rows(n, tile)
    assert z_items.shape[0] == n_pad, (z_items.shape, n_pad)
    zq = z_q.astype(dt)
    qlam = query_lambdas.astype(dt)
    qn = jnp.sum(zq * zq, axis=1)
    wl_d = jnp.asarray(w_lambda, dtype=dt)
    wd_d = jnp.asarray(w_dirichlet, dtype=dt)
    ca, cb = _fit_chords(zq, qn, z_samp.astype(dt), xn_samp.astype(dt),
                         wd_d)
    n_tiles = n_pad // tile
    bins = tile // lane_split
    assert k <= depth * bins, (k, depth, bins)

    pool_spec = pl.BlockSpec((bsz, bins), lambda t: (0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bsz, g), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),      # z_q (replicated)
            pl.BlockSpec((bsz,), lambda t: (0,),
                         memory_space=pltpu.VMEM),      # qn
            pl.BlockSpec((bsz,), lambda t: (0,),
                         memory_space=pltpu.VMEM),      # qlam
            pl.BlockSpec((tile, g), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),      # z tile
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),      # xn tile
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),      # xlam tile
            pl.BlockSpec((bsz, 2), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),      # chord slopes
            pl.BlockSpec((bsz, 3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),      # intercepts+floor
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),      # w_lambda
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),      # true N
        ],
        out_specs=tuple([pool_spec] * (3 * depth + 1)),
    )

    kernel = functools.partial(_chord_kernel, tile=tile, depth=depth,
                               lane_split=lane_split,
                               pre_reduce=pre_reduce)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((bsz, bins), dt)] * depth
            + [jax.ShapeDtypeStruct((bsz, bins), jnp.int32)] * depth
            + [jax.ShapeDtypeStruct((bsz, bins), dt)] * depth   # d² pool
            + [jax.ShapeDtypeStruct((bsz, bins), dt)]),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_pad * g,
            bytes_accessed=n_pad * (g + 2) * 4 + bsz * (g + 8) * 4
            + bsz * bins * (3 * depth + 1) * 4,
            transcendentals=0,
        ),
    )(zq, qn, qlam, z_items, z_norms, item_lambdas, ca, cb,
      wl_d.reshape(1, 1),
      jnp.asarray(n, dtype=jnp.int32).reshape(1, 1))

    return _flush_rescore_certify(outs, depth, k, qlam, item_lambdas,
                                  wl_d, wd_d)


def _flush_rescore_certify(outs, depth: int, k: int, qlam, xlam, wl, wd):
    """Exact top-k from the surrogate pool (module docstring steps 1-3).

    The rescore copies the chunked oracle's arithmetic expression-for-
    expression on the POOLED d² (bitwise the oracle's d² — same
    association, matmul-family dot), so certified rows return the
    oracle's bits without touching the corpus again.  One two-key sort
    on the EXACT scores gives the oracle's tie order; certification is
    kth > max(det): any non-pool item lost a surrogate comparison, so
    its exact score ≤ its surrogate ≤ det — the one strict inequality
    covers both chord sag and deep bin collisions, ties included."""
    pool_s = jnp.concatenate(outs[:depth], axis=1)           # (B, D·L)
    pool_i = jnp.concatenate(outs[depth:2 * depth], axis=1)
    pool_d = jnp.concatenate(outs[2 * depth:3 * depth], axis=1)
    det = outs[3 * depth]                                    # (B, L)

    valid = pool_s > NEG_INF
    # exact rescore — bin_repair._energy_repair_chunk's expressions
    d2c = jnp.clip(pool_d, jnp.finfo(pool_d.dtype).tiny,
                   jnp.finfo(pool_d.dtype).max * 0.5)
    s_dir = d2c * jax.lax.rsqrt(d2c)
    u = wd * jax.lax.rsqrt(1.0 + 2.0 * s_dir + d2c)
    lam_g = jnp.take(xlam, jnp.where(valid, pool_i, 0), axis=0)
    d_lam = jnp.abs(qlam[:, None] - lam_g)
    sc = u - wl * d_lam                                      # shifted plane
    sc = jnp.where(valid, sc, NEG_INF)
    ids = jnp.where(valid, pool_i, INT_MAX)

    sneg, sidx = jax.lax.sort((-sc, ids), num_keys=2, dimension=1)
    out_s = -sneg[:, :k]
    out_i = sidx[:, :k]

    kth = out_s[:, k - 1]
    certified = (kth > jnp.max(det, axis=1)) & (kth > NEG_INF)
    flags = jnp.where(certified, 0, 1).astype(jnp.int32)
    # restore the +w_D shift AFTER the sort and the flag compare (both
    # run on shifted-plane values), exactly like the exact kernel flush
    return out_s - wd, out_i, flags
