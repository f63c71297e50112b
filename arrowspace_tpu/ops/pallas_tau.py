"""Pallas TPU kernel: fused τ selection (median / percentile / mean).

τ-median is the most expensive op in the λτ index pipeline on TPU: XLA's
generic row sort costs ~47 ms device time at 1M×128 — 10× the λ matmuls.
A jnp-level bitonic network is even slower (per-stage lane permutes lower
to HBM gathers).  This kernel keeps the whole sort in registers/VMEM:

- the feature axis sits on the lane dimension;
- bitonic exchanges at distance j use two cyclic ``pltpu.roll``s (the XOR
  partner col^j is col+j or col-j depending on bit j) plus masked
  min/max selects — no HBM traffic between stages;
- non-finite values are mapped to +inf (sort last), the finite count m is
  computed per row, and the order statistics ((m-1)//2, m//2 for median,
  round((m-1)·p) for percentile) are extracted with one-hot reductions;
- TAU_FLOOR and the empty-row fallback match taumode.select_tau exactly.

Each item row is read exactly once; output is the (N,) τ vector.

Alternatives evaluated (measured, so they are not re-guessed):
- jnp-level bitonic network outside Pallas: 3.4× SLOWER than jnp.sort at
  1M×128 on v5e (168 ms vs 50 ms wall) — each of the 28 stages' lane
  permutes lowers to a full-array HBM gather.  The in-register variant
  here is the same network with pltpu.roll keeping exchanges on-chip.
- bit-level binary-search SELECTION ("bisect*" layouts, r4): the r3
  analysis rejected it at ~370 est. vector ops vs the bitonic's ~140,
  but that both overestimated the selection (the exact median's second
  statistic needs ONE extra masked min, not a second 32-pass search;
  a pass is compare+count ≈ 3 element-ops) and underestimated the sort
  (a pltpu.roll measures ~3× its naive op count).  Measured on v5e
  (benchmarks/tau_select_ab.py, tau_mm_ab): τ 1M×128 13.39 → 11.97 ms,
  fused τ+λ 17.59 → 15.5-15.7 ms, and τ 500k×384 27.82 → 14.17
  ("bisect") → 11.71 ms ("bisect_mm", counts on the idle MXU as a
  ones-matvec) — the wide-F win is 2.4× because selection skips the
  pad to the next power of two and scales with VALUE BITS (32 passes)
  instead of log²(f2) exchange stages.  At F=128 the gain is only
  ~1.13×: the count-reduce is latency-bound (sequential pass chain,
  cross-vreg reduce trees), not throughput-bound, so the ~1.75×
  op-count advantage does not fully cash.  bisect_lane (counts along
  lanes) measured 2.3× WORSE than bisect — lane reduces are the
  expensive axis, as with the sort.
- 4-ary bisection ("bisect4*", r4): three midpoints per pass, 17-deep
  chain instead of 32 — the latency-bound hypothesis predicted a win,
  but MEASURED SLOWER everywhere on v5e (benchmarks/tau_bisect4_ab.py:
  τ 1M×128 12.42 → 13.82 ms, fused 15.47 → 17.35 ms, 500k×384 mm
  11.92 → 13.45 ms; chip parity EXACT): Mosaic serialises the three
  counts, so the ~1.6× op increase is paid in full while the chain
  shortening is not — the count-reduce chain is closer to throughput-
  bound than the r3 note suggested.  Layouts stay selectable for
  re-measurement on other TPU generations.
- a 256-bucket histogram select: Mosaic has no per-lane scatter, so a
  per-row histogram is 256 masked reductions — strictly dominated by
  the 32-pass bisection.
- approximate/bf16 medians are out: τ feeds λ directly and select_tau
  parity with the reference is exact (tests pin it; all bisect layouts
  are bitwise-exact too — selection returns elements, and the even-m
  mean uses the same 0.5·(lo+hi) arithmetic).
- hoisting the lane-index masks to (1, f2) broadcasts (r3): measured
  NEUTRAL (25.1 vs 24.5 ms amortised for the fused kernel at 1M×128) —
  Mosaic already constant-folds iota-derived masks; the cost sits in
  the pltpu.roll pairs themselves (τ-alone measures ~21 ms of the
  fused 25 ms, ~3× the naive op-count estimate, i.e. a lane rotate
  lowers to several micro-ops).  Kept the (1, f2) form as the clearer
  statement of intent.
- MXU identity-matmul transpose for the sublane layout ("sublane_mm"):
  NOT exact on the real chip (measured max |Δτ| 9.2e-4 at 4096×128 —
  the f32 MXU matmul truncates operands), and no faster than the plain
  Mosaic relayout transpose (13.78 vs 13.52 ms at 1M×128).  τ parity
  is bitwise by contract, so it is measurement-only.

WHY THE FUSED λτ KERNEL DOES NOT GET 2x FASTER (r5, VERDICT-r4 item 3):
the kernel is AT its vector-unit roofline, and every pass-reduction
idea falls to arithmetic or a prior measurement.  The honest model
(bench.py PEAK_VPU_OPS = one (8,128) vector ALU op/cycle at 940 MHz ≈
0.96e12 element-ops/s): a bisection pass costs ~3 ops/element (compare,
select-to-int, reduce-add), so exact selection = 32·3·F ops/item; with
the λ chain's ~30·F element stages the fused kernel's 1M×128 attainable
is ~17 ms — it measures 15.5-15.7 ms (compare/select fusion beats the
conservative count).  The old "4.5% of roofline" quoted this VPU work
against the MXU peak.  Attacks considered and closed:
- bisect4 (fewer, fatter passes): MEASURED NEGATIVE r4 (above).
- MXU counting in the fused kernel: MEASURED NEUTRAL r4 (tau_mm_ab,
  15.44 vs 15.58) — the (1,F)x(F,T) count matvec is M=1 latency-bound,
  so freeing VPU compare work only moves the clock to a 32-deep matvec
  latency chain.
- histogram / radix pre-pass: a per-row histogram needs per-lane
  scatter Mosaic does not have; 16 masked bucket counts cost 16 passes
  to save 4.
- adaptive pass count (init lo/hi from row min/max): pass count must be
  static worst-case; real same-sign data still spans ~25-28 of 32 int
  bits, and a data-dependent early exit is per-row, not per-block.
- sampled pre-bisect to narrow [lo, hi]: the exact rank check against
  a sampled window is itself data-dependent — the fallback keeps the
  static 32-pass worst case.
- partial (median-only) bitonic: stopping the sort at two sorted
  halves saves ~25% of stages, but the cross-half rank merge needs
  per-row indexed access (one-hot reduces, ~F ops per probe) — net
  ~10-11 ms, under the 2x target and above the bisect at wide F.
Conclusion: exact τ selection costs ~96·F VPU element-ops/item on this
hardware; the kernel runs at >90% of that bound.  The remaining levers
are precision contracts (approximate τ is excluded — τ feeds λ and
select_tau parity is bitwise) or hardware with per-lane scatter.

PRODUCTION LAYOUT (r4): "auto" — "bisect" (selection along sublanes)
for τ+λ and for τ-alone at F <= 128; "bisect_mm" (MXU ones-matvec
counting) for τ-alone at wider F, where the MXU idles and the win is
2.4× over the sort.  The sort layouts remain selectable: "sublane"
(the r3 production sort — the sub-block is transposed in-kernel and
sorted along the SUBLANE axis, where exchange distances j >= 8 cross
whole 8-sublane registers; measured 1.5-1.9× over "lane"), "lane",
and "sublane_mm" (interpret-only).  All layouts are bitwise-equal on
CPU and chip.  Mosaic overlaps the VPU selection with the MXU λ matmul
chain in the fused τ+λ kernel (ops/pallas_taulambda.py), so the
selection bounds the whole λτ pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TAU_FLOOR

__all__ = ["fused_select_tau", "fused_select_tau_fits"]


def _sub_rows_for(f: int, tile: int = 1024) -> int:
    """Largest power-of-two sub-block (<= tile) whose sort working set
    fits the scoped-VMEM budget next to the double-buffered input tile:
    ~5 live planes of (sub, f2) f32 + 2*tile*f*4 input <= ~14 MB."""
    f2 = 1 << (f - 1).bit_length()
    budget = 14 * 1024 * 1024 - 2 * tile * f * 4
    sub = tile
    while sub > 32 and 5 * sub * f2 * 4 > budget:
        sub //= 2
    return sub


def fused_select_tau_fits(f: int, tile: int = 1024) -> bool:
    """Feasibility gate shared with taumode.select_tau_batch: wide-F
    inputs whose sub-block would drop below 64 rows (or whose input
    tile alone overflows) take the XLA sort path instead."""
    sub = _sub_rows_for(f, tile)
    return sub >= 64 and 5 * sub * (1 << (f - 1).bit_length()) * 4 \
        <= 14 * 1024 * 1024 - 2 * tile * f * 4


def _sortable_int(x):
    """Monotone bijection f32 -> i32 (f64 -> i64 on the CPU/f64 test
    configs): bitcast, then flip the magnitude bits of negatives so
    SIGNED integer order equals float order (-inf lowest, +inf highest;
    -0.0 orders just below +0.0 exactly like the sort path's total
    order).  Returns (y, int_dtype, n_bits)."""
    if x.dtype == jnp.float64:
        it, bits = jnp.int64, 64
    else:
        it, bits = jnp.int32, 32
    xi = jax.lax.bitcast_convert_type(x, it)
    mask = jnp.asarray(jnp.iinfo(it).max, it)      # 0x7FFF... (sign clear)
    return jnp.where(xi < 0, xi ^ mask, xi), it, bits


def _from_sortable(y, out_dtype):
    it = y.dtype
    mask = jnp.asarray(jnp.iinfo(it).max, it)
    return jax.lax.bitcast_convert_type(
        jnp.where(y < 0, y ^ mask, y), out_dtype)


def _count_vpu(y, mid, axis: int):
    return jnp.sum((y <= mid).astype(jnp.int32), axis=axis, keepdims=True)


def _count_mxu(y, mid, ones_row):
    """count(y <= mid) per column of a (F, T) plane as a ones-matvec:
    the MXU does the 128-deep accumulate in one systolic pass while the
    VPU only pays the compare + 0/1 select.  Counts <= F are exact in
    f32.  Only useful where the MXU idles (the τ-alone kernel); the
    fused τ+λ kernel's MXU is busy with the λ matmul chain."""
    mask = jnp.where(y <= mid, 1.0, 0.0).astype(jnp.float32)
    return jax.lax.dot_general(
        ones_row, mask, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (1, T)


def _bisect_order_stat(y, rank1, axis: int, it, bits: int, count_fn,
                       ary: int = 2):
    """Exact order statistic by branchless binary search on the sortable
    integer VALUE range: converges to lo == hi == the smallest v with
    count(y <= v) >= rank1.  Each pass is broadcast compare(s) + count-
    reduce(s) over the row — no exchange network (the bitonic
    alternative moves data every stage through pltpu.roll pairs that
    cost ~3x their naive op count; see module docstring).  rank1 is
    rank+1 (dtype matching count_fn's output), shaped like the keepdims-
    reduce of y along `axis`.  Rows whose rank1 exceeds the row length
    converge to +inf's pattern (callers mask those out).

    ary=4 probes THREE midpoints per pass (the three independent counts
    overlap on the VPU) and cuts the range 4x, so the SEQUENTIAL chain
    is 17 passes instead of 32 — the pass chain, not count throughput,
    bounds the kernel at F <= 128 (r3 measurement), so fewer deeper
    passes trade ~1.6x total ops for ~1.9x less latency.  Invariant
    (count(y <= hi) >= rank1, count(y <= lo-1) < rank1) is preserved by
    the monotone-count quadrant selects; when lo == hi every mid == lo
    and the c1 branch holds, so converged rows stay fixed."""
    one = jnp.asarray(1, it)
    lo = jnp.full(rank1.shape, jnp.iinfo(it).min, it)
    hi = jnp.full(rank1.shape, jnp.iinfo(it).max, it)

    def mid_of(a, b):
        # overflow-safe floor((a + b) / 2) in the signed domain
        return (a >> one) + (b >> one) + (a & b & one)

    if ary == 2:
        for _ in range(bits):
            mid = mid_of(lo, hi)
            ge = count_fn(y, mid) >= rank1
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + one)
        return lo

    assert ary == 4, ary
    # width shrinks to <= ceil((w+1)/4) per pass; 17 passes cover 2^32
    for _ in range((bits + 1) // 2 + 1):
        m2 = mid_of(lo, hi)
        m1 = mid_of(lo, m2)
        m3 = mid_of(m2, hi)          # mid_of(m2+1, hi) could overflow;
        # the (m2, m3] quadrant only degenerates when lo == hi, where
        # the c1 branch already holds (see docstring invariant)
        c1 = count_fn(y, m1) >= rank1
        c2 = count_fn(y, m2) >= rank1
        c3 = count_fn(y, m3) >= rank1
        # quadrant select, innermost-first (counts are monotone)
        new_lo = jnp.where(c1, lo,
                           jnp.where(c2, m1 + one,
                                     jnp.where(c3, m2 + one, m3 + one)))
        new_hi = jnp.where(c1, m1,
                           jnp.where(c2, m2,
                                     jnp.where(c3, m3, hi)))
        lo, hi = new_lo, new_hi
    return lo


def _bitonic_sort_lanes(x, f2: int):
    """Ascending bitonic sort along the last axis (width f2, power of 2),
    exchanges via pltpu.roll — stays on-chip.

    The selection masks depend only on the LANE index, so they are built
    from a (1, f2) iota and broadcast against the (T, f2) data planes in
    the selects — computing them at full (T, f2) width charged ~3 extra
    VPU planes per exchange step (28-55 steps), a large share of the
    sort's cost."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, f2), 1)
    k = 2
    while k <= f2:
        j = k // 2
        while j >= 1:
            plus = pltpu.roll(x, f2 - j, 1)   # out[col] = x[col + j]
            minus = pltpu.roll(x, j, 1)       # out[col] = x[col - j]
            bit = (col & j) != 0              # (1, f2), broadcasts
            px = jnp.where(bit, minus, plus)
            ascending = (col & k) == 0
            is_lower = ~bit                # col < partner iff bit j unset
            # XNOR, expressed as equality: Mosaic mis-lowers a boolean
            # three-way select (i8->i1 trunci) but handles i1 compares
            take_min = ascending == is_lower
            x = jnp.where(take_min, jnp.minimum(x, px), jnp.maximum(x, px))
            j //= 2
        k *= 2
    return x


def _bitonic_sort_sublanes(xt, f2: int):
    """Ascending bitonic sort along axis 0 (the SUBLANE axis) of a
    (f2, T) plane — the production layout for the τ sort: exchange
    distances j >= 8 cross whole 8-sublane registers, which the
    compiler can resolve as register operand selection instead of data
    movement, and only j in {1, 2, 4} need intra-register sublane
    rotates.  The lane-axis variant pays two multi-micro-op lane rolls
    at EVERY one of the 28-55 stages (measured 1.5-1.9× slower; see
    module docstring)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (f2, 1), 0)
    k = 2
    while k <= f2:
        j = k // 2
        while j >= 1:
            plus = pltpu.roll(xt, f2 - j, 0)   # out[row] = xt[row + j]
            minus = pltpu.roll(xt, j, 0)       # out[row] = xt[row - j]
            bit = (row & j) != 0               # (f2, 1), broadcasts
            px = jnp.where(bit, minus, plus)
            ascending = (row & k) == 0
            is_lower = ~bit
            take_min = ascending == is_lower   # XNOR as i1 equality
            xt = jnp.where(take_min, jnp.minimum(xt, px),
                           jnp.maximum(xt, px))
            j //= 2
        k *= 2
    return xt


def _tau_rows(x, f: int, f2: int, kind: str, pct: float,
              layout: str = "sublane"):
    """τ per row of an in-VMEM (rows, F) block.

    layout: "sublane" (production) transposes the block and sorts along
    the sublane axis; "lane" sorts each row along the lane axis (the
    pre-r3 production layout, kept for A/B); "sublane_mm" replaces the
    transpose with an MXU identity matmul — bitwise-equal to the others
    under interpret/CPU but INEXACT on the real chip (the f32 MXU
    matmul truncates; measurement-only)."""
    t = x.shape[0]
    finite = jnp.isfinite(x)
    m = jnp.sum(finite.astype(jnp.int32), axis=1)    # finite count per row

    if kind == "mean":
        s = jnp.sum(jnp.where(finite, x, 0.0), axis=1)
        mean = jnp.where(m > 0, s / jnp.maximum(m, 1).astype(x.dtype), 0.0)
        return jnp.maximum(mean, TAU_FLOOR)

    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    xs = jnp.where(finite, x, big)

    if layout.startswith("bisect"):
        # Selection, not sort: binary-search each row's order statistic
        # over the sortable-int value range (32 count passes at f32) —
        # ~3 VPU element-ops per pass vs the bitonic's 28 stages of
        # roll+blend networks, and no pad to the next power of two.
        # bisect_mm counts on the (otherwise idle) MXU instead;
        # bisect4* probe 3 midpoints per pass (17-deep chain, see
        # _bisect_order_stat).
        ary = 4 if layout.startswith("bisect4") else 2
        yi, it, bits = _sortable_int(xs)
        if layout == "bisect_lane":            # count along lanes
            y, axis = yi, 1
            shp = lambda v: v[:, None]         # (T,) -> (T, 1)
        else:                                  # count along SUBLANES
            y, axis = yi.T, 0
            shp = lambda v: v[None, :]         # (T,) -> (1, T)
        if layout in ("bisect_mm", "bisect4_mm"):
            ones_row = jnp.ones((1, f), jnp.float32)
            count_fn = functools.partial(_count_mxu, ones_row=ones_row)
            rank_t = jnp.float32                # counts <= F exact in f32
        else:
            count_fn = functools.partial(_count_vpu, axis=axis)
            rank_t = jnp.int32
        one = jnp.asarray(1, jnp.int32)
        if kind == "percentile":
            pp = min(max(pct, 0.0), 1.0)
            idx = jnp.floor((m - 1).astype(jnp.float32) * pp + 0.5) \
                .astype(jnp.int32)
            idx = jnp.clip(idx, 0, f - 1)
            v = _bisect_order_stat(y, shp(idx + one).astype(rank_t),
                                   axis, it, bits, count_fn, ary=ary)
            out = jnp.where(m > 0,
                            _from_sortable(v, x.dtype).reshape(t),
                            TAU_FLOOR)
        else:  # median: rank hi from rank lo's value + one masked min
            lo_r = jnp.clip((jnp.maximum(m, 1) - 1) // 2, 0, f - 1)
            hi_r = jnp.clip(jnp.maximum(m, 1) // 2, 0, f - 1)
            v_lo = _bisect_order_stat(y, shp(lo_r + one).astype(rank_t),
                                      axis, it, bits, count_fn, ary=ary)
            cnt_lo = count_fn(y, v_lo)
            nxt = jnp.min(jnp.where(y > v_lo,
                                    y, jnp.asarray(jnp.iinfo(it).max, it)),
                          axis=axis, keepdims=True)
            v_hi = jnp.where(cnt_lo < shp(hi_r + one).astype(rank_t),
                             nxt, v_lo)
            med = 0.5 * (_from_sortable(v_lo, x.dtype)
                         + _from_sortable(v_hi, x.dtype))
            out = jnp.where(m > 0, med.reshape(t), TAU_FLOOR)
        return jnp.maximum(out, TAU_FLOOR)

    if f2 != f:
        pad = jnp.full((t, f2 - f), big, dtype=x.dtype)
        xs = jnp.concatenate([xs, pad], axis=1)

    if layout == "lane":
        xs = _bitonic_sort_lanes(xs, f2)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, f2), 1)
        sel = lambda idx: jnp.sum(
            jnp.where(col == idx[:, None], xs, 0.0), axis=1)
    else:
        if layout == "sublane_mm":
            # exact transpose on the MXU: xt[f, s] = Σ_t xs[t, f]·I[t, s]
            # (products are x·1 with a single nonzero per sum — exact).
            # The inf sort-last sentinel would poison the sum (inf·0 =
            # NaN), so it is clamped to finfo.max first — extraction
            # indices stay < m, so sentinel slots are never read and
            # outputs match the inf-sentinel layouts exactly.
            xs = jnp.minimum(xs, jnp.finfo(xs.dtype).max)
            eye = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
                   ).astype(xs.dtype)
            xt = jax.lax.dot_general(
                xs, eye, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=xs.dtype)
        else:
            xt = xs.T
        xt = _bitonic_sort_sublanes(xt, f2)
        row = jax.lax.broadcasted_iota(jnp.int32, (f2, 1), 0)
        sel = lambda idx: jnp.sum(
            jnp.where(row == idx[None, :], xt, 0.0), axis=0)

    if kind == "percentile":
        pp = min(max(pct, 0.0), 1.0)
        idx = jnp.floor((m - 1).astype(jnp.float32) * pp + 0.5) \
            .astype(jnp.int32)
        idx = jnp.clip(idx, 0, f - 1)
        out = jnp.where(m > 0, sel(idx), TAU_FLOOR)
    else:  # median
        lo = jnp.clip((jnp.maximum(m, 1) - 1) // 2, 0, f - 1)
        hi = jnp.clip(jnp.maximum(m, 1) // 2, 0, f - 1)
        med = 0.5 * (sel(lo) + sel(hi))
        out = jnp.where(m > 0, med, TAU_FLOOR)
    return jnp.maximum(out, TAU_FLOOR)


def _kernel(x_ref, out_ref, *, f: int, f2: int, kind: str, pct: float,
            sub: int, layout: str = "sublane"):
    """Row tile processed in `sub`-row sub-blocks: the tile itself must
    be >= 1024 rows (Mosaic floor), but the bitonic sort's ~5 working
    planes of (rows, f2) blow the 16 MB scoped-VMEM limit at wide F if
    sized to the whole tile (measured 19.8 MB at F=768/T=1024) — the
    sub-blocking bounds the live sort planes while the BlockSpec tile
    stays Mosaic-legal.  The out ref is 2-D (tile, 1): Mosaic cannot
    lower a 1-D concatenate of sub-vectors ("input offsets outside the
    first tile"), but 8-row-aligned 2-D partial stores are fine."""
    t = x_ref.shape[0]
    for s0 in range(0, t, sub):
        out_ref[s0:s0 + sub, :] = _tau_rows(
            x_ref[s0:s0 + sub, :], f, f2, kind, pct,
            layout=layout)[:, None]


@functools.partial(jax.jit,
                   static_argnames=("kind", "pct", "tile", "interpret",
                                    "layout"))
def fused_select_tau(
    items: jax.Array,        # (N, F)
    *,
    kind: str = "median",    # "median" | "percentile" | "mean"
    pct: float = 0.5,
    tile: int = 1024,
    interpret: bool = False,
    layout: str = "auto",    # auto | bisect | bisect_mm | bisect_lane
                             # | sublane | lane | sublane_mm
) -> jax.Array:
    n, f = items.shape
    if layout == "auto":
        # counts on the idle MXU win at wide F (2.4x at 384); at
        # F <= 128 the VPU count is marginally ahead (tau_mm_ab)
        layout = "bisect_mm" if f > 128 else "bisect"
    f2 = 1 << (f - 1).bit_length()
    dt = items.dtype

    # coarse row bucket first: one compiled program per bucket, not per N
    from ..config import bucket_rows
    n_bucket = max(bucket_rows(n), tile)
    n_pad = ((n_bucket + tile - 1) // tile) * tile
    x = items
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)), constant_values=1.0)

    grid_spec = pl.GridSpec(
        grid=(n_pad // tile,),
        in_specs=[pl.BlockSpec((tile, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, f=f, f2=f2, kind=kind, pct=pct,
                          sub=_sub_rows_for(f, tile), layout=layout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), dt),
        interpret=interpret,
    )(x)
    return out[:n, 0]
