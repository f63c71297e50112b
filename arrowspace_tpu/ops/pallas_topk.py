"""Pallas TPU kernel: fused λ-aware scoring + streaming top-k.

Why a kernel: XLA's matmul+top_k materialises the full (B, N) score matrix
in HBM (B=256, N=1M -> 1 GB written and re-read per batch).  This kernel
tiles the items axis, computes the score tile on the MXU, and folds it
into a running top-k held in VMEM scratch — items are read exactly once
and nothing but the (B, k) result ever leaves the chip.

This is the TPU replacement for the reference's per-thread top-k heaps
(core.rs:818-888): the heap becomes a (B, k) running buffer, the merge
becomes k iterations of masked max-extraction (Mosaic has no sort/top_k
primitive, so selection is done with max+mask passes — k is small).

Score (core.rs:135-175): α·cos(q, x) + (1-α)·(1 - min(|λ_q - λ_x|, 1)).
Inputs are pre-normalised unit rows so cos is a plain dot product.

Negative results (measured at 1M x 128 on v5e, kept here so they are
not re-tried blind):
- Multi-query-block kernel (one corpus stream feeding several gated
  128-blocks, on the theory that re-streaming the corpus per block
  dominates batch-2048 cost): equal-or-worse walls across f32/bf16 at
  B=256/2048.  The kernel is VPU-bound (λ plane + merge passes), not
  HBM-bound, and Mosaic pipelines the simple per-block kernel better
  than the 16-way unrolled body.
- Cheap-bound gate (score <= α·max(cos) + (1-α)) hoisting the λ plane
  and padding mask inside the conditional: walls unchanged-to-worse.
  Conditional bodies break Mosaic's software pipelining with the next
  tile's DMA/matmul, so only the k-pass merge belongs behind the gate;
  the unconditional score plane is effectively free.
- Measurement note: single-dispatch device times through the dev tunnel
  carry +-6 ms of RTT-estimation noise; kernel A/Bs at this scale need
  the amortised lax.scan harness in benchmarks/device_time.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_lambda_topk", "pallas_available"]

NEG_INF = float(np.finfo(np.float32).min)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _extract_topk(scores, idx, k: int):
    """Top-k of (B, W) scores/indices via k masked max-extraction passes
    (no sort primitive on Mosaic).  First occurrence wins ties, matching
    lax.top_k's stable ordering."""
    bsz, width = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bsz, width), 1)
    out_s, out_i = [], []
    for _ in range(k):
        cur = jnp.max(scores, axis=1)                      # (B,)
        eq = scores == cur[:, None]
        pos = jnp.min(jnp.where(eq, col, width), axis=1)
        chosen = col == pos[:, None]
        sel = jnp.min(jnp.where(chosen, idx, jnp.iinfo(jnp.int32).max),
                      axis=1)
        out_s.append(cur)
        out_i.append(sel)
        scores = jnp.where(chosen, NEG_INF, scores)
    return jnp.stack(out_s, axis=1), jnp.stack(out_i, axis=1)


def _merge_topk(run_s, run_i, tile_s, tile_i, k: int):
    """Exact merge of the running (B, k) top-k with a (B, T) tile: reduce
    the tile to its own (B, k) first (passes over the large tile touch only
    the already-materialised score buffer — no (B, k+T) concatenation, which
    would double peak VMEM), then select over the (B, 2k) union.

    Tie order note: the running buffer is listed before the tile, and tile
    indices are strictly increasing across grid steps, so equal scores
    resolve to the lowest global index — identical to lax.top_k over the
    full score row."""
    ts, ti = _extract_topk(tile_s, tile_i, k)
    comb_s = jnp.concatenate([run_s, ts], axis=1)          # (B, 2k)
    comb_i = jnp.concatenate([run_i, ti], axis=1)
    return _extract_topk(comb_s, comb_i, k)


def _kernel(qhat_ref, qlam_ref, xhat_ref, xlam_ref, alpha_ref, n_ref,
            out_s_ref, out_i_ref, run_s, run_i, *, k: int, tile: int):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        run_s[:] = jnp.full_like(run_s, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    c1 = alpha_ref[0, 0]                     # carries 1 - alpha
    qhat = qhat_ref[:]                       # (B, F), alpha-prescaled
    xhat = xhat_ref[:]                       # (T, F) current tile
    # canonical fma form (ops/search._shifted_lambda_plane): the matmul
    # emits alpha*cos and the merge runs on scores SHIFTED by -c1; the
    # wrapper restores +c1 — bitwise-consistent with the binned kernel
    # and the XLA oracle (the shift is constant per batch, so the
    # threshold gate and tie order are unaffected)
    acos = jax.lax.dot_general(
        qhat, xhat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (B, T) f32 accumulation

    dl = jnp.abs(qlam_ref[:].reshape(-1, 1) - xlam_ref[:].reshape(1, -1))
    scores = acos - c1 * jnp.minimum(dl, 1.0)

    # mask padding rows beyond N (true N arrives as an SMEM scalar so the
    # compiled Mosaic module is reusable across corpus sizes in a bucket)
    base = t * tile
    local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    gidx = local + base
    scores = jnp.where(gidx < n_ref[0, 0], scores, NEG_INF)

    # Threshold gate: after the running buffer warms up, most tiles cannot
    # beat any row's current kth score — skip the merge entirely then.
    # (The analogue of the reference heap's `score > heap.peek()` early-out,
    # core.rs:852-859, lifted to whole tiles.)
    tile_best = jnp.max(scores, axis=1)          # (B,)
    kth = run_s[:, k - 1]                        # (B,)
    need = jnp.any(tile_best > kth)

    @pl.when(need)
    def _merge():
        s, i = _merge_topk(run_s[:], run_i[:], scores, gidx, k)
        run_s[:] = s
        run_i[:] = i

    @pl.when(t == n_tiles - 1)
    def _flush():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "interpret", "use_bf16"))
def fused_lambda_topk(
    queries: jax.Array,       # (B, F) — raw, normalised inside
    query_lambdas: jax.Array,  # (B,)
    items: jax.Array,          # (N, F) — raw
    item_lambdas: jax.Array,   # (N,)
    alpha,
    *,
    k: int,
    tile: int = 0,            # 0 = auto from the VMEM budget
    interpret: bool = False,
    use_bf16: bool = False,   # bf16 matmul inputs, f32 accumulation:
                              # 4x MXU rate + half the HBM traffic
):
    """Returns (scores (B, k), indices (B, k)) — bit-stable vs. the XLA
    matmul+top_k path up to tie ordering."""
    bsz, f = queries.shape
    n = items.shape[0]
    dt = jnp.float32

    # Query-block size: 128 is measured-optimal, NOT a VMEM ceiling.  A
    # bigger block (512) divides corpus HBM traffic 4x but makes the
    # any-row merge gate fire on nearly every tile and each k-pass merge
    # 4x larger — measured 4.4x SLOWER end to end at B=2048.  The win of
    # small blocks is that the (B,) kth-score threshold stays selective,
    # so most tiles skip the merge entirely.
    max_b = 128

    # Pad the batch to a multiple of the block so ONE (128, N) Mosaic
    # program serves every batch size (a fresh Mosaic compile costs
    # minutes through the remote-compile tunnel; the corpus stream
    # dominates device time, so extra query rows are nearly free).
    if bsz % max_b != 0:
        pad_b = max_b - bsz % max_b
        qp = jnp.pad(queries, ((0, pad_b), (0, 0)), constant_values=1.0)
        qlp = jnp.pad(query_lambdas, (0, pad_b))
        s, i = fused_lambda_topk(qp, qlp, items, item_lambdas, alpha,
                                 k=k, tile=tile, interpret=interpret,
                                 use_bf16=use_bf16)
        return s[:bsz], i[:bsz]

    if tile <= 0:
        # Auto tile from the ~16 MB scoped-VMEM budget: the dominant
        # per-step buffers are the double-buffered item tile (tile×F) and
        # the (B, tile) score/index planes.  Floor of 1024: this Mosaic
        # build crashes (compiler subprocess exit 1) on smaller tiles.
        elem = 2 if use_bf16 else 4
        budget = 6 * 1024 * 1024
        per_row = 2 * f * elem + 2 * min(bsz, max_b) * 4
        tile = max(1024, min(4096, (budget // per_row) // 1024 * 1024))
    if bsz > max_b:
        outs = [fused_lambda_topk(queries[i:i + max_b],
                                  query_lambdas[i:i + max_b],
                                  items, item_lambdas, alpha,
                                  k=k, tile=tile, interpret=interpret,
                                  use_bf16=use_bf16)
                for i in range(0, bsz, max_b)]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    mm_dt = jnp.bfloat16 if use_bf16 else dt

    # coarse corpus bucket (config.bucket_rows): one compiled program per
    # bucket; padded rows are masked to NEG_INF by the gidx < n guard
    from ..config import bucket_rows
    n_bucket = max(bucket_rows(n), tile)
    n_pad = ((n_bucket + tile - 1) // tile) * tile

    def unit_padded(rows, pad_rows):
        # pad fused into the divide: a separate unit() copy + jnp.pad
        # co-lives two corpus-sized arrays (a 17 GB transient at
        # 10M x 128); arithmetic matches ops/search._safe_unit exactly
        nrm = jnp.sqrt(jnp.sum(rows * rows, axis=-1, keepdims=True))
        nrm_p = jnp.pad(nrm, ((0, pad_rows), (0, 0)), constant_values=1.0)
        ok = nrm_p > 0.0
        rows_p = jnp.pad(rows, ((0, pad_rows), (0, 0)))
        return jnp.where(ok, rows_p / jnp.where(ok, nrm_p, 1.0),
                         0.0).astype(mm_dt)

    # alpha rides inside the prepared query (multiply in f32, then the
    # mm_dt cast) — see ops/search._shifted_lambda_plane for the form
    alpha_f = jnp.asarray(alpha, dtype=dt)
    c1 = 1.0 - alpha_f
    nrm_q = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
    qok = nrm_q > 0.0
    qhat = (jnp.where(qok, queries / jnp.where(qok, nrm_q, 1.0), 0.0)
            .astype(dt) * alpha_f).astype(mm_dt)
    xhat = unit_padded(items, n_pad - n)
    qlam = query_lambdas.astype(dt)
    xlam = jnp.pad(item_lambdas.astype(dt), (0, n_pad - n))
    n_tiles = n_pad // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        scratch_shapes=[pltpu.VMEM((bsz, k), dt),
                        pltpu.VMEM((bsz, k), jnp.int32)],
        in_specs=[
            pl.BlockSpec((bsz, f), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),      # qhat (replicated)
            pl.BlockSpec((bsz,), lambda t: (0,),
                         memory_space=pltpu.VMEM),      # qlam
            pl.BlockSpec((tile, f), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),      # xhat tile
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),      # xlam tile
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),      # alpha
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),      # true N
        ],
        out_specs=(
            pl.BlockSpec((bsz, k), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, k), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )

    kernel = functools.partial(_kernel, k=k, tile=tile)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((bsz, k), dt),
                   jax.ShapeDtypeStruct((bsz, k), jnp.int32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_pad * f,
            bytes_accessed=n_pad * f * 4 + bsz * f * 4 + bsz * k * 8,
            transcendentals=0,
        ),
    )(qhat, qlam, xhat, xlam,
      c1.reshape(1, 1),
      jnp.asarray(n, dtype=jnp.int32).reshape(1, 1))
    # restore the -c1 shift (kernel sorts pre-shift); -inf slots from
    # the n < k degenerate case stay -inf
    return out_s + c1, out_i
