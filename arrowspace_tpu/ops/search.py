"""Batched λ-aware search kernels.

The reference scans all N items per query, computing
α·cos(q, x_i) + (1-α)·(1 - min(|λ_q - λ_i|, 1)) and sorting
(reference: core.rs:760-798).  On TPU this becomes one normalized matmul
(Q̂ @ X̂ᵀ) on the MXU plus elementwise λ-proximity and ``lax.top_k`` —
the per-thread-heap merge of the hybrid variant (core.rs:818-888) is
subsumed by a single fused top-k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cosine_scores", "lambda_aware_scores",
           "batched_lambda_aware_topk", "masked_lambda_aware_topk",
           "rescore_topk_f64", "pallas_binned_topk_with_repair"]


def pallas_binned_topk_with_repair(q, qlam, items, item_lambdas, alpha,
                                   k: int, use_bf16: bool = False,
                                   tile: int = 0, interpret: bool = False,
                                   block_b: int = 0, lane_split: int = 0,
                                   pre_reduce=None):
    """Bin-accumulator streaming top-k + exact repair of flagged rows.

    The binned kernel (ops/pallas_bintopk.py) is exact except when more
    than `depth` true top-k elements collide in one bin; it flags those
    queries (P ~ 2e-7 per query at k=10).  Flagged rows are repaired
    through the strided-bin exact rescore (ops/bin_repair: only the
    fired bins' rows + the current top-k are re-scored — ~0.3 ms of
    gather+matmul at 1M×128 vs a ~4.4 ms full-corpus merge pass), with
    the exact merge kernel as the fallback for fired-bin overflow, so
    the combined result is always bit-identical to lax.top_k.  The flag
    fetch synchronises the dispatch — callers on the async serving path
    should use the session driver (index.stream_search), which overlaps
    the fetch with the next batch's compute.
    """
    from .pallas_bintopk import binned_lambda_topk
    s, i, fl, det = binned_lambda_topk(
        q, qlam, items, item_lambdas, alpha, k=k, use_bf16=use_bf16,
        tile=tile, interpret=interpret, block_b=block_b,
        lane_split=lane_split, pre_reduce=pre_reduce, return_det=True)
    flags = np.asarray(fl)
    if flags.any():
        from .bin_repair import strided_lambda_repair
        from .pallas_topk import fused_lambda_topk
        rows = np.nonzero(flags)[0]
        s = np.asarray(s).copy()
        i = np.asarray(i).copy()

        def full_merge(rel_rows):
            # power-of-two padded gather: one compiled program per
            # bucket, not per flagged count (see bin_repair.padded_take)
            rr = padded_take(rows[rel_rows])
            rs, ri = fused_lambda_topk(q[rr], qlam[rr], items,
                                       item_lambdas, alpha, k=k,
                                       use_bf16=use_bf16, tile=tile,
                                       interpret=interpret)
            m = len(rel_rows)
            return np.asarray(rs)[:m], np.asarray(ri)[:m]

        # ONE fetch for the repair operands (det plane rows + kth); the
        # gathers ride a power-of-two index bucket so one compiled
        # gather serves any flag count (see bin_repair.padded_take)
        from .bin_repair import padded_take
        take = padded_take(rows)
        det_rows, q_rows, ql_rows = jax.device_get(
            (det[take], q[take], qlam[take]))
        rs, ri = strided_lambda_repair(
            q_rows[:len(rows)], ql_rows[:len(rows)],
            det_rows[:len(rows)], s[rows, k - 1], i[rows],
            items, item_lambdas, alpha, k=k, n=items.shape[0],
            prepared=False, use_bf16=use_bf16, fallback=full_merge,
            cur_scores=s[rows])
        s[rows] = rs
        i[rows] = ri
    return s, i


def rescore_topk_f64(queries, query_lambdas, host_rows, item_lambdas,
                     alpha: float, cand_idx, k: int):
    """Exact f64 re-ranking of device-produced candidates.

    The f32 device scan can flip ties among near-duplicate cosines (the
    0.959-recall regime on clustered 384-d data); re-scoring the candidate
    pool against the ORIGINAL f64 rows restores the f64 ordering at
    O(B·m·F) host flops — negligible next to the O(B·N·F) device scan.
    Item λ values stay f32-computed (within the 1e-5 budget; only the
    cosine term carries the tie-flipping error at α near 1).

    Returns (scores (B, k) f64, indices (B, k)).
    """
    q = np.asarray(queries, dtype=np.float64)
    qlam = np.asarray(query_lambdas, dtype=np.float64)
    lam = np.asarray(item_lambdas, dtype=np.float64)
    cand = np.asarray(cand_idx)
    bsz, m = cand.shape

    rows = np.asarray(host_rows, dtype=np.float64)[cand]     # (B, m, F)
    qn = np.linalg.norm(q, axis=1)
    rn = np.linalg.norm(rows, axis=2)
    dots = np.einsum("bf,bmf->bm", q, rows)
    denom = qn[:, None] * rn
    cos = np.where(denom > 0.0, dots / np.where(denom > 0.0, denom, 1.0),
                   0.0)
    dl = np.abs(qlam[:, None] - lam[cand])
    scores = alpha * cos + (1.0 - alpha) * (1.0 - np.minimum(dl, 1.0))

    # ties resolve to the lowest GLOBAL index (lax.top_k semantics), not
    # the candidate pool position
    top_scores = np.empty((bsz, k), dtype=np.float64)
    top_idx = np.empty((bsz, k), dtype=cand.dtype)
    for b in range(bsz):
        order = np.lexsort((cand[b], -scores[b]))[:k]
        top_scores[b] = scores[b][order]
        top_idx[b] = cand[b][order]
    return top_scores, top_idx


def _safe_unit(rows: jax.Array) -> jax.Array:
    norms = jnp.sqrt(jnp.sum(rows * rows, axis=-1, keepdims=True))
    return jnp.where(norms > 0.0, rows / jnp.where(norms > 0.0, norms, 1.0), 0.0)


@jax.jit
def cosine_scores(queries: jax.Array, items: jax.Array) -> jax.Array:
    """(B, F) x (N, F) -> (B, N) cosine similarity; zero vectors score 0
    (reference: core.rs:229-239)."""
    q = _safe_unit(queries)
    x = _safe_unit(items)
    return jnp.dot(q, x.T, preferred_element_type=queries.dtype)


def _pad_query_rows(b: int) -> int:
    """Rows of zero-padding that lift a sub-16-row query block to a
    matmul-shaped dot — TPU only (see _shifted_lambda_plane's docstring:
    the CPU matvec is already column-uniform and the CPU blocked matmul
    is NOT, so padding there breaks exact-duplicate tie order).

    The device check honours jax.default_device: core.py's small-scan
    fallback runs this plane on the HOST CPU backend of a TPU machine
    (``with jax.default_device(cpu)``), where jax.default_backend()
    still reports the accelerator — keying on the backend alone would
    apply the TPU pad to the CPU matmul and break the tie order the
    fallback exists to preserve."""
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    if platform == "cpu":
        return 0
    return max(0, 16 - b)


def _shifted_lambda_plane(queries, query_lambdas, items, item_lambdas,
                          alpha):
    """The canonical fma score arithmetic, SHIFTED by -c1 = -(1-α):

        s' = (α·q̂)·x̂ᵀ - c1·min(|Δλ|, 1)      (true score = s' + c1)

    α rides inside the prescaled query so the matmul emits α·cos in one
    pass; this is a rank-preserving reassociation of the reference
    expression α·cos + (1-α)·(1-min(|Δλ|,1)) (core.rs:135-175) and is
    byte-for-byte the arithmetic of the binned/merge Pallas kernels
    (ops/pallas_bintopk, ops/pallas_topk), so kernel-vs-oracle id parity
    is bitwise.  At α=1, c1=0 and the plane is exactly the f32 cosine.
    Top-k callers sort on s' (the kernels sort pre-shift) and restore
    +c1 on the returned scores only.

    On TPU, sub-16-row batches are zero-padded to 16 query rows before
    the dot and sliced back: TPU lowers a (1, F)x(F, N) dot as a MATVEC
    whose rounding differs ~1e-4 from every matmul-shaped program
    (measured, /tmp/prec_probe r4), which made single-query searches the
    one API path whose scores could disagree with a serving session's.
    The pad keeps the corpus stream identical and the extra query rows
    are a rounding error in FLOPs.  The pad is TPU-ONLY (_pad_query_rows):
    the CPU matvec already rounds uniformly per corpus column, while the
    CPU blocked MATMUL does not — bitwise-identical corpus rows landing
    in different SIMD remainder lanes round 1 ulp apart, flipping the
    duplicate tie-order the reference pins (quora rows 1/14 in
    tests/test_reference_parity.py; probed on f64: col14 = 1.0000000000000004
    vs col1 = 0.9999999999999999 under the padded matmul, equal under
    the matvec)."""
    a = jnp.asarray(alpha, queries.dtype)
    c1 = 1.0 - a
    b = queries.shape[0]
    pad = _pad_query_rows(b)
    if pad:
        queries = jnp.pad(queries, ((0, pad), (0, 0)))
        query_lambdas = jnp.pad(query_lambdas, (0, pad))
    q = _safe_unit(queries) * a
    x = _safe_unit(items)
    acos = jnp.dot(q, x.T, preferred_element_type=queries.dtype)
    dl = jnp.abs(query_lambdas[:, None] - item_lambdas[None, :])
    shifted = acos - c1 * jnp.minimum(dl, 1.0)
    return (shifted[:b] if pad else shifted), c1


@jax.jit
def lambda_aware_scores(
    queries: jax.Array,       # (B, F)
    query_lambdas: jax.Array,  # (B,)
    items: jax.Array,          # (N, F)
    item_lambdas: jax.Array,   # (N,)
    alpha: jax.Array,          # scalar
) -> jax.Array:
    """score = α·cos + (1-α)·(1 - min(|Δλ|, 1))  (core.rs:135-175),
    computed via the canonical fma form (see _shifted_lambda_plane) so
    every XLA score plane matches the Pallas kernels' arithmetic."""
    shifted, c1 = _shifted_lambda_plane(queries, query_lambdas, items,
                                        item_lambdas, alpha)
    return shifted + c1


@functools.partial(jax.jit, static_argnames=("k",))
def batched_lambda_aware_topk(
    queries: jax.Array,
    query_lambdas: jax.Array,
    items: jax.Array,
    item_lambdas: jax.Array,
    alpha: jax.Array,
    *,
    k: int,
):
    """Fused scoring + top-k. Returns (scores (B,k), indices (B,k)).
    Sorts on the SHIFTED plane (exactly what the binned kernel's flush
    sorts) and restores +c1 afterwards, so ids AND scores are bitwise
    vs binned_lambda_topk's unflagged rows."""
    shifted, c1 = _shifted_lambda_plane(queries, query_lambdas, items,
                                        item_lambdas, alpha)
    s, i = jax.lax.top_k(shifted, k)
    return s + c1, i


@functools.partial(jax.jit, static_argnames=("k",))
def masked_lambda_aware_topk(
    queries: jax.Array,
    query_lambdas: jax.Array,
    items: jax.Array,          # (cap_pad, F) capacity-padded live corpus
    item_lambdas: jax.Array,   # (cap_pad,)
    alpha: jax.Array,
    n_live: jax.Array,         # traced live row count
    *,
    k: int,
):
    """Live-corpus λ-aware top-k: `items` is CAPACITY-padded and only the
    first n_live rows are real — positions past n_live are masked to -inf
    before the top-k, so ONE compiled program serves every live count
    (live.LiveSearchSession's small-corpus / CPU path).  Semantics over
    the live prefix are identical to batched_lambda_aware_topk (scores,
    lax.top_k tie order); the mask also kills any NaN the stale padded
    rows might produce."""
    shifted, c1 = _shifted_lambda_plane(queries, query_lambdas, items,
                                        item_lambdas, alpha)
    live = jnp.arange(items.shape[0])[None, :] < n_live
    neg_inf = jnp.asarray(-jnp.inf, dtype=shifted.dtype)
    s, i = jax.lax.top_k(jnp.where(live, shifted, neg_inf), k)
    # -inf masked slots (n_live < k) stay -inf through the restore
    return s + c1, i


@functools.partial(jax.jit, static_argnames=("k",))
def hybrid_search_device(
    query: jax.Array,        # (F,)
    query_lambda: jax.Array,  # scalar
    items: jax.Array,
    item_lambdas: jax.Array,
    alpha: jax.Array,
    *,
    k: int,
):
    """Device part of search_lambda_aware_hybrid (core.rs:802-928):
    λ-aware top-k, cosine top-1, and the high-cosine mask (> 0.9999).
    Kept for callers that want the raw components; the serving path uses
    hybrid_search_device_fused (O(k) fetch instead of O(N))."""
    cos = cosine_scores(query[None, :], items)[0]
    dl = jnp.abs(query_lambda - item_lambdas)
    lam_score = alpha * cos + (1.0 - alpha) * (1.0 - jnp.minimum(dl, 1.0))
    top_scores, top_idx = jax.lax.top_k(lam_score, k)
    sem_idx = jnp.argmax(cos)
    high_mask = cos > 0.9999
    return top_scores, top_idx, sem_idx, cos, high_mask


@functools.partial(jax.jit, static_argnames=("k",))
def hybrid_search_device_fused(
    query: jax.Array,        # (F,)
    query_lambda: jax.Array,  # scalar
    items: jax.Array,
    item_lambdas: jax.Array,
    alpha: jax.Array,
    *,
    k: int,
):
    """Fully device-side hybrid union (core.rs:802-928): the union +
    dedup + precedence of the reference's fold/reduce — high-cosine
    matches keep their cosine score, λ-top-k entries their blended
    score, the semantic top-1 its cosine — expressed as one effective
    score per item, so the final top-k is ONE lax.top_k and the host
    fetches O(k) bytes instead of the full (N,) cosine array + Python
    dict union (the round-2 host path cost ~4 MB + an O(N) loop per
    query at 1M rows).

    Precedence mirrors the host dict's insertion order: high-cos beats
    λ-top-k membership beats semantic-top-1; items in none of the three
    sets are excluded (-inf).  The λ-top-k contributes k entries, so the
    result always holds k valid rows for k <= N."""
    cos = cosine_scores(query[None, :], items)[0]
    dl = jnp.abs(query_lambda - item_lambdas)
    lam_score = alpha * cos + (1.0 - alpha) * (1.0 - jnp.minimum(dl, 1.0))
    _, top_idx = jax.lax.top_k(lam_score, k)
    n = items.shape[0]
    in_topk = jnp.zeros((n,), jnp.bool_).at[top_idx].set(True)
    sem_idx = jnp.argmax(cos)
    high = cos > 0.9999
    is_sem = jnp.arange(n) == sem_idx
    neg_inf = jnp.asarray(-jnp.inf, dtype=cos.dtype)
    eff = jnp.where(high, cos,
                    jnp.where(in_topk, lam_score,
                              jnp.where(is_sem, cos, neg_inf)))
    return jax.lax.top_k(eff, k)
