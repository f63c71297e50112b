"""Strided-bin exact repair for the bin-accumulator top-k kernels.

The binned kernels (ops/pallas_bintopk.py) map a corpus row g to bin
``g mod bins``, so one bin's rows form a STRIDED SLICE of the corpus
(n/bins rows).  A flagged query's missing top-k candidates can only
live in its FIRED bins (``det >= kth``): this module rescores just
those bins' rows, plus the query's current top-k, in one small XLA
program — a gather + one batched matmul + a two-key sort (~0.3 ms of
device work at 1M x 128) instead of the ~4.4 ms full-corpus merge-
kernel pass the sessions used before.

Exactness argument (the repair must keep the end-to-end result
bit-identical to lax.top_k over the full score plane):

* A true top-k element missing from the kernel's pool must have had
  more than ``depth`` same-bin elements scoring >= it, so its bin's
  miss detector satisfies ``det >= its score >= true kth >= pool
  kth`` — the bin FIRED.  (With the pre-reduce fold the detector is
  the loser-max, a conservative upper bound folded over the same lane
  position, and every combine loser of bin b has global index ≡ b
  (mod bins) — the strided slice covers it.)
* A true top-k element in a NON-fired bin is in the pool, and within
  the pool fewer than k elements beat it (anything that beats it in
  pool order beats it in true order), so it is already in the query's
  current top-k ids.

Hence ``true top-k ⊆ current top-k ∪ (fired bins' rows)``.  Both sets
are rescored in ONE XLA expression (same arithmetic as the kernels:
``_safe_unit`` normalisation, f32-accumulated dot, identical score
formula) and merged with the same two-key ``(-score, idx)`` sort the
kernel flush uses, so the lowest-global-index tie order of lax.top_k
is preserved.  Current-top-k entries whose bin fired are masked out
(the strided block re-scores them) so no candidate appears twice.

Rows with more than MAX_FIRED fired bins — possible under adversarial
tie storms — fall back to the caller's full-corpus exact repair.

Arithmetic consistency (r4): the repair chunks evaluate the ONE
canonical score expression at DEFAULT matmul precision — the same
bf16-pass decomposition the kernels and the XLA oracle lower to on
chip — so repaired rows agree BITWISE with the oracle (measured:
exactness_r4b before this change showed 5.8e-4 deltas confined to
repaired rows at k>=32; the earlier Precision.HIGHEST dots were "more
accurate" per pair but broke cross-program id equality on near-ties).
Callers needing exact f64 tie order use precision="f64_rescore"
(index.ArrowIndex.search).

Reference anchor: the per-thread-heap merge of core.rs:818-888 (the
exact semantics all repair paths restore).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_bintopk import NEG_INF

__all__ = ["strided_lambda_repair", "strided_energy_repair",
           "fired_bins_host", "MAX_FIRED", "padded_take"]

INT_MAX = np.iinfo(np.int32).max

# Rows with more fired bins than this fall back to the full exact
# repair.  Measured flag events carry ONE fired bin (a single deep
# collision); 2 keeps a margin without doubling the gather.
MAX_FIRED = 2

# HBM budget for the (R, M·m + k, F) gathered-candidate transient; the
# per-dispatch row count adapts to it (at 1M x 128 / bins 128 this
# admits 32 rows per dispatch, at 10M it drops to 4).
_GATHER_BUDGET = 384 * 1024 * 1024


def padded_take(rows) -> np.ndarray:
    """Power-of-two padded index vector (tail repeats rows[0]) for
    device gathers over flagged rows.  A gather whose index count is
    the raw flag count compiles ONCE PER NOVEL COUNT — measured 1.7 s
    per novel count through the remote-compile service (12.9 s when
    the varying count reached a Mosaic kernel) vs ~60 ms cached.  The
    bucket bounds the distinct programs to log2(B); callers slice the
    fetched rows back to len(rows)."""
    rows = np.asarray(rows)
    b = 1 << max(0, int(rows.shape[0] - 1).bit_length())
    out = np.full(b, rows[0] if rows.size else 0, dtype=rows.dtype)
    out[:rows.shape[0]] = rows
    return out


def _rows_per_dispatch(m: int, f: int) -> int:
    cap = _GATHER_BUDGET // max(1, MAX_FIRED * m * f * 4)
    r = 1
    while r * 2 <= min(32, max(1, cap)):
        r *= 2
    return r


def fired_bins_host(det_rows: np.ndarray, kth: np.ndarray):
    """Per flagged row, the fired-bin list (det >= kth, det > NEG_INF) —
    the host-side mirror of the flush's flag reduction, evaluated on the
    same f32 values so the set is exactly the bins that raised the flag.
    Returns (fired (R, MAX_FIRED) int32 padded with -1,
             ok (R,) bool — False where the row overflowed MAX_FIRED)."""
    det_rows = np.asarray(det_rows)
    kth = np.asarray(kth)
    r = det_rows.shape[0]
    fired = np.full((r, MAX_FIRED), -1, dtype=np.int32)
    ok = np.ones((r,), dtype=bool)
    hit = (det_rows >= kth[:, None]) & (det_rows > NEG_INF)
    for i in range(r):
        bins_i = np.nonzero(hit[i])[0]
        if bins_i.size > MAX_FIRED:
            ok[i] = False
        elif bins_i.size == 0:
            # defensive: a repair request with no fired bin (shouldn't
            # happen — the flag IS the det reduction) keeps the row's
            # current result via the pure top-k-rescore path
            pass
        else:
            fired[i, :bins_i.size] = bins_i.astype(np.int32)
    return fired, ok


def _gather_candidates(base, limits, out_idx, items, item_lambdas, n,
                       *, stride: int, m: int):
    """Candidate ids + validity for one repair chunk.

    A fired slice is encoded as a GLOBAL base offset + exclusive limit:
    its rows are base + j·stride for j < m, gidx < limit.  Single-chip:
    base = bin b, limit = n, stride = bins (rows ≡ b mod bins).  Mesh:
    base = shard·shard_n + local bin, limit = min((shard+1)·shard_n, n)
    — one formula covers both.  Candidates per row = the M fired
    slices' rows followed by the row's current top-k ids.  Returns
    (cand_idx (R, C) int32, valid (R, C) bool, rows (R, C, F),
    lams (R, C)) with C = M·m + k."""
    r, m_fired = base.shape
    k = out_idx.shape[1]
    j = jnp.arange(m, dtype=jnp.int32)
    gidx = (j[None, None, :] * stride
            + jnp.maximum(base, 0)[:, :, None])            # (R, M, m)
    valid_g = (base[:, :, None] >= 0) & (gidx < limits[:, :, None])
    out_i = out_idx.astype(jnp.int32)
    # current-top-k keep set: drop entries a fired slice covers (the
    # strided block re-scores them) and exact repeats (sentinel-slot
    # safety on tiny pools) so no candidate id appears twice in the sort
    diff = out_i[:, :, None] - base[:, None, :]             # (R, k, M)
    in_fired = jnp.any((base[:, None, :] >= 0) & (diff >= 0)
                       & (out_i[:, :, None] < limits[:, None, :])
                       & (diff % stride == 0), axis=2)
    earlier = (jnp.arange(k)[:, None] > jnp.arange(k)[None, :])[None]
    rep = jnp.any((out_i[:, :, None] == out_i[:, None, :]) & earlier,
                  axis=2)
    valid_o = (~in_fired) & (~rep) & (out_i >= 0) & (out_i < n)
    cand = jnp.concatenate([gidx.reshape(r, m_fired * m), out_i], axis=1)
    valid = jnp.concatenate([valid_g.reshape(r, m_fired * m), valid_o],
                            axis=1)
    safe = jnp.where(valid, cand, 0)
    rows = jnp.take(items, safe, axis=0)                    # (R, C, F)
    lams = jnp.take(item_lambdas, safe, axis=0)             # (R, C)
    return cand, valid, rows, lams


def _chunk_dtype(corpus_dtype):
    """Accumulation dtype for the repair chunk: f32 for the production
    f32/bf16 corpora (matches the kernels), the corpus dtype for the
    CPU/f64 oracle configurations (so mesh tests stay bitwise)."""
    if corpus_dtype in (jnp.bfloat16, jnp.float32):
        return jnp.float32
    return corpus_dtype


def _merge_topk(scores, cand, valid, k: int):
    """Two-key (-score, idx) sort over the candidate set — the exact
    extraction the kernel flush runs, so tie order matches lax.top_k."""
    scores = jnp.where(valid, scores, NEG_INF)
    ids = jnp.where(valid, cand, INT_MAX)
    sorted_neg, sorted_idx = jax.lax.sort((-scores, ids), num_keys=2,
                                          dimension=1)
    return -sorted_neg[:, :k], sorted_idx[:, :k]


def _block_diag_dot(qmat, rows3, dt):
    """Per-row candidate dots with MATMUL (not matvec) rounding.

    A batched dot_general over (R, C, F) is per-batch-element a (F)·(C,F)
    MATVEC, and TPU matvecs round differently from real matmuls (measured:
    a B=1 oracle slice disagrees with the B>=16 oracle / Mosaic kernels by
    ~1e-4, /tmp/prec_probe 2026-08-19) — which made repaired rows the one
    program family that broke bitwise cross-path parity.  This computes
    ONE 2D (max(R,16), R·C) matmul — the query side zero-padded to >= 16
    rows, the shape family measured bitwise-consistent with the kernels
    and the batched oracle — and takes the (i, i·C:(i+1)·C) block diagonal.
    Extra flops are R x the minimum, trivial at repair scale (R <= 32)."""
    r, c, f = rows3.shape
    flat = rows3.reshape(r * c, f)
    m_pad = max(16, r)
    qpad = jnp.pad(qmat, ((0, m_pad - r), (0, 0)))
    all_ = jax.lax.dot_general(
        qpad, flat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dt)                       # (m_pad, R*C)
    idx = jnp.arange(r)
    return all_[:r].reshape(r, r, c)[idx, idx]           # (R, C)


@functools.partial(jax.jit, static_argnames=("k", "stride", "m",
                                             "prepared", "use_bf16"))
def _lambda_repair_chunk(q, qlam, base, limits, out_idx, items,
                         item_lambdas, alpha, n, *, k: int, stride: int,
                         m: int, prepared: bool, use_bf16: bool):
    dt = _chunk_dtype(items.dtype)
    mm_dt = jnp.bfloat16 if use_bf16 else dt
    cand, valid, rows, lams = _gather_candidates(
        base, limits, out_idx, items, item_lambdas, n, stride=stride, m=m)
    if prepared:
        xhat = rows                       # already unit + mm_dt cast
    else:
        # _safe_unit arithmetic per gathered row (divide in the raw
        # dtype, THEN cast — matches _unit_padded bitwise)
        nrm = jnp.sqrt(jnp.sum(rows * rows, axis=-1, keepdims=True))
        ok = nrm > 0.0
        xhat = jnp.where(ok, rows / jnp.where(ok, nrm, 1.0),
                         0.0).astype(mm_dt)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    qok = qn > 0.0
    a32 = alpha.astype(dt)
    c1 = 1.0 - a32
    # canonical fma form (ops/search._shifted_lambda_plane): α rides the
    # prescaled query (multiply in dt, THEN cast — matches the kernel
    # wrapper's bits), the merge sorts the SHIFTED plane exactly like
    # the kernel flush, and +c1 is restored on the way out
    qhat = (jnp.where(qok, q / jnp.where(qok, qn, 1.0), 0.0)
            .astype(dt) * a32).astype(mm_dt)
    acos = _block_diag_dot(qhat, xhat, dt)                  # (R, C)
    dl = jnp.abs(qlam.astype(dt)[:, None] - lams.astype(dt))
    scores = acos - c1 * jnp.minimum(dl, 1.0)
    s, i = _merge_topk(scores, cand, valid, k)
    return s + c1, i


@functools.partial(jax.jit, static_argnames=("k", "stride", "m",
                                             "prepared"))
def _energy_repair_chunk(zq, qlam, base, limits, out_idx, z_items,
                         item_lambdas, z_norms, wl, wd, n, *, k: int,
                         stride: int, m: int, prepared: bool):
    dt = _chunk_dtype(z_items.dtype)
    cand, valid, rows, lams = _gather_candidates(
        base, limits, out_idx, z_items, item_lambdas, n, stride=stride,
        m=m)
    zx = rows.astype(dt)
    if prepared:
        xn = jnp.take(z_norms, jnp.where(valid, cand, 0), axis=0)
    else:
        xn = jnp.sum(zx * zx, axis=-1)
    zq = zq.astype(dt)
    qn = jnp.sum(zq * zq, axis=1)
    dot = _block_diag_dot(zq, zx, dt)                       # (R, C)
    # identical expression order to the kernel / chunked path (r4 fast
    # form): d2 = (qn + xn) - 2·dot, scores SHIFTED by +wd through the
    # merge (exactly what the kernel flush sorts), -wd restored on the
    # way out
    wd_d = wd.astype(dt)
    d2 = (qn[:, None] + xn) - 2.0 * dot
    # rsqrt2 form, byte-identical to _energy_kernel / the chunked oracle
    d2c = jnp.clip(d2, jnp.finfo(d2.dtype).tiny,
                 jnp.finfo(d2.dtype).max * 0.5)
    s_dir = d2c * jax.lax.rsqrt(d2c)
    u = wd_d * jax.lax.rsqrt(1.0 + 2.0 * s_dir + d2c)
    d_lam = jnp.abs(qlam.astype(dt)[:, None] - lams.astype(dt))
    scores = u - wl.astype(dt) * d_lam
    s, i = _merge_topk(scores, cand, valid, k)
    return s - wd_d, i


def _run_chunked(chunk_fn, r_total: int, r_cap: int, pack_fn):
    """Dispatch the repair in fixed-size row chunks (one compile per
    geometry); the last chunk pads by repeating row 0 and slices back.

    Uploads and fetches ride ONE batched transfer each (device_put /
    device_get of a tuple is a single interconnect round trip — four
    sequential jnp.asarray uploads measured ~2 extra RTTs ≈ 50 ms per
    repair through the tunnel)."""
    outs_s, outs_i = [], []
    for lo in range(0, r_total, r_cap):
        hi = min(lo + r_cap, r_total)
        take = np.arange(lo, hi)
        if hi - lo < r_cap:
            take = np.concatenate(
                [take, np.zeros(r_cap - (hi - lo), dtype=np.int64)])
        s, i = chunk_fn(*jax.device_put(pack_fn(take)))
        s_h, i_h = jax.device_get((s[:hi - lo], i[:hi - lo]))
        outs_s.append(s_h)
        outs_i.append(i_h)
    return np.concatenate(outs_s, axis=0), np.concatenate(outs_i, axis=0)


def _fired_to_slices(fired, stride: int, shard_n: int, n: int):
    """Decode fired det-plane columns into (base, limit) global slices.

    Single-chip (shard_n == n): column b is bin b — base = b, limit = n.
    Mesh (det planes all-gathered along the column axis): column c is
    shard s = c // stride, local bin b = c % stride — base =
    s·shard_n + b, limit = min((s+1)·shard_n, n)."""
    s = fired // stride
    b = fired % stride
    base = np.where(fired >= 0, s * shard_n + b, -1).astype(np.int32)
    limits = np.where(fired >= 0,
                      np.minimum((s + 1) * shard_n, n), 0).astype(np.int32)
    return base, limits


def _triage_rows(fired, ok, have_cur: bool):
    """Split flagged rows into (run, passthrough, overflow) index sets.

    Zero-fired rows are a routine MESH occurrence: the device flag
    fires against a shard's LOCAL pool kth, while fired_bins_host
    re-evaluates det against the merged GLOBAL kth (>= every local
    kth) — such rows are provably already exact and, when the caller
    supplied their current scores, pass through UNTOUCHED (re-scoring
    them would perturb near-ties within f32 matmul noise and waste a
    dispatch)."""
    zero_fired = (fired < 0).all(axis=1)
    can_pass = (zero_fired & ok) if have_cur \
        else np.zeros_like(ok, dtype=bool)
    run = np.nonzero(ok & ~can_pass)[0]
    return run, np.nonzero(can_pass)[0], np.nonzero(~ok)[0]


def _finish_repair(out_s, out_i, pass_rows, bad_rows, cur_scores,
                   out_idx_rows, fallback):
    """Shared wrapper tail: passthrough rows + MAX_FIRED-overflow rows."""
    if pass_rows.size:
        out_s[pass_rows] = np.asarray(cur_scores)[pass_rows]
        out_i[pass_rows] = np.asarray(out_idx_rows,
                                      dtype=np.int32)[pass_rows]
    if bad_rows.size:
        if fallback is None:
            raise RuntimeError(
                f"{bad_rows.size} flagged rows exceed "
                f"MAX_FIRED={MAX_FIRED} fired bins and no fallback "
                "repair was provided")
        s, i = fallback(bad_rows)
        out_s[bad_rows] = np.asarray(s)
        out_i[bad_rows] = np.asarray(i)
    return out_s, out_i


def strided_lambda_repair(q_rows, qlam_rows, det_rows, kth, out_idx_rows,
                          items, item_lambdas, alpha, *, k: int, n: int,
                          prepared: bool, use_bf16: bool, fallback=None,
                          shard_n: int = 0, cur_scores=None):
    """Exact repair of flagged λ-aware queries via their fired bins.

    q_rows (R, F) raw queries (host), qlam_rows (R,), det_rows (R, bins)
    and kth (R,) from the kernel's det plane / fetched scores,
    out_idx_rows (R, k) the flagged rows' current ids.  ``items`` /
    ``item_lambdas`` are device arrays — the PREPARED corpus
    (prepare_binned_corpus) when prepared=True, else the raw corpus.
    ``fallback(rel_rows) -> (scores, ids)`` handles rows whose fired-bin
    count exceeds MAX_FIRED (required if such rows can occur).
    ``cur_scores`` (R, k), when given, lets zero-fired rows (routine on
    the mesh, where the device flag uses the stricter per-shard kth)
    pass through bit-untouched instead of being rescored.

    shard_n > 0 marks a MESH det plane: per-shard (B, bins_local) det
    planes all-gathered along the column axis, ``items`` the sharded
    global corpus (prepared must be False — the per-shard prepared
    copies pad within each shard, breaking global indexing), and
    the fired columns decode to (shard, local bin) slices.  The miss
    argument carries over: a true global top-k element missing from the
    merged result must have been dropped by its shard's pool, so its
    shard's det ≥ its score ≥ the global kth — its column FIRED.

    All arithmetic runs in _chunk_dtype(items.dtype) — f32 for the
    production f32/bf16 corpora, f64 for the CPU/f64 oracle configs
    (λ values and alpha are NOT truncated to f32 on the way in).

    Returns (scores (R, k), ids (R, k) int32) as host arrays.
    """
    det_rows = np.asarray(det_rows)
    if shard_n and shard_n < n:
        assert not prepared, "mesh repair runs against the raw corpus"
        assert det_rows.shape[1] % (n // shard_n) == 0, (
            det_rows.shape, n, shard_n)
        stride = det_rows.shape[1] // (n // shard_n)
        m = (shard_n + stride - 1) // stride
    else:
        shard_n = n
        stride = det_rows.shape[1]
        m = int(np.ceil(items.shape[0] / stride)) if prepared \
            else int(np.ceil(_bucket_m(n, stride)))
    fired, ok = fired_bins_host(det_rows, np.asarray(kth))
    r_total = det_rows.shape[0]
    f = q_rows.shape[1]
    dt_c = _chunk_dtype(items.dtype)
    out_s = np.empty((r_total, k), dtype=np.dtype(dt_c))
    out_i = np.empty((r_total, k), dtype=np.int32)
    run, pass_rows, bad = _triage_rows(fired, ok, cur_scores is not None)

    if run.size:
        # q/qlam keep their incoming dtype: the kernel normalises
        # queries in the input dtype THEN casts to mm_dt (_unit_padded)
        # — the repair must divide in the same dtype to stay
        # bitwise-equal.  All per-chunk slicing happens HOST-SIDE on
        # numpy so the device only ever sees fixed (r_cap, ...) uploads
        # — a device gather sized by the flag count would compile per
        # novel count (see padded_take).
        q_h = np.asarray(q_rows)[run]
        ql_h = np.asarray(qlam_rows)[run]
        base_h, lim_h = _fired_to_slices(fired[run], stride, shard_n, n)
        oi_h = np.asarray(out_idx_rows, dtype=np.int32)[run]
        a_d = jnp.asarray(alpha, dtype=dt_c)
        n_d = jnp.asarray(n, dtype=jnp.int32)
        r_cap = _rows_per_dispatch(m, f)

        def pack(take):
            # raw numpy chunk slices: _run_chunked device_puts the whole
            # tuple in one batched transfer (device operands pass through)
            return (q_h[take], ql_h[take], base_h[take], lim_h[take],
                    oi_h[take], items, item_lambdas, a_d, n_d)

        chunk = functools.partial(_lambda_repair_chunk, k=k,
                                  stride=stride, m=m, prepared=prepared,
                                  use_bf16=use_bf16)
        s, i = _run_chunked(chunk, run.size, r_cap, pack)
        out_s[run], out_i[run] = s, i

    return _finish_repair(out_s, out_i, pass_rows, bad, cur_scores,
                          out_idx_rows, fallback)


def strided_energy_repair(zq_rows, qlam_rows, det_rows, kth, out_idx_rows,
                          z_items, item_lambdas, z_norms, wl, wd, *,
                          k: int, n: int, prepared: bool, fallback=None,
                          shard_n: int = 0, cur_scores=None):
    """Energy-score analogue of strided_lambda_repair (the kernel is
    binned_energy_topk; score per energymaps.rs:368-407).  zq_rows are
    the flagged queries ALREADY in z-space (the session step computes
    them; the caller re-derives z for the flagged block).

    shard_n > 0 marks a MESH det plane exactly as in
    strided_lambda_repair: per-shard det planes all-gathered along the
    column axis, z_items the sharded global z corpus (prepared must be
    False), fired columns decoding to (shard, local bin) slices."""
    det_rows = np.asarray(det_rows)
    if shard_n and shard_n < n:
        assert not prepared, "mesh repair runs against the raw z corpus"
        assert det_rows.shape[1] % (n // shard_n) == 0, (
            det_rows.shape, n, shard_n)
        stride = det_rows.shape[1] // (n // shard_n)
        m = (shard_n + stride - 1) // stride
    else:
        shard_n = n
        stride = det_rows.shape[1]
        m = int(np.ceil(z_items.shape[0] / stride)) if prepared \
            else int(np.ceil(_bucket_m(n, stride)))
    fired, ok = fired_bins_host(det_rows, np.asarray(kth))
    r_total = det_rows.shape[0]
    g = zq_rows.shape[1]
    dt_c = _chunk_dtype(z_items.dtype)
    out_s = np.empty((r_total, k), dtype=np.dtype(dt_c))
    out_i = np.empty((r_total, k), dtype=np.int32)
    run, pass_rows, bad = _triage_rows(fired, ok, cur_scores is not None)

    if run.size:
        # host-side chunk slicing — see strided_lambda_repair
        zq_h = np.asarray(zq_rows)[run]
        ql_h = np.asarray(qlam_rows)[run]
        base_h, lim_h = _fired_to_slices(fired[run], stride, shard_n, n)
        oi_h = np.asarray(out_idx_rows, dtype=np.int32)[run]
        zn_d = z_norms if z_norms is not None \
            else jnp.zeros((1,), dtype=dt_c)
        wl_d = jnp.asarray(wl, dtype=dt_c)
        wd_d = jnp.asarray(wd, dtype=dt_c)
        n_d = jnp.asarray(n, dtype=jnp.int32)
        r_cap = _rows_per_dispatch(m, g)

        def pack(take):
            # raw numpy chunk slices — batched device_put in _run_chunked
            return (zq_h[take], ql_h[take], base_h[take], lim_h[take],
                    oi_h[take], z_items, item_lambdas, zn_d, wl_d, wd_d,
                    n_d)

        chunk = functools.partial(_energy_repair_chunk, k=k,
                                  stride=stride, m=m, prepared=prepared)
        s, i = _run_chunked(chunk, run.size, r_cap, pack)
        out_s[run], out_i[run] = s, i

    return _finish_repair(out_s, out_i, pass_rows, bad, cur_scores,
                          out_idx_rows, fallback)


def _bucket_m(n: int, bins: int) -> int:
    """Rows-per-bin for the RAW-corpus path, keyed to the corpus row
    bucket so the repair program compiles once per bucket (the masked
    tail handles m·bins > n)."""
    from ..config import bucket_rows
    return (max(bucket_rows(n), bins) + bins - 1) // bins
