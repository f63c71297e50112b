"""ArrowIndex: a serving-grade facade over the build/persist/query cycle.

The reference exposes builder + ArrowSpace + storage as separate pieces;
this facade composes them the way a production deployment uses them:

    index = ArrowIndex.build(rows, eps=1e-3, k=6, seed=42)
    index.save("/ckpt", "prod")
    ...
    index = ArrowIndex.load("/ckpt", "prod")
    scores, ids = index.search(queries, k=10, alpha=0.9)   # batched,
                                                           # pallas on TPU
    hits = index.range(lo, hi)                             # O(log N + M)

Everything device-side is batched: query λ preparation is one fused
program, scoring + top-k auto-dispatches to the Pallas streaming kernel
for large corpora.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, List, Optional, Tuple

import numpy as np

from .builder import ArrowSpaceBuilder
from .core import ArrowItem, ArrowSpace
from .graph import GraphLaplacian
from .sampling import SamplerType
from .taumode import TauMode
from .utils.log import get_logger

logger = get_logger("arrowspace.index")

__all__ = ["ArrowIndex", "SearchSession", "EnergySearchSession"]


_SESSION_STEP = None


def _session_step_jit():
    """Module-level jitted serving step (lazy).  One program fuses query-λ
    preparation with scoring + top-k; statics carry the session config so
    (a) every SearchSession with the same config shares one executable and
    (b) precompile.py can AOT-lower it by shape alone.

    Returns (scores (B,k), ids_flags (B,k+1) int32, qlam (B,)): the last
    ids_flags column is non-zero for queries the binned kernel may have
    under-filled (deep bin collision — see ops/pallas_bintopk.py) and
    all-zero for the merge/XLA kernels.  Ids and flags share one array
    so the driver pays TWO device fetches per batch, not three — each
    fetch is a full tunnel round trip.  qlam rides along as a device
    array; the driver only fetches it on the rare repair path.  The
    binned kernel additionally returns its miss-detector plane det
    (B, bins) as a FOURTH element — also a device array the driver only
    touches on the repair path, where it identifies the fired bins for
    the cheap strided-bin exact repair (ops/bin_repair)."""
    global _SESSION_STEP
    if _SESSION_STEP is None:
        import functools
        import jax
        import jax.numpy as jnp

        @functools.partial(
            jax.jit, static_argnames=("taumode", "alpha", "k", "kernel",
                                      "has_proj", "pad_tall", "use_bf16",
                                      "n_items"))
        def step(q_raw, data, lambdas, lap, proj, *, taumode, alpha, k,
                 kernel, has_proj, pad_tall, use_bf16=False, n_items=0):
            # For kernel=="binned" with n_items > 0, `data`/`lambdas` are
            # the PREPARED corpus (prepare_binned_corpus): normalised,
            # bucket-padded, mm_dt-cast once at session construction —
            # the per-dispatch normalise+pad producer is a full corpus
            # read+write otherwise.  dt therefore comes from the query.
            from .ops.search import batched_lambda_aware_topk
            from .taumode import (QUERY_PREP_PRECISION, select_tau_batch,
                                  synthetic_lambda_batch)
            dt = q_raw.dtype
            q_prep = q_raw if not has_proj else jnp.dot(
                q_raw, proj, preferred_element_type=dt)
            taus = select_tau_batch(q_prep, taumode)
            qlam = synthetic_lambda_batch(q_prep, lap, taus,
                                          pad_items=pad_tall,
                                          precision=QUERY_PREP_PRECISION)
            if kernel == "binned":
                from .ops.pallas_bintopk import binned_lambda_topk
                s, i, fl, det = binned_lambda_topk(
                    q_raw, qlam, data, lambdas, alpha, k=k,
                    use_bf16=use_bf16, prepared=n_items > 0,
                    n_items=n_items, return_det=True)
                return (s, jnp.concatenate([i, fl[:, None]], axis=1),
                        qlam, det)
            zero_fl = jnp.zeros((q_raw.shape[0], 1), dtype=jnp.int32)
            if kernel == "merge":
                from .ops.pallas_topk import fused_lambda_topk
                s, i = fused_lambda_topk(q_raw, qlam, data, lambdas, alpha,
                                         k=k, use_bf16=use_bf16)
                return s, jnp.concatenate([i, zero_fl], axis=1), qlam
            s, i = batched_lambda_aware_topk(
                q_raw, qlam, data, lambdas, jnp.asarray(alpha, dtype=dt),
                k=k)
            return s, jnp.concatenate([i, zero_fl], axis=1), qlam

        _SESSION_STEP = step
    return _SESSION_STEP


_ENERGY_STEP = None


def _energy_step_jit():
    """Module-level jitted ENERGY serving step (lazy) — the energy-index
    counterpart of _session_step_jit: one program fuses query-λ
    preparation (projection, τ selection, synthetic λ against the energy
    laplacian) with the z-space projection and energy scoring + top-k
    (search_energy semantics, energymaps.rs:368-407).

    Returns (scores (B,k), ids_flags (B,k+1) int32, qlam (B,)) with the
    same flag/repair contract as the cosine step: the last ids_flags
    column is non-zero for queries the binned kernel may have
    under-filled (deep bin collision) and all-zero for the chunked
    kernel."""
    global _ENERGY_STEP
    if _ENERGY_STEP is None:
        import functools
        import jax
        import jax.numpy as jnp

        @functools.partial(
            jax.jit, static_argnames=("taumode", "k", "kernel", "chunk",
                                      "has_proj", "has_signals", "pad_tall",
                                      "n_items"))
        def step(q_raw, z_items, item_lambdas, lap, proj, signals, wl, wd,
                 z_norms, z_samp=None, xn_samp=None, *, taumode, k, kernel,
                 chunk, has_proj, has_signals, pad_tall, n_items=0):
            # n_items > 0 (binned only): z_items/item_lambdas/z_norms are
            # the prepared (padded, norms precomputed) corpus — see
            # prepare_binned_energy_corpus.  kernel == "binned_approx"
            # additionally takes the chord-fit sample (z_samp, xn_samp)
            # from ops.energy_approx.prepare_energy_chord_sample.
            from .energymaps import _energy_score_topk_chunked
            from .taumode import (QUERY_PREP_PRECISION, select_tau_batch,
                                  synthetic_lambda_batch)
            dt = q_raw.dtype
            q_prep = q_raw if not has_proj else jnp.dot(
                q_raw, proj, preferred_element_type=dt)
            taus = select_tau_batch(q_prep, taumode)
            qlam = synthetic_lambda_batch(q_prep, lap, taus,
                                          pad_items=pad_tall,
                                          precision=QUERY_PREP_PRECISION)
            z_q = jnp.dot(q_prep, signals.T, preferred_element_type=dt) \
                if has_signals else q_prep
            if kernel == "binned_approx":
                # chord-surrogate fold + exact candidate rescore; flags
                # mark UNCERTIFIED rows (margin could not separate the
                # k-th exact score from the best pruned bound) — the
                # stream driver re-runs those through the exact chunked
                # scorer.  No det plane: the certificate covers bin
                # collisions too (a dropped item is a surrogate loser,
                # so its bound is ≤ S_cut).
                from .ops.energy_approx import binned_energy_topk_approx
                s, i, fl = binned_energy_topk_approx(
                    z_q, qlam, z_items, item_lambdas, wl, wd,
                    z_samp, xn_samp, k=k, n_items=n_items,
                    z_norms=z_norms)
                return s, jnp.concatenate([i, fl[:, None]], axis=1), qlam
            if kernel == "binned":
                from .ops.pallas_bintopk import binned_energy_topk
                s, i, fl, det = binned_energy_topk(
                    z_q, qlam, z_items, item_lambdas, wl, wd, k=k,
                    prepared=n_items > 0, n_items=n_items,
                    z_norms=(z_norms if n_items > 0 else None),
                    return_det=True)
                return (s, jnp.concatenate([i, fl[:, None]], axis=1),
                        qlam, det)
            s, i = _energy_score_topk_chunked(
                z_q, qlam, z_items, item_lambdas, wl, wd, k=k, chunk=chunk)
            zero_fl = jnp.zeros((q_raw.shape[0], 1), dtype=jnp.int32)
            return s, jnp.concatenate([i, zero_fl], axis=1), qlam

        _ENERGY_STEP = step
    return _ENERGY_STEP


def energy_session_config(nitems: int, k: int, z_width: int
                          ) -> Tuple[str, int]:
    """(kernel, chunk) for the energy serving step (shared with
    precompile so AOT keys match runtime keys): the Mosaic
    bin-accumulator kernel where the TPU gate admits it, else the exact
    chunked scorer with its scan chunk clamped to the corpus row bucket
    (a small corpus must not pad its scan to the 65536 in-memory
    ceiling)."""
    from .config import bucket_rows
    from .energymaps import ENERGY_CHUNK, _use_binned_energy
    kernel = "binned" if _use_binned_energy(nitems, k, z_width) \
        else "chunked"
    chunk = min(ENERGY_CHUNK, max(bucket_rows(nitems), 8))
    return kernel, chunk


def session_kernel_kind(nitems: int, k: int, f: int = None) -> str:
    """The serving step's kernel dispatch (shared with precompile):
    "binned" — bin-accumulator streaming kernel + rare exact repair
    (the fast path; k <= 128 — the (48, 128] band rides the depth-4 /
    bins-512 layout instead of falling off onto the per-slot-unrolled
    merge kernel, whose honest B=2048 wall is ~7x the binned kernel's;
    the double-buffered f32 item tile caps F at ~1536 under the 16 MB
    scoped-VMEM limit even at the smallest block);
    "merge" — the exact streaming-merge kernel (manual/repair use only
    since r4); "xla" — matmul + lax.top_k (any k, any F)."""
    import jax
    if jax.default_backend() != "tpu" or nitems < 65536:
        return "xla"
    if k <= 128 and (f is None or f <= 1536):
        return "binned"
    return "xla"


def session_uses_pallas(nitems: int, k: int) -> bool:
    """Back-compat alias: whether a Pallas kernel serves this config."""
    return session_kernel_kind(nitems, k) != "xla"


def stream_search(step, batches, batch_size: int, depth: int, dt,
                  dim=None, repair=None, async_fetch: bool = True):
    """Shared pipelined stream driver (used by SearchSession and
    parallel.DistributedSearchSession): yield (scores, ids) per input
    batch with `depth` batches in flight — dispatch batch i+1 before
    fetching batch i's results.  Partial batches (e.g. a stream tail)
    are padded to batch_size so the compiled step is never retraced
    mid-stream; their results are sliced back.

    Steps may return (scores, ids) or (scores, ids_flags (B, k+1), qlam)
    — the session-step shape, where the last ids_flags column marks rows
    the binned kernel may have under-filled — or (scores, ids_flags,
    qlam, det) with the binned kernel's miss-detector plane riding along
    as a device array.  Flagged rows are re-run through
    `repair(q_block, qlam, rows) -> (scores, ids)` at yield time (the
    binned kernel's rare deep-collision fallback — the flag arrives with
    the ids fetch, after `depth` further batches are already in flight,
    so the check costs no extra round trip).  When det is present the
    driver fetches only the flagged rows' det slice (one batched
    round trip with qlam) and hands `repair` the keyword operands
    (scores=, ids=, det_rows=) the strided-bin exact repair needs
    (ops/bin_repair) — ~0.3 ms of gather+matmul instead of a
    full-corpus exact pass.

    async_fetch moves the device_get (a full interconnect round trip
    per batch — ~25 ms on this tunnel) onto a fetch thread, so the main
    loop's query uploads overlap result downloads instead of
    serialising with them; yield order is preserved by the pending
    queue.  Repair (rare) also runs on the fetch thread."""
    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    def finish(out, m, qb):
        # Fetch the FULL device arrays and slice partial tails on the
        # host: a device-side s[:m] compiles one slice program PER
        # NOVEL TAIL SIZE (~1 s each through the remote-compile
        # tunnel), while the full fetch costs at most a few extra KB
        # on the one tail batch a stream ends with.
        if len(out) == 2:
            s, i = out
            s, i = jax.device_get((s, i))
            return s[:m], i[:m]
        s, ii, qlam = out[:3]
        det = out[3] if len(out) > 3 else None
        # ONE device_get for both arrays: the tunnel batches a tuple
        # fetch into a single round trip (measured 24.8 vs 49.7 ms for
        # two sequential np.asarray fetches)
        s, ii = jax.device_get((s, ii))
        s, ii = s[:m], ii[:m]
        i, flags = ii[:, :-1], ii[:, -1]
        if flags.any() and repair is not None:
            rows = np.nonzero(flags)[0]
            s, i = s.copy(), i.copy()  # np.asarray views are read-only
            if det is not None:
                # one batched round trip for the repair operands; det is
                # fetched only for the flagged rows, with the gather
                # padded to a power-of-two bucket (a raw-count gather
                # compiles per novel flag count — see
                # ops/bin_repair.padded_take)
                from .ops.bin_repair import padded_take
                take = padded_take(rows)
                qlam_h, det_rows = jax.device_get((qlam, det[take]))
                rs, ri = repair(qb, qlam_h, rows, scores=s, ids=i,
                                det_rows=det_rows[:len(rows)])
            else:
                rs, ri = repair(qb, np.asarray(qlam), rows)
            s[rows], i[rows] = rs, ri
        return s, i

    executor = ThreadPoolExecutor(max_workers=1) if async_fetch else None
    try:
        pending = deque()
        for qb in batches:
            # Cast to the session dtype on the HOST: a raw f64 batch
            # otherwise crosses the tunnel at double width (256x128 f64
            # = 256 KB vs 128 KB, ~4 ms at the ~35 MB/s tunnel) and
            # compiles a device-side convert_element_type on the first
            # production search (the post-warmup ~1 s compile
            # benchmarks/live_tpu_session.py measured).  np and XLA
            # round f64->f32 identically (to-nearest-even), so scores
            # are bitwise-unchanged; repair callbacks receive the same
            # once-rounded values they would have produced themselves.
            qb = np.ascontiguousarray(qb, dtype=np.dtype(dt))
            nq = qb.shape[0]
            if dim is not None and qb.shape[1] != dim:
                raise ValueError(
                    f"query batch has {qb.shape[1]} features but the "
                    f"session index has {dim}")
            if nq != batch_size:
                assert nq < batch_size, (
                    f"batch of {nq} exceeds the session batch_size "
                    f"{batch_size}")
                qb = np.pad(qb, ((0, batch_size - nq), (0, 0)),
                            constant_values=1.0)
            q = jnp.asarray(qb, dtype=dt)
            out = step(q)  # async dispatch
            if executor is not None:
                pending.append(executor.submit(finish, out, nq, qb))
            else:
                pending.append((out, nq, qb))
            if len(pending) > depth:
                item = pending.popleft()
                yield item.result() if executor is not None \
                    else finish(*item)
        while pending:
            item = pending.popleft()
            yield item.result() if executor is not None else finish(*item)
    finally:
        if executor is not None:
            executor.shutdown(wait=False)


def warm_step(step, batch_size: int, dim: int, dt, repair=None,
              k: int = 0) -> None:
    """Compile a session step so serving latency is dispatch-only.

    When the step carries a det plane and a repair callback is given,
    also run ONE synthetic flagged-row repair: the strided-repair chunk
    program (ops/bin_repair) otherwise compiles on the first flagged
    batch in production — a multi-second XLA compile landing on the
    serving fetch thread at an unpredictable time."""
    import jax.numpy as jnp
    # One full-batch pass through the PRODUCTION stream driver first:
    # this compiles every program of the unflagged serving path exactly
    # as a real search runs it (host upload, step, result fetch) —
    # probing the step directly missed the driver-level programs and
    # left benchmarks/live_tpu_session.py's first searches paying ~1 s
    # one-off compiles after warmup.
    list(stream_search(step, [np.ones((batch_size, dim))], batch_size,
                       1, dt, dim=dim, repair=None, async_fetch=False))
    out = step(jnp.ones((batch_size, dim), dtype=dt))
    np.asarray(out[0][:1, :1])
    if repair is not None and len(out) > 3 and k > 0:
        import jax
        from .ops.pallas_bintopk import NEG_INF
        bins = out[3].shape[1]
        scores = np.zeros((batch_size, k), np.float32)
        ids = np.tile(np.arange(k, dtype=np.int32), (batch_size, 1))
        qb = np.ones((batch_size, dim), dtype=dt)
        # sweep the flag-count buckets seen in practice (larger counts
        # are adversarial-only): each bucket compiles its det-gather
        # fetch AND, for repairs that run device programs sized by the
        # padded row bucket (the energy session's z projection), those
        # programs too — otherwise each bucket's first occurrence costs
        # a remote compile on the serving fetch thread
        for b in (1, 2, 4, 8, 16):
            rows = np.arange(min(b, batch_size))
            det_rows = np.full((len(rows), bins), NEG_INF, np.float32)
            det_rows[:, 0] = 1.0                  # one fired bin per row
            take = np.zeros(b, dtype=np.int64)
            jax.device_get((out[2], out[3][take]))
            repair(qb, np.zeros(batch_size, np.float32), rows,
                   scores=scores, ids=ids, det_rows=det_rows)


class SearchSession:
    """Compiled, pipelined streaming search for serving.

    One jitted program fuses query-λ preparation (projection, τ selection,
    synthetic λ) with scoring + top-k, so a batch costs ONE dispatch.  The
    stream driver keeps `depth` batches in flight: while batch i's results
    cross the interconnect back to the host, batch i+1 is already
    computing — the reference's per-query scan (core.rs:760-798) has no
    pipelining to mirror; this is the serving loop a TPU deployment needs.
    """

    def __init__(self, index: "ArrowIndex", batch_size: int, k: int = 10,
                 alpha: float = 0.9, depth: int = 2,
                 precision: str = "f32", prepare_corpus: bool = True):
        """prepare_corpus=True (default) hoists the per-dispatch
        normalise+bucket-pad producer to construction (measured 10.06 ->
        7.30 ms per real 2048-batch dispatch at 1M x 128 f32) at the
        cost of keeping a SECOND corpus-sized array resident for the
        session's lifetime (~+n_pad*F*4 bytes f32, half that bf16 — at
        10M x 128 that is ~5.2 GB of the 15.75 GB HBM next to the raw
        corpus the index owns).  Pass False to trade the dispatch time
        back for the memory (e.g. to co-host two 10M sessions)."""
        import jax.numpy as jnp

        if precision not in ("f32", "bf16"):
            raise ValueError(f"unsupported session precision {precision!r}")
        self.batch_size = int(batch_size)
        self.k = min(int(k), index.nitems)
        self.depth = max(1, int(depth))
        aspace, gl = index.aspace, index.gl

        dt = aspace.data.dtype
        self._dt = dt
        data, lambdas = aspace.data, aspace.lambdas
        lap = jnp.asarray(gl.matrix, dtype=dt)
        proj = None
        if aspace.projection_matrix is not None:
            proj = aspace.projection_matrix.matrix(dtype=dt)
        taumode = aspace.taumode
        k_eff = self.k
        kernel = session_kernel_kind(index.nitems, k_eff,
                                     aspace.nfeatures)

        has_proj = proj is not None
        pad_tall = aspace.pad_tall_graphs

        # The corpus arrays are ARGUMENTS, not closure captures: jit would
        # otherwise embed them as HLO constants (a 512 MB program blows the
        # remote-compile request limit and bloats the executable).
        # bf16 runs the scoring matmul in bf16 with f32 accumulation
        # (4x MXU rate, half the corpus HBM traffic); requires a Pallas
        # kernel, so f32 is kept otherwise.
        use_bf16 = precision == "bf16" and kernel != "xla"
        jitted = _session_step_jit()
        dummy_proj = proj if has_proj else jnp.zeros((1, 1), dtype=dt)
        n_items = 0
        step_data, step_lambdas = data, lambdas
        if kernel == "binned" and dt == jnp.float32 and prepare_corpus:
            # One-time corpus preparation (normalise + bucket-pad +
            # mm_dt cast) hoisted out of the per-dispatch program; the
            # raw arrays stay owned by the index (repair + the other
            # search APIs use them).
            from .ops.pallas_bintopk import prepare_binned_corpus
            step_data, step_lambdas = prepare_binned_corpus(
                data, lambdas, bsz=self.batch_size, k=k_eff,
                use_bf16=use_bf16)
            n_items = index.nitems
        self._step = lambda q: jitted(
            q, step_data, step_lambdas, lap, dummy_proj, taumode=taumode,
            alpha=float(alpha), k=k_eff, kernel=kernel,
            has_proj=has_proj, pad_tall=pad_tall, use_bf16=use_bf16,
            n_items=n_items)
        self._dim = aspace.nfeatures

        def repair(q_block, qlam, rows, scores=None, ids=None,
                   det_rows=None):
            # Deep-bin-collision fallback (see ops/pallas_bintopk.py).
            # With the det plane (the driver fetches it for flagged rows
            # only) the strided-bin exact repair rescores just the fired
            # bins' rows + the current top-k (~0.3 ms of gather+matmul
            # at 1M×128); rows whose fired-bin count overflows — and
            # legacy callers without a det plane — take the full
            # exact streaming-merge kernel over the raw corpus.
            from .ops.pallas_topk import fused_lambda_topk

            def full_merge(rel_rows):
                # padded to a fixed 128 on the HOST so one compiled
                # merge program serves any flagged count (the jit trace
                # is keyed on B — a novel count costs a full compile
                # through the remote-compile service)
                rr = rows[rel_rows]
                m = len(rr)
                pad = (-m) % 128
                qs = np.pad(np.asarray(q_block)[rr], ((0, pad), (0, 0)),
                            constant_values=1.0)
                qls = np.pad(np.asarray(qlam)[rr], (0, pad))
                rs, ri = fused_lambda_topk(
                    jnp.asarray(qs, dtype=dt), jnp.asarray(qls, dtype=dt),
                    data, lambdas, float(alpha), k=k_eff,
                    use_bf16=use_bf16)
                return np.asarray(rs)[:m], np.asarray(ri)[:m]

            if det_rows is None:
                return full_merge(np.arange(len(rows)))
            from .ops.bin_repair import strided_lambda_repair
            return strided_lambda_repair(
                np.asarray(q_block[rows], dtype=dt), qlam[rows],
                det_rows, scores[rows, k_eff - 1], ids[rows],
                step_data if n_items > 0 else data,
                step_lambdas if n_items > 0 else lambdas,
                float(alpha), k=k_eff, n=self._n_items_true,
                prepared=n_items > 0, use_bf16=use_bf16,
                fallback=full_merge, cur_scores=scores[rows])

        self._n_items_true = index.nitems
        self._repair = repair if kernel == "binned" else None

    def warmup(self) -> None:
        """Compile the step program (and the strided-repair chunk for
        flagged rows) so serving latency is dispatch-only."""
        warm_step(self._step, self.batch_size, self._dim, self._dt,
                  repair=self._repair, k=self.k)

    def search_stream(self, batches: Iterable) -> Iterable[Tuple[np.ndarray,
                                                                 np.ndarray]]:
        """Yield (scores, ids) per input batch, keeping `depth` batches in
        flight — see stream_search (shared with the multi-chip session)."""
        return stream_search(self._step, batches, self.batch_size,
                             self.depth, self._dt, dim=self._dim,
                             repair=self._repair)


class EnergySearchSession:
    """Compiled, pipelined streaming ENERGY search for serving.

    The energy-index counterpart of SearchSession: one jitted program
    fuses query-λ preparation with the z-space projection and energy
    scoring + top-k (search_energy_batch semantics,
    energymaps.rs:368-407), so a batch costs ONE dispatch; the shared
    stream driver keeps `depth` batches in flight and repairs
    deep-bin-collision flagged rows through the exact chunked scorer."""

    def __init__(self, index: "ArrowIndex", batch_size: int, k: int = 10,
                 w_lambda: float = 1.0, w_dirichlet: float = 0.5,
                 depth: int = 2, prepare_corpus: bool = True,
                 approx: bool = False):
        # prepare_corpus: see SearchSession — hoists the z-plane pad +
        # norm reduce to construction at the cost of a second z-plane-
        # sized resident array.
        # approx=True routes the binned path through the chord-surrogate
        # kernel (ops/energy_approx): certified rows are bitwise the
        # chunked oracle's, uncertified rows transparently re-run through
        # the exact chunked scorer — results are ALWAYS exact; only the
        # rate degrades on data whose score margins defeat the bounds.
        import jax.numpy as jnp

        from .energymaps import (_energy_score_topk_chunked,
                                 _energy_z_items)

        self.batch_size = int(batch_size)
        self.k = min(int(k), index.nitems)
        self.depth = max(1, int(depth))
        aspace, gl = index.aspace, index.gl

        dt = aspace.data.dtype
        self._dt = dt
        self._dim = aspace.nfeatures
        lap = jnp.asarray(gl.matrix, dtype=dt)
        proj = None
        if aspace.projection_matrix is not None:
            proj = aspace.projection_matrix.matrix(dtype=dt)
        has_proj = proj is not None
        items_proj = aspace.projected_items()
        use_signals = (aspace.signals is not None
                       and np.shape(aspace.signals)[0] > 0
                       and np.shape(aspace.signals)[1]
                       == items_proj.shape[1])
        signals = jnp.asarray(aspace.signals, dtype=dt) if use_signals \
            else jnp.zeros((1, 1), dtype=dt)
        z_items = _energy_z_items(aspace, items_proj, signals, use_signals)
        lambdas = aspace.lambdas
        taumode = aspace.taumode
        pad_tall = aspace.pad_tall_graphs
        k_eff = self.k
        kernel, chunk = energy_session_config(index.nitems, k_eff,
                                              z_items.shape[1])
        wl = jnp.asarray(w_lambda, dtype=dt)
        wd = jnp.asarray(w_dirichlet, dtype=dt)

        # corpus arrays are ARGUMENTS, not closure captures (HLO-constant
        # embedding blows the remote-compile request limit — see
        # SearchSession)
        jitted = _energy_step_jit()
        dummy_proj = proj if has_proj else jnp.zeros((1, 1), dtype=dt)
        n_items = 0
        step_z, step_lam = z_items, lambdas
        z_norms = jnp.zeros((1,), dtype=dt)
        if kernel == "binned" and dt == jnp.float32 and prepare_corpus:
            # one-time pad + norm hoist (see SearchSession / the cosine
            # prepare_binned_corpus); raw z_items stay for repair
            from .ops.pallas_bintopk import prepare_binned_energy_corpus
            step_z, step_lam, z_norms = prepare_binned_energy_corpus(
                z_items, lambdas, bsz=self.batch_size, k=k_eff)
            n_items = index.nitems
        z_samp = xn_samp = None
        if approx and kernel == "binned" and n_items > 0:
            # chord-surrogate path: one-time sampled-row gather for the
            # per-query knot fit (ops/energy_approx module docstring)
            from .ops.energy_approx import prepare_energy_chord_sample
            kernel = "binned_approx"
            z_samp, xn_samp = prepare_energy_chord_sample(
                step_z, z_norms, index.nitems)
        elif approx:
            raise ValueError(
                "approx=True needs the binned serving path (TPU backend, "
                "corpus past the in-memory ceiling, k <= 128, f32 "
                f"prepared corpus); this session resolved kernel="
                f"{kernel!r}, prepared={n_items > 0}")
        self.kernel = kernel
        self._step = lambda q: jitted(
            q, step_z, step_lam, lap, dummy_proj, signals, wl, wd,
            z_norms, z_samp, xn_samp, taumode=taumode, k=k_eff,
            kernel=kernel, chunk=chunk, has_proj=has_proj,
            has_signals=use_signals, pad_tall=pad_tall, n_items=n_items)

        def repair(q_block, qlam, rows, scores=None, ids=None,
                   det_rows=None):
            # flagged rows' z is recomputed from the raw block (rare
            # path — see ops/pallas_bintopk.binned_energy_topk).  With
            # the det plane the strided-bin exact repair rescores just
            # the fired bins' rows + the current top-k; overflow rows
            # (and legacy callers) take the exact chunked scorer.  The
            # z computation runs on a power-of-two padded row block so
            # its programs compile once per bucket, not per flag count.
            from .ops.bin_repair import padded_take
            take = padded_take(rows)
            q = jnp.asarray(q_block[take], dtype=dt)
            q_prep = q if not has_proj else jnp.dot(
                q, proj, preferred_element_type=dt)
            z_pad = jnp.dot(q_prep, signals.T, preferred_element_type=dt) \
                if use_signals else q_prep
            z = np.asarray(z_pad)[:len(rows)]

            def full_chunked(rel_rows):
                # fixed-128 host pad: one compiled chunked-scorer
                # program serves any flagged count
                m = len(rel_rows)
                pad = (-m) % 128
                zs = np.pad(z[rel_rows], ((0, pad), (0, 0)))
                qls = np.pad(np.asarray(qlam)[rows[rel_rows]], (0, pad))
                rs, ri = _energy_score_topk_chunked(
                    jnp.asarray(zs, dtype=dt), jnp.asarray(qls, dtype=dt),
                    z_items, lambdas, wl, wd, k=k_eff)
                return np.asarray(rs)[:m], np.asarray(ri)[:m]

            def binned_fallback(rel_rows):
                # approx-path uncertified rows: one EXACT binned-kernel
                # block (~2.4 ms corpus stream at a 256-row block)
                # instead of the XLA chunked scan (~10x that) — the
                # kernel is bitwise the oracle on unflagged rows; its
                # own (rare, deep-collision) flags then take the
                # chunked scorer.  Fixed 128-row host pad keeps it one
                # compiled program per bucket.
                import jax as _jax
                from .ops.pallas_bintopk import binned_energy_topk
                m = len(rel_rows)
                pad = (-m) % 128
                zs = np.pad(z[rel_rows], ((0, pad), (0, 0)))
                qls = np.pad(np.asarray(qlam)[rows[rel_rows]], (0, pad))
                rs, ri, rfl = binned_energy_topk(
                    jnp.asarray(zs, dtype=dt), jnp.asarray(qls, dtype=dt),
                    step_z, step_lam, wl, wd, k=k_eff, prepared=True,
                    n_items=n_items, z_norms=z_norms)
                rs, ri, rfl = _jax.device_get((rs, ri, rfl))
                rs, ri = rs[:m].copy(), ri[:m].copy()
                bad = np.nonzero(rfl[:m])[0]
                if len(bad):
                    cs, ci = full_chunked(rel_rows[bad])
                    rs[bad], ri[bad] = cs, ci
                return rs, ri

            if det_rows is None:
                rel = np.arange(len(rows))
                if kernel == "binned_approx" and n_items > 0:
                    return binned_fallback(rel)
                return full_chunked(rel)
            from .ops.bin_repair import strided_energy_repair
            return strided_energy_repair(
                np.asarray(z), qlam[rows], det_rows,
                scores[rows, k_eff - 1], ids[rows],
                step_z if n_items > 0 else z_items,
                step_lam if n_items > 0 else lambdas,
                z_norms if n_items > 0 else None,
                float(w_lambda), float(w_dirichlet), k=k_eff,
                n=self._n_items_true, prepared=n_items > 0,
                fallback=full_chunked, cur_scores=scores[rows])

        self._n_items_true = index.nitems
        self._repair = repair \
            if kernel in ("binned", "binned_approx") else None

    def warmup(self) -> None:
        """Compile the step program (and the strided-repair chunk for
        flagged rows) so serving latency is dispatch-only."""
        warm_step(self._step, self.batch_size, self._dim, self._dt,
                  repair=self._repair, k=self.k)
        if self.kernel == "binned_approx" and self._repair is not None:
            # the approx step carries no det plane, so warm_step's
            # strided-repair sweep skips — warm the uncertified-row
            # fallback (exact chunked scan; fixed-128 row pad = one
            # program, plus the padded_take z-projection buckets) here,
            # or its multi-second compile lands on the serving fetch
            # thread at the first flagged batch
            qb = np.ones((self.batch_size, self._dim),
                         dtype=np.dtype(self._dt))
            qlam = np.zeros(self.batch_size, np.float32)
            # every padded_take bucket warm_step's det sweep would cover:
            # a first flagged batch with 2/4/16 uncertified rows must not
            # compile its per-bucket z-projection on the fetch thread
            for b in (1, 2, 4, 8, 16):
                self._repair(qb, qlam, np.arange(min(b, self.batch_size)))

    def search_stream(self, batches: Iterable) -> Iterable[Tuple[np.ndarray,
                                                                 np.ndarray]]:
        """Yield (scores, ids) per input batch, keeping `depth` batches in
        flight — see stream_search (shared with SearchSession)."""
        return stream_search(self._step, batches, self.batch_size,
                             self.depth, self._dt, dim=self._dim,
                             repair=self._repair)


class ArrowIndex:
    """Built index = ArrowSpace + GraphLaplacian + builder config."""

    def __init__(self, aspace: ArrowSpace, gl: GraphLaplacian,
                 builder: Optional[ArrowSpaceBuilder] = None):
        self.aspace = aspace
        self.gl = gl
        self.builder = builder

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, rows, *, eps: float = 1e-3, k: int = 6, topk: int = 3,
              p: float = 2.0, sigma: Optional[float] = None,
              taumode: TauMode = TauMode.median(),
              normalise: bool = False,
              sampling: Optional[SamplerType] = SamplerType.simple(0.6),
              dims_reduction: bool = False,
              rp_eps: Optional[float] = None,
              seed: Optional[int] = None,
              spectral: bool = False) -> "ArrowIndex":
        b = (ArrowSpaceBuilder()
             .with_lambda_graph(eps, k, topk, p, sigma)
             .with_synthesis(taumode)
             .with_normalisation(normalise)
             .with_inline_sampling(sampling)
             .with_dims_reduction(dims_reduction, rp_eps))
        if spectral:
            b = b.with_spectral(True)
        if seed is not None:
            b = b.with_seed(seed)
        aspace, gl = b.build(rows)
        return cls(aspace, gl, b)

    @classmethod
    def build_energy(cls, rows, energy_params=None, *,
                     seed: Optional[int] = None,
                     **kwargs) -> "ArrowIndex":
        from .energymaps import EnergyParams, build_energy
        b = ArrowSpaceBuilder().with_dims_reduction(True, kwargs.get(
            "rp_eps", 0.5))
        if "eps" in kwargs:
            b = b.with_lambda_graph(kwargs["eps"], kwargs.get("k", 6),
                                    kwargs.get("topk", 3),
                                    kwargs.get("p", 2.0),
                                    kwargs.get("sigma"))
        if seed is not None:
            b = b.with_seed(seed)
        aspace, gl = build_energy(b, rows,
                                  energy_params or EnergyParams())
        return cls(aspace, gl, b)

    # ------------------------------------------------------------------
    def _synthesize_builder(self) -> ArrowSpaceBuilder:
        """Builder config reconstructed from live index state, used when
        no builder was attached (always the case for loaded indexes).
        Persisting defaults instead would silently change query-lambda
        preparation on load->save->load round trips."""
        b = ArrowSpaceBuilder()
        b.synthesis = self.aspace.taumode
        gp = getattr(self.gl, "graph_params", None)
        if gp is not None:
            b.with_lambda_graph(gp.eps, gp.k, gp.topk, gp.p, gp.sigma)
            b.normalise = gp.normalise
            b.sparsity_check = gp.sparsity_check
        b.use_dims_reduction = self.aspace.projection_matrix is not None
        b.prebuilt_spectral = (self.aspace.signals is not None
                               and self.aspace.signals.shape[0] > 0)
        b.cluster_max_clusters = self.aspace.n_clusters or None
        b.cluster_radius = self.aspace.cluster_radius or 1.0
        return b

    def save(self, path, name: str) -> None:
        """Persist via the builder's Parquet artifacts so the reference's
        tooling can read them back too."""
        from .storage import parquet as pq
        import pathlib
        base = pathlib.Path(path)
        base.mkdir(parents=True, exist_ok=True)
        b = self.builder or self._synthesize_builder()
        pq.save_dense_matrix_with_builder(
            np.asarray(self.aspace.data, dtype=np.float64), base,
            f"{name}-raw_input", b)
        pq.save_dense_matrix_with_builder(
            np.asarray(self.gl.init_data, dtype=np.float64).T, base,
            f"{name}-laplacian-input", b)
        pq.save_sparse_matrix_with_builder(
            self.gl.matrix, base, f"{name}-gl-matrix", b,
            structural_nnz=self.gl.structural_nnz)
        pq.save_lambda_with_builder(
            np.asarray(self.aspace.lambdas, dtype=np.float64), base,
            f"{name}-lambdas", b, projection=self.aspace.projection_matrix)
        if self.aspace.signals is not None and \
                self.aspace.signals.shape[0] > 0:
            pq.save_sparse_matrix_with_builder(
                self.aspace.signals, base, f"{name}-aspace-signals", b)
        logger.info("index saved to %s as '%s'", base, name)

    @classmethod
    def load(cls, path, name: str) -> "ArrowIndex":
        from .storage import parquet as pq
        aspace, gl = pq.load_arrowspace_index(path, name)
        return cls(aspace, gl)

    # ------------------------------------------------------------------
    def search(self, queries, k: int = 10, alpha: float = 0.9,
               use_pallas: Optional[bool] = None,
               precision: str = "f32",
               rescore_pool: Optional[int] = None):
        """Batched λ-aware search: (B, F) -> (scores (B, k), ids (B, k)).
        Query λ preparation is fused; scoring auto-uses the Pallas
        streaming top-k on TPU for large corpora.

        precision="bf16" runs the cosine matmul in bf16 with f32
        accumulation (4× MXU rate, half the HBM traffic; top-10 overlap
        1.000 vs f32 in our 1M/768-d measurements, returned scores differ
        in the 3rd decimal).

        precision="f64_rescore" re-ranks a device candidate pool against
        the original f64 rows on the host, recovering exact f64 tie
        ordering among near-duplicate cosines (the clustered-data regime
        where plain f32 recall@10 drops to ~0.96).  rescore_pool sizes
        the pool (default max(4k, k+32)); corpora with heavy
        near-duplication need a pool of roughly the duplicate
        multiplicity — if more rows tie within f32 resolution than the
        pool holds, the f64 top-k may not be in the pool at all
        (measured: 25-base x 4000-copy replicated 384-d embeddings need
        a ~4096 pool; the default suffices for distinct rows)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        qlam = self.aspace.prepare_query_items_batch(queries, self.gl)
        if precision == "f64_rescore":
            from .ops.search import rescore_topk_f64
            if self.aspace.host_rows is None:
                raise ValueError(
                    "f64_rescore needs the original f64 rows; they were "
                    "invalidated by an in-place device mutation")
            m = min(rescore_pool or max(4 * k, k + 32),
                    self.aspace.nitems)
            _s, cand = self.aspace.search_lambda_aware_batch(
                queries, np.asarray(qlam), m, alpha, use_pallas=use_pallas)
            return rescore_topk_f64(
                queries, np.asarray(qlam), self.aspace.host_rows,
                np.asarray(self.aspace.lambdas), alpha, np.asarray(cand),
                min(k, self.aspace.nitems))
        if precision == "bf16":
            import jax
            import jax.numpy as jnp
            if jax.default_backend() == "tpu":
                k_eff = min(k, self.aspace.nitems)
                qd = jnp.asarray(np.asarray(queries, dtype=np.float32))
                qld = jnp.asarray(np.asarray(qlam, dtype=np.float32))
                if k_eff <= 48:
                    from .ops.search import pallas_binned_topk_with_repair
                    scores, ids = pallas_binned_topk_with_repair(
                        qd, qld, self.aspace.data, self.aspace.lambdas,
                        alpha, k=k_eff, use_bf16=True)
                else:
                    from .ops.pallas_topk import fused_lambda_topk
                    scores, ids = fused_lambda_topk(
                        qd, qld, self.aspace.data, self.aspace.lambdas,
                        alpha, k=k_eff, use_bf16=True)
                return np.asarray(scores), np.asarray(ids)
            # bf16 matmuls are a TPU MXU feature; elsewhere fall through
        scores, ids = self.aspace.search_lambda_aware_batch(
            queries, np.asarray(qlam), k, alpha, use_pallas=use_pallas)
        return np.asarray(scores), np.asarray(ids)

    def search_one(self, query, k: int = 10, alpha: float = 0.9
                   ) -> List[Tuple[int, float]]:
        qlam = self.aspace.prepare_query_item(query, self.gl)
        return self.aspace.search_lambda_aware(ArrowItem(query, qlam), k,
                                               alpha)

    def search_hybrid(self, query, k: int = 10, alpha: float = 0.9
                      ) -> List[Tuple[int, float]]:
        qlam = self.aspace.prepare_query_item(query, self.gl)
        return self.aspace.search_lambda_aware_hybrid(
            ArrowItem(query, qlam), k, alpha)

    def range(self, lo: float, hi: float,
              limit: Optional[int] = None) -> List[Tuple[int, float]]:
        """Two-sided λ-band via the sorted index (O(log N + M))."""
        return self.aspace.range_search_sorted(lo, hi, limit)

    def search_energy(self, queries, k: int = 10, w_lambda: float = 1.0,
                      w_dirichlet: float = 0.5):
        """Batched energy-only ranking (for indices built with
        build_energy): (B, F) -> (scores, ids)."""
        from .energymaps import search_energy_batch
        return search_energy_batch(self.aspace, queries, self.gl, k,
                                   w_lambda, w_dirichlet)

    def make_search_session(self, batch_size: int, k: int = 10,
                            alpha: float = 0.9, depth: int = 2,
                            precision: str = "f32") -> SearchSession:
        """Compiled streaming search for serving: one fused
        prep+score+top-k program per batch, `depth` batches in flight.
        precision="bf16" scores the matmul in bf16 with f32
        accumulation: ≈ f32 at F=128 (BENCH r4: 7.09 vs 7.10 ms at
        B=2048 — the VPU fold, not the MXU, is the clock there; B=256
        measured ~7% faster), ~15% at F=768 where the MXU gain is real;
        top-k overlap 1.000 vs f32 on embedding data."""
        return SearchSession(self, batch_size, k=k, alpha=alpha, depth=depth,
                             precision=precision)

    def make_pruned_session(self, batch_size: int = 16, k: int = 10,
                            alpha: float = 0.9, cap: int = 256,
                            m_cells: Optional[int] = None,
                            margin: float = 1e-3, seed: int = 0,
                            m_vote: int = 8,
                            union_cells: Optional[int] = None,
                            auto_budget: bool = False,
                            engine: str = "host",
                            n_clusters: Optional[int] = None,
                            lloyd_sample: Optional[int] = None):
        """Exact cell-screened search (pruned.py): queries exact-score
        only the cells whose score upper bound can reach their top-k;
        un-certifiable queries transparently re-run through the full
        scan.  The latency counterpart of make_search_session — B ≤ 16
        gathers per query, B in (16, 512] shares one two-level cell
        UNION per batch (m_vote votes/query, union_cells gathered);
        device work ∝ scanned cells instead of N on clustered
        corpora.  auto_budget=True grows the screening budget when the
        observed flag rate exceeds 5% (see PrunedSearchSession).
        engine="device" builds the cell layout fully on device
        (build_cells_device — the multi-GB-corpus path); n_clusters /
        lloyd_sample tune the Lloyd pass at large N (oversample
        n_clusters 2-4x the expected cluster count — see the
        provisioning rule in build_cells's docstring)."""
        from .pruned import PrunedSearchSession
        return PrunedSearchSession(self, batch_size, k=k, alpha=alpha,
                                   cap=cap, m_cells=m_cells,
                                   margin=margin, seed=seed,
                                   m_vote=m_vote, union_cells=union_cells,
                                   auto_budget=auto_budget,
                                   engine=engine, n_clusters=n_clusters,
                                   lloyd_sample=lloyd_sample)

    def make_live_session(self, batch_size: int, k: int = 10,
                          alpha: float = 0.9, depth: int = 2,
                          precision: str = "f32",
                          capacity: Optional[int] = None):
        """Serving session with zero-recompile add/update/delete: the
        corpus lives in a capacity-padded device buffer and the true row
        count rides to the kernels as data (live.LiveSearchSession).
        Results carry stable external ids."""
        from .live import LiveSearchSession
        return LiveSearchSession(self, batch_size, k=k, alpha=alpha,
                                 depth=depth, precision=precision,
                                 capacity=capacity)

    def make_live_energy_session(self, batch_size: int, k: int = 10,
                                 w_lambda: float = 1.0,
                                 w_dirichlet: float = 0.5,
                                 depth: int = 2,
                                 capacity: Optional[int] = None):
        """Energy-index live session: add/update/delete with zero
        recompiles over the capacity-padded z corpus
        (live.LiveEnergySearchSession)."""
        from .live import LiveEnergySearchSession
        return LiveEnergySearchSession(self, batch_size, k=k,
                                       w_lambda=w_lambda,
                                       w_dirichlet=w_dirichlet,
                                       depth=depth, capacity=capacity)

    def make_energy_session(self, batch_size: int, k: int = 10,
                            w_lambda: float = 1.0, w_dirichlet: float = 0.5,
                            depth: int = 2,
                            approx: bool = False) -> EnergySearchSession:
        """Compiled streaming ENERGY search for serving (indices built
        with build_energy): one fused prep+z-project+score+top-k program
        per batch, `depth` batches in flight, deep-collision rows
        repaired exactly.  approx=True serves through the certified
        chord-surrogate kernel (ops/energy_approx) — results stay exact;
        uncertified rows re-run through the exact scorer."""
        return EnergySearchSession(self, batch_size, k=k,
                                   w_lambda=w_lambda,
                                   w_dirichlet=w_dirichlet, depth=depth,
                                   approx=approx)

    def warmup(self, batch_sizes=(1, 16, 256), k: int = 10,
               alpha: float = 0.9) -> None:
        """Pre-compile the search programs for the given batch sizes so
        first-query latency in serving is dispatch-only."""
        rng = np.random.default_rng(0)
        for b in batch_sizes:
            q = rng.uniform(0.1, 1.0, (b, self.aspace.nfeatures))
            self.search(q, k=min(k, self.nitems), alpha=alpha)
        logger.info("warmup complete for batch sizes %s", batch_sizes)

    # ------------------------------------------------------------------
    @property
    def lambdas(self) -> np.ndarray:
        return np.asarray(self.aspace.lambdas)

    @property
    def nitems(self) -> int:
        return self.aspace.nitems

    def stats(self) -> dict:
        lam = self.lambdas
        gstats = self.gl.statistics()
        return {
            "n_items": self.aspace.nitems,
            "n_features": self.aspace.nfeatures,
            "n_clusters": self.aspace.n_clusters,
            "graph_nodes": self.gl.shape()[0],
            "graph_nnz": self.gl.nnz(),
            "graph_sparsity": gstats.sparsity,
            "lambda_min": float(lam.min()),
            "lambda_max": float(lam.max()),
            "lambda_mean": float(lam.mean()),
            "lambda_std": float(lam.std()),
        }
