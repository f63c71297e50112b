"""Distributed λτ build and query over a sharded corpus.

Design (SURVEY.md §2 "TPU mapping"):
- the graph matrix is tiny (F′×F′) and replicated on every device;
- the N-items axis is sharded; the λτ batch is embarrassingly data-parallel
  (each shard runs the same fused matmuls on its rows — no collectives);
- query scoring is data-parallel over item shards; the top-k merge is a
  per-shard ``lax.top_k`` followed by an ``all_gather`` of the k·D
  candidates and a final top-k — a 1:1 mapping of the reference's
  per-thread-heap fold/reduce (core.rs:818-888) onto ICI collectives.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.search import lambda_aware_scores
from ..taumode import (QUERY_PREP_PRECISION, TauMode, select_tau_batch,
                       synthetic_lambda_batch)
from .mesh import ITEMS_AXIS, items_sharding, replicated_sharding
from .multiprocess import ensure_global, is_multiprocess, put_global

__all__ = ["sharded_compute_taumode_lambdas",
           "distributed_lambda_aware_topk", "distributed_pruned_topk",
           "distributed_index_step",
           "sharded_incremental_clustering", "distributed_build_step",
           "DistributedSearchSession"]


def sharded_compute_taumode_lambdas(
    items: jax.Array,          # (N, F) — will be sharded over the mesh
    laplacian: jax.Array,      # (n, n) — replicated
    taumode: TauMode,
    mesh: Mesh,
    use_pallas: bool = False,  # fused τ+λ kernel per shard
) -> jax.Array:
    """λτ batch with the items axis sharded across the mesh.  XLA sees
    replicated small matmul operands and a sharded N axis; no collectives
    are inserted in the forward pass.  With use_pallas each shard runs the
    fully-fused single-pass τ+λ kernel (the production configuration)."""
    items = ensure_global(items, items_sharding(mesh))
    laplacian = put_global(laplacian, replicated_sharding(mesh))

    if use_pallas:
        from ..ops.pallas_taulambda import fused_taulambda_batch
        interpret = jax.default_backend() != "tpu"

        def _shard(x, lap):
            return fused_taulambda_batch(
                x.astype(jnp.float32), lap.astype(jnp.float32),
                kind=taumode.kind,
                pct=taumode.value if taumode.kind == "percentile" else 0.5,
                fixed=taumode.value if taumode.kind == "fixed" else 0.0,
                tile=256 if interpret else 1024,
                interpret=interpret).astype(x.dtype)

        fn = shard_map(_shard, mesh=mesh,
                       in_specs=(P(ITEMS_AXIS, None), P()),
                       out_specs=P(ITEMS_AXIS), check_vma=False)
        return jax.jit(fn)(items, laplacian)

    @functools.partial(jax.jit, static_argnames=("mode",),
                       out_shardings=items_sharding(mesh, ndim=1))
    def _run(x, lap, *, mode):
        taus = select_tau_batch(x, mode)
        return synthetic_lambda_batch(x, lap, taus)

    return _run(items, laplacian, mode=taumode)


def distributed_lambda_aware_topk(
    queries: jax.Array,        # (B, F) — replicated
    query_lambdas: jax.Array,  # (B,)
    items: jax.Array,          # (N, F) — sharded over mesh
    item_lambdas: jax.Array,   # (N,)  — sharded over mesh
    alpha,
    k: int,
    mesh: Mesh,
    use_pallas: bool = False,  # back-compat alias for kernel="merge"
    kernel: str = None,        # "xla" | "merge" | "binned"
    tile: int = 0,             # binned/merge tile override (tests)
):
    """Per-shard top-k + all_gather merge (the heap-merge analogue).

    kernel="merge" runs the streaming merge kernel per shard (scores
    never materialise in HBM); kernel="binned" runs the bin-accumulator
    kernel per shard and ALSO returns an any-shard-reduced flags vector
    (B,) — a flagged query's merged result may be under-filled by a
    deep bin collision on some shard and must be repaired through an
    exact path (the multi-chip analogue of the single-chip flag/repair
    contract).  Returns (scores (B, k), global indices (B, k)) or, for
    "binned", (scores, indices, flags).
    """
    if kernel is None:
        kernel = "merge" if use_pallas else "xla"
    n = items.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, (
        f"N={n} must be padded to a multiple of the mesh size {n_dev}")
    shard_n = n // n_dev
    k_local = min(k, shard_n)

    queries = put_global(queries, replicated_sharding(mesh))
    query_lambdas = put_global(query_lambdas, replicated_sharding(mesh))
    items = ensure_global(items, items_sharding(mesh))
    item_lambdas = ensure_global(item_lambdas,
                                 items_sharding(mesh, ndim=1))
    alpha = put_global(np.asarray(alpha, dtype=np.dtype(items.dtype)),
                       replicated_sharding(mesh))

    def _shard_fn(q, qlam, x, xlam, a):
        interpret = jax.default_backend() != "tpu"
        fl = None
        if kernel == "binned":
            from ..ops.pallas_bintopk import binned_lambda_topk
            local_scores, local_idx, fl = binned_lambda_topk(
                q, qlam, x, xlam, a, k=k_local, tile=tile,
                interpret=interpret)
            local_scores = local_scores.astype(x.dtype)
            # a collision on ANY shard taints the merged row
            fl = jax.lax.pmax(fl, ITEMS_AXIS)
        elif kernel == "merge":
            from ..ops.pallas_topk import fused_lambda_topk
            local_scores, local_idx = fused_lambda_topk(
                q, qlam, x, xlam, a, k=k_local, tile=tile,
                interpret=interpret)
            local_scores = local_scores.astype(x.dtype)
        else:
            # local scores for this shard's rows: (B, shard_n) — sort
            # the SHIFTED plane (exactly what the kernels' flush and
            # batched_lambda_aware_topk sort) and restore +c1 after, so
            # the LOCAL selection's tie order matches every other r4
            # scoring program; the cross-shard merge below still ranks
            # restored values (the kernels only expose those), which
            # can collapse a ~2^-25 cross-shard near-tie — documented,
            # not observable in any pinned test
            from ..ops.search import _shifted_lambda_plane
            shifted, c1 = _shifted_lambda_plane(q, qlam, x, xlam, a)
            local_scores, local_idx = jax.lax.top_k(shifted, k_local)
            local_scores = local_scores + c1
        # globalise indices by shard offset
        shard_id = jax.lax.axis_index(ITEMS_AXIS)
        global_idx = local_idx + shard_id * shard_n
        # gather all shards' candidates: (B, n_dev * k_local)
        all_scores = jax.lax.all_gather(local_scores, ITEMS_AXIS,
                                        axis=1, tiled=True)
        all_idx = jax.lax.all_gather(global_idx, ITEMS_AXIS,
                                     axis=1, tiled=True)
        top_scores, pos = jax.lax.top_k(all_scores, min(k, n))
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        if fl is not None:
            return top_scores, top_idx, fl
        return top_scores, top_idx

    n_out = 3 if kernel == "binned" else 2
    fn = shard_map(
        _shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(ITEMS_AXIS, None), P(ITEMS_AXIS), P()),
        out_specs=tuple([P()] * n_out),
        check_vma=False,
    )
    return jax.jit(fn)(queries, query_lambdas, items, item_lambdas, alpha)


def distributed_lambda_aware_topk_2d(
    queries: jax.Array,
    query_lambdas: jax.Array,
    items: jax.Array,          # (N, F) — sharded over BOTH mesh axes
    item_lambdas: jax.Array,
    alpha,
    k: int,
    mesh: Mesh,
) -> Tuple[jax.Array, jax.Array]:
    """Hierarchical top-k merge over a (dcn, ici) mesh.

    Stage 1: per-device top-k (local lax.top_k).
    Stage 2: all_gather + re-top-k WITHIN each ICI group (fast interconnect).
    Stage 3: all_gather the per-group winners ACROSS the DCN axis — only
             k candidates per ICI group cross the data-centre network —
             and take the final top-k.
    """
    n = items.shape[0]
    n_dcn, n_ici = mesh.devices.shape
    n_dev = n_dcn * n_ici
    assert n % n_dev == 0, (
        f"N={n} must be padded to a multiple of the mesh size {n_dev}")
    shard_n = n // n_dev
    k_local = min(k, shard_n)

    spec_items = P(("dcn", "ici"), None)
    spec_lam = P(("dcn", "ici"))
    queries = put_global(queries, NamedSharding(mesh, P()))
    query_lambdas = put_global(query_lambdas, NamedSharding(mesh, P()))
    items = ensure_global(items, NamedSharding(mesh, spec_items))
    item_lambdas = ensure_global(item_lambdas,
                                 NamedSharding(mesh, spec_lam))
    alpha = put_global(np.asarray(alpha, dtype=np.dtype(items.dtype)),
                       NamedSharding(mesh, P()))

    def _shard_fn(q, qlam, x, xlam, a):
        # shifted-plane local sort, restored after (see the 1-D merge)
        from ..ops.search import _shifted_lambda_plane
        shifted, c1 = _shifted_lambda_plane(q, qlam, x, xlam, a)
        local_scores, local_idx = jax.lax.top_k(shifted, k_local)
        local_scores = local_scores + c1
        dcn_id = jax.lax.axis_index("dcn")
        ici_id = jax.lax.axis_index("ici")
        shard_id = dcn_id * n_ici + ici_id
        gidx = local_idx + shard_id * shard_n

        # ICI-group merge (rides the fast interconnect)
        s_ici = jax.lax.all_gather(local_scores, "ici", axis=1, tiled=True)
        i_ici = jax.lax.all_gather(gidx, "ici", axis=1, tiled=True)
        k_grp = min(k, s_ici.shape[1])
        s_grp, pos = jax.lax.top_k(s_ici, k_grp)
        i_grp = jnp.take_along_axis(i_ici, pos, axis=1)

        # DCN merge: only k_grp candidates per group cross the DCN
        s_all = jax.lax.all_gather(s_grp, "dcn", axis=1, tiled=True)
        i_all = jax.lax.all_gather(i_grp, "dcn", axis=1, tiled=True)
        top_scores, pos = jax.lax.top_k(s_all, min(k, n))
        top_idx = jnp.take_along_axis(i_all, pos, axis=1)
        return top_scores, top_idx

    fn = shard_map(
        _shard_fn, mesh=mesh,
        in_specs=(P(), P(), spec_items, spec_lam, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(queries, query_lambdas, items, item_lambdas, alpha)


def distributed_pruned_topk(
    queries: jax.Array,        # (B, F) — replicated
    query_lambdas: jax.Array,  # (B,)
    cells,                     # PrunedCells — unit axis sharded
    alpha,
    k: int,
    mesh: Mesh,
    m_cells: int = 8,
    margin: float = 1e-3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cell-screened exact top-k over the mesh: each shard screens its
    own slice of the cell layout (pruned.pruned_topk on the local
    units) and the per-shard winners merge with a two-key (score,
    global-id) sort, so cross-shard exact ties still resolve to the
    lowest GLOBAL id like the single-chip kernel.

    Soundness of per-shard certification: the merged global k-th score
    dominates every shard-local k-th (the k largest of a union are
    element-wise ≥ the k largest of any subset), so a shard's
    certificate — "no unscanned LOCAL cell's bound reaches my local
    k-th" — implies no unscanned cell anywhere reaches the global
    k-th.  Flags reduce by any-shard OR; a flagged query re-runs
    through the distributed full scan, exactly the single-chip
    flag/fallback contract.  Per-shard m_cells means the mesh scans
    n_dev·m_cells cells total — strictly MORE coverage than the
    single-chip screen at equal per-chip latency.

    This is the 100M-config serving shape (SURVEY §2 long-axis row):
    per chip the gather stays ∝ m_cells·cap while a streamed scan
    pays the full per-shard HBM corpus read (measured 10M single-chip:
    stream 10.0 ms vs screen 6.7 ms, benchmarks/pruned_scale10m.py).

    Returns (scores (B, k), global ids (B, k), flags (B,)).
    Reference anchor: core.rs:802-928 (hybrid's per-thread heaps +
    merge, made exact and cell-screened)."""
    from ..pruned import pruned_topk

    u_pad = cells.cent.shape[0]
    n_dev = mesh.devices.size
    assert u_pad % n_dev == 0, (
        f"unit axis {u_pad} must be a multiple of the mesh size "
        f"{n_dev} (pruned._unit_pad pads to pow2/1024-multiples, both "
        f"divisible by typical mesh sizes)")
    cap = cells.cap
    dt = cells.x.dtype

    rep = replicated_sharding(mesh)
    rows_spec = NamedSharding(mesh, P(ITEMS_AXIS, None))
    vec_spec = NamedSharding(mesh, P(ITEMS_AXIS))
    queries = put_global(queries.astype(dt), rep)
    query_lambdas = put_global(query_lambdas.astype(dt), rep)
    alpha_g = put_global(np.asarray(alpha, dtype=np.dtype(dt)), rep)
    cx = ensure_global(cells.x, rows_spec)
    clam = ensure_global(cells.lam, vec_spec)
    cids = ensure_global(cells.ids, vec_spec)
    cent = ensure_global(cells.cent, rows_spec)
    radius = ensure_global(cells.radius, vec_spec)
    cosr = ensure_global(cells.cosr, vec_spec)
    sinr = ensure_global(cells.sinr, vec_spec)
    lam_lo = ensure_global(cells.lam_lo, vec_spec)
    lam_hi = ensure_global(cells.lam_hi, vec_spec)

    def _shard_fn(q, qlam, x, lam, ids, ce, ra, co, si, lo, hi, a):
        # per-shard screen, exporting the best-unscanned-cell bound:
        # certification MUST ride the merged GLOBAL k-th — a
        # shard-local k-th is too weak on shards that don't hold the
        # query's hot region (their local candidates score low, so
        # every unscanned local bound reaches the local k-th and the
        # whole batch would flag; measured exactly so on the first cut)
        s, i, nb = pruned_topk(
            q, qlam, x, lam, ids, ce, ra, co, si, lo, hi, a, k=k,
            m_cells=m_cells, cap=cap, margin=margin,
            return_next_bound=True)
        # ids are GLOBAL row ids stored in the layout — no shard offset
        nb_max = jax.lax.pmax(nb, ITEMS_AXIS)           # (B,) shifted
        all_s = jax.lax.all_gather(s, ITEMS_AXIS, axis=1, tiled=True)
        all_i = jax.lax.all_gather(i, ITEMS_AXIS, axis=1, tiled=True)
        # lowest-global-id tie order across shards: -inf pads from
        # underfilled shards sort last either way
        s_sorted, i_sorted = jax.lax.sort((-all_s, all_i), num_keys=2)
        top_s, top_i = -s_sorted[:, :k], i_sorted[:, :k]
        c1 = 1.0 - a.astype(top_s.dtype)
        kth_shifted = top_s[:, k - 1] - c1              # back to plane
        fl = (nb_max + jnp.asarray(margin, top_s.dtype) >= kth_shifted) \
            | ~jnp.isfinite(kth_shifted)
        return top_s, top_i, fl

    fn = shard_map(
        _shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(ITEMS_AXIS, None), P(ITEMS_AXIS),
                  P(ITEMS_AXIS), P(ITEMS_AXIS, None), P(ITEMS_AXIS),
                  P(ITEMS_AXIS), P(ITEMS_AXIS), P(ITEMS_AXIS),
                  P(ITEMS_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(queries, query_lambdas, cx, clam, cids, cent,
                       radius, cosr, sinr, lam_lo, lam_hi, alpha_g)


def sharded_incremental_clustering(
    items_sharded: jax.Array,   # (N, F) sharded over the mesh items axis
    builder,
    max_clusters: int,
    radius: float,
    sampler,
    mesh: Mesh,
    rounds_chunk: int = 65536,  # rows per device per round
):
    """Sharded unseeded incremental clustering: the build-stage scan over
    a mesh-sharded corpus (SURVEY §2 TPU-mapping, "sharding the N-items
    axis ... for build").

    Each round, EVERY device computes nearest-centroid distances for its
    next `rounds_chunk` rows against the round-start snapshot — one
    shard_map with no collectives — and the host applies the per-row
    create/assign/soft-outlier rules chunk by chunk in device order.
    This is the same snapshot relaxation as the single-chip chunked mode
    (clustering.py), with a race window of n_devices chunks per round —
    still a valid serialisation of the reference's racy rayon semantics
    (clustering.rs:570-660).

    The corpus stays device-resident throughout: the host fetches one
    chunk's rows at a time for the create/assign bookkeeping (peak host
    memory O(chunk x F), total transfer one pass of the data), so the
    100M x 768 sharded config never materialises ~600 GB on the host.

    Returns (centroids (X, F) host f64, assignments list, sizes list).
    """
    import numpy as np

    from ..clustering import _bucket_centroid_cap

    n, f = items_sharded.shape
    n_dev = mesh.devices.size
    assert n % n_dev == 0, (
        f"N={n} must be padded to a multiple of the mesh size {n_dev}")
    shard_n = n // n_dev
    chunk = min(rounds_chunk, shard_n)
    dt = items_sharded.dtype
    np_dt = np.dtype(dt)
    mc_pad = _bucket_centroid_cap(max_clusters)
    # Under multi-process the host bookkeeping below consumes these
    # results on EVERY process, but a host can only fetch addressable
    # shards — so the per-chunk vectors (n_dev·chunk ints/floats, tiny
    # next to the corpus) are all_gathered to replicated outputs.
    mp = is_multiprocess()

    def _dist_shard(x_shard, start, cent_pad, n_c):
        rows_c = jax.lax.dynamic_slice(
            x_shard, (start[0], jnp.zeros((), start.dtype)), (chunk, f))
        d2 = (jnp.sum(rows_c * rows_c, axis=1)[:, None]
              - 2.0 * jnp.dot(rows_c, cent_pad.T,
                              preferred_element_type=dt)
              + jnp.sum(cent_pad * cent_pad, axis=1)[None, :])
        d2 = jnp.maximum(d2, 0.0)
        valid = jnp.arange(cent_pad.shape[0]) < n_c[0]
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        best = jnp.argmin(d2, axis=1).astype(jnp.int32)
        bd = jnp.take_along_axis(d2, best[:, None].astype(jnp.int32),
                                 axis=1)[:, 0]
        if mp:
            best = jax.lax.all_gather(best, ITEMS_AXIS, axis=0,
                                      tiled=True)
            bd = jax.lax.all_gather(bd, ITEMS_AXIS, axis=0, tiled=True)
        return best, bd

    dist_fn = jax.jit(shard_map(
        _dist_shard, mesh=mesh,
        in_specs=(P(ITEMS_AXIS, None), P(), P(), P()),
        out_specs=(P(), P()) if mp else (P(ITEMS_AXIS), P(ITEMS_AXIS)),
        check_vma=False,
    ))

    # Host bookkeeping state (identical rules to clustering.py's chunked
    # mode, reused via its helpers).  The corpus is NEVER materialised on
    # host in full — at the 100M x 768 target that would be ~600 GB.
    # Host row traffic is limited to (a) the bootstrap block scan and
    # (b) the few CREATOR rows per chunk (lazy fetch_at): the
    # running-mean reduction and the fresh-centroid refresh run as
    # SHARD-LOCAL SPMD programs (each shard slices its OWN window; the
    # segsum merges via a tiny (cap, F) psum) — a jit(dynamic_slice)
    # over the mesh-sharded corpus would make SPMD insert conservative
    # cross-shard gathers per call, i.e. corpus allgathers in the build
    # hot loop.
    from ..clustering import _apply_chunk_decisions

    # One compiled fetch program per window LENGTH (runtime offset via
    # dynamic_slice): python slicing would bake each distinct offset into
    # its own program — 8-16 fresh compiles per build through the tunnel.
    fetch_cache = {}
    rep_out = replicated_sharding(mesh) if mp else None

    def fetch_rows(lo: int, hi: int) -> np.ndarray:
        m = hi - lo
        if m not in fetch_cache:
            fetch_cache[m] = jax.jit(
                lambda arr, start, _m=m: jax.lax.dynamic_slice(
                    arr, (start, jnp.zeros((), start.dtype)), (_m, f)),
                out_shardings=rep_out)
        out = fetch_cache[m](items_sharded, np.int32(min(lo, n - m)))
        return np.asarray(out, dtype=np.float64)

    # Creator-row gather, bucketed by candidate count so one compiled
    # program serves a range of creator counts (indices padded by
    # repetition; the padded tail is sliced off host-side).
    gather_cache = {}

    def fetch_rows_at(global_idx: np.ndarray) -> np.ndarray:
        cnt = int(global_idx.shape[0])
        bucket = 8
        while bucket < cnt:
            bucket *= 2
        if bucket not in gather_cache:
            gather_cache[bucket] = jax.jit(
                lambda arr, idx: jnp.take(arr, idx, axis=0),
                out_shardings=rep_out)
        idx_pad = np.full(bucket, int(global_idx[0]), dtype=np.int32)
        idx_pad[:cnt] = global_idx
        out = gather_cache[bucket](items_sharded, idx_pad)
        return np.asarray(out, dtype=np.float64)[:cnt]

    # Shard-local grouped sums: every shard reduces ITS window's rows
    # keyed by the (replicated) targets, masked to the active device;
    # the psum of the small (cap, F) partials leaves exactly the active
    # shard's contribution.  One program serves the whole build.
    def _seg_shard(x_shard, start, tgt_pad, d_active):
        rows_c = jax.lax.dynamic_slice(
            x_shard, (start[0], jnp.zeros((), start[0].dtype)), (chunk, f))
        active = jax.lax.axis_index(ITEMS_AXIS) == d_active[0]
        t = jnp.where(active, tgt_pad, -1)
        valid = t >= 0
        tt = jnp.where(valid, t, mc_pad)
        sums = jnp.zeros((mc_pad + 1, f), dtype=dt).at[tt].add(
            jnp.where(valid[:, None], rows_c, 0.0))
        cnts = jnp.zeros((mc_pad + 1,), dtype=jnp.int32).at[tt].add(
            valid.astype(jnp.int32))
        return (jax.lax.psum(sums[:mc_pad], ITEMS_AXIS),
                jax.lax.psum(cnts[:mc_pad], ITEMS_AXIS))

    seg_fn = jax.jit(shard_map(
        _seg_shard, mesh=mesh,
        in_specs=(P(ITEMS_AXIS, None), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False))

    cent = np.zeros((max_clusters, f), dtype=np.float64)
    counts = np.zeros(max_clusters, dtype=np.int64)
    assign = np.full(n, -1, dtype=np.int64)
    state = {"n_c": 0}

    # bootstrap centroid 0 from the first kept row (host scan over small
    # fetched blocks; with any realistic keep-rate this is one block)
    sampling_enabled = builder.sampling is not None
    boot = 0
    for b0 in range(0, n, 1024):
        block = fetch_rows(b0, min(b0 + 1024, n))
        for j in range(block.shape[0]):
            kept = (not sampling_enabled) or sampler.should_keep(
                block[j], float("inf"), 0, max_clusters)
            boot = b0 + j + 1
            if kept:
                cent[0] = block[j]
                counts[0] = 1
                assign[b0 + j] = 0
                state["n_c"] = 1
                break
        if state["n_c"]:
            break
    if state["n_c"] == 0:
        raise RuntimeError("No clusters created from data (all rows "
                           "rejected by sampling)")

    for start in range(0, shard_n, chunk):
        # m < chunk on a partial final round: dynamic_slice clamps the
        # device window to [shard_n - chunk, shard_n), so the wanted rows
        # [start, shard_n) are the LAST m entries of each shard's result.
        m = min(chunk, shard_n - start)
        cent_host = np.zeros((mc_pad, f))
        cent_host[:max_clusters] = cent
        # small operands upload as HOST numpy values: identical on every
        # process, so they are valid replicated inputs under
        # multi-process (a committed single-device jnp array is not)
        cent_pad = np.asarray(cent_host, dtype=np_dt)
        round_start_nc = state["n_c"]
        best_all, bd_all = dist_fn(
            items_sharded,
            np.asarray([start], dtype=np.int32),
            cent_pad, np.asarray([state["n_c"]], dtype=np.int32))
        best_all, bd_all = jax.device_get((best_all, bd_all))
        best_all = best_all.astype(np.int64)
        bd_all = np.asarray(bd_all, dtype=np.float64)
        # device-order serialisation: apply each shard's chunk in turn
        for d in range(n_dev):
            offset = d * shard_n + start
            lo, hi = d * chunk + (chunk - m), (d + 1) * chunk
            sl = slice(0, m)
            if offset + m > boot > offset:
                # rows consumed by the bootstrap scan are already decided
                sl = slice(boot - offset, m)
            elif offset + m <= boot:
                continue
            best_c = best_all[lo:hi][sl].copy()
            bd_c = bd_all[lo:hi][sl].copy()
            offs = offset + sl.start
            m_eff = m - sl.start
            # rows [offs, offs+m_eff) sit at positions
            # [(chunk-m)+sl.start, chunk) of shard d's clamped window —
            # the same tail convention as the round's dist_fn results
            p0 = (chunk - m) + sl.start
            # Refresh against centroids created by EARLIER chunks of
            # this round (the device distances only saw the round-start
            # snapshot) — reuses the round's SPMD distance program with
            # the fresh centroids in the bucketed buffer (every shard
            # computes its own window; the host reads shard d's
            # segment).  Keeps the cross-device race window from
            # duplicating clusters round-wide without fetching rows.
            if state["n_c"] > round_start_nc and bd_c.size:
                n_fresh = state["n_c"] - round_start_nc
                fresh_pad = np.zeros((mc_pad, f))
                fresh_pad[:n_fresh] = cent[round_start_nc:state["n_c"]]
                fb, fd = dist_fn(
                    items_sharded, np.asarray([start], dtype=np.int32),
                    np.asarray(fresh_pad, dtype=np_dt),
                    np.asarray([n_fresh], dtype=np.int32))
                seg = slice(d * chunk + p0, d * chunk + p0 + m_eff)
                fbest, fbd = jax.device_get((fb[seg], fd[seg]))
                fbest = fbest.astype(np.int64)
                fbd = np.asarray(fbd, dtype=np.float64)
                closer = fbd < bd_c
                best_c = np.where(closer, fbest + round_start_nc, best_c)
                bd_c = np.where(closer, fbd, bd_c)

            def segsum(tgt_local, _p0=p0, _d=d, _start=start, _m=m_eff):
                tgt_pad = np.full(chunk, -1, dtype=np.int32)
                tgt_pad[_p0:_p0 + _m] = tgt_local
                sums, cnts = seg_fn(
                    items_sharded, np.asarray([_start], dtype=np.int32),
                    tgt_pad, np.asarray([_d], np.int32))
                sums, cnts = jax.device_get((sums, cnts))
                return (np.asarray(sums, dtype=np.float64),
                        np.asarray(cnts, dtype=np.int64))

            _apply_chunk_decisions(
                None, best_c, bd_c, offs, builder, sampler, radius,
                max_clusters, cent, counts, assign, state,
                segsum=segsum,
                fetch_at=lambda li, _offs=offs: fetch_rows_at(
                    np.asarray(li, dtype=np.int64) + _offs),
                nfeatures=f)

    if state["n_c"] == 0:
        raise RuntimeError("No clusters created from data")
    n_c = state["n_c"]
    from ..clustering import Assignments
    return cent[:n_c].copy(), Assignments(assign), counts[:n_c].tolist()


def distributed_build_step(
    items: jax.Array,       # (N, F) — will be sharded
    builder,
    queries: jax.Array,
    taumode: TauMode,
    graph_params,
    k: int,
    mesh: Mesh,
    max_clusters: int,
    radius: float,
):
    """Full sharded build -> query: sharded clustering (device distance
    tiles, host rules), replicated graph build from the centroids, sharded
    λτ batch, distributed top-k.  This is the end-to-end multi-chip path
    the dry run exercises."""
    items = ensure_global(items, items_sharding(mesh))
    if (is_multiprocess() and builder.sampling is not None
            and builder.clustering_seed is None):
        # every process replays the same host create/assign rules; an
        # unseeded sampler draws per-process OS entropy and the
        # processes would silently diverge (deterministic contract of
        # clustering.rs:842-846, lifted to the process level)
        raise ValueError(
            "multi-process builds require a seeded builder "
            "(with_seed) when inline sampling is enabled — unseeded "
            "samplers draw per-process entropy and host decisions "
            "would diverge across processes")
    sampler = (builder.sampling.make(seed=builder.clustering_seed)
               if builder.sampling is not None else None)
    if sampler is None:
        from ..sampling import SamplerType
        sampler = SamplerType.simple(1.0).make(seed=1)
        builder.sampling = None
    cent, assignments, sizes = sharded_incremental_clustering(
        items, builder, max_clusters, radius, sampler, mesh)
    centroids = jnp.asarray(cent, dtype=items.dtype)
    lambdas, scores, idx = distributed_index_step(
        items, centroids, queries, taumode, graph_params, k, mesh)
    return centroids, lambdas, scores, idx


class DistributedSearchSession:
    """Pipelined streaming search over a device mesh — the multi-chip
    counterpart of index.SearchSession.

    ONE jitted program per batch fuses query-λ preparation (τ selection +
    synthetic λ against the replicated graph) with per-shard scoring,
    per-shard ``lax.top_k`` and the ``all_gather`` candidate merge (the
    reference's per-thread-heap fold/reduce, core.rs:818-888, as ICI
    collectives).  The stream driver keeps ``depth`` batches in flight so
    result readback overlaps the next batch's compute on every chip.
    """

    def __init__(self, items, item_lambdas, laplacian, mesh: Mesh,
                 batch_size: int, k: int = 10, alpha: float = 0.9,
                 taumode: TauMode = None, depth: int = 2,
                 projection=None, pad_tall: bool = False,
                 kernel: str = None, prepare_corpus: bool = True):
        from ..index import session_kernel_kind
        self.batch_size = int(batch_size)
        self.depth = max(1, int(depth))
        self.mesh = mesh
        n = items.shape[0]
        n_dev = mesh.devices.size
        assert n % n_dev == 0, (
            f"N={n} must be padded to a multiple of the mesh size {n_dev}")
        k_eff = min(int(k), n)
        self.k = k_eff
        k_local = min(k_eff, n // n_dev)
        taumode = taumode if taumode is not None else TauMode.median()
        dt = items.dtype
        self._dt = dt
        self._dim = items.shape[1]
        # per-shard kernel dispatch, same gates as the single-chip
        # session (shard size, k, F); overridable for tests
        knl = kernel or session_kernel_kind(n // n_dev, k_local,
                                            items.shape[1])

        mp = is_multiprocess()
        self._mp = mp
        items = ensure_global(items, items_sharding(mesh))
        item_lambdas = ensure_global(item_lambdas,
                                     items_sharding(mesh, ndim=1))
        laplacian = put_global(np.asarray(laplacian, dtype=np.dtype(dt)),
                               replicated_sharding(mesh))
        has_proj = projection is not None
        if has_proj:
            proj = put_global(np.asarray(projection, dtype=np.dtype(dt)),
                              replicated_sharding(mesh))
        else:
            proj = put_global(np.zeros((1, 1), dtype=np.dtype(dt)),
                              replicated_sharding(mesh))
        if (not has_proj and not pad_tall
                and laplacian.shape[0] != items.shape[1]):
            raise ValueError(
                f"graph has {laplacian.shape[0]} nodes but items have "
                f"{items.shape[1]} coordinates — a dims-reduced index "
                f"needs the projection matrix (projection=...), a tall "
                f"energy graph needs pad_tall=True")
        shard_n = n // n_dev

        # One-time per-shard corpus preparation for the binned kernel
        # (see index.SearchSession / ops.pallas_bintopk.prepare_binned_
        # corpus): the normalise+bucket-pad producer is a full shard
        # read+write per dispatch on EVERY chip otherwise.  The raw
        # sharded arrays stay for the repair path; the prepared copy
        # costs ~+shard bytes per chip (prepare_corpus=False opts out).
        prepped = knl == "binned" and prepare_corpus
        step_items, step_xlam = items, item_lambdas
        if prepped:
            from ..ops.pallas_bintopk import (_unit_padded, binned_layout)
            n_pad_l = binned_layout(self.batch_size, shard_n,
                                    items.shape[1], k_local)[4]
            pad_l = n_pad_l - shard_n
            prep = shard_map(
                lambda x, xl: (
                    _unit_padded(x, pad_l, jnp.float32),
                    jnp.pad(xl.astype(jnp.float32), (0, pad_l))),
                mesh=mesh,
                in_specs=(P(ITEMS_AXIS, None), P(ITEMS_AXIS)),
                out_specs=(P(ITEMS_AXIS, None), P(ITEMS_AXIS)),
                check_vma=False)
            step_items, step_xlam = jax.jit(prep)(items, item_lambdas)

        def _shard_fn(q, x, xlam, lap, pr):
            # dims-reduced index: the projected query prepares λ, the RAW
            # query scores against the raw items (ArrowIndex.search
            # semantics; core.rs:509-549)
            q_prep = q if not has_proj else jnp.dot(
                q, pr, preferred_element_type=dt)
            taus = select_tau_batch(q_prep, taumode)
            qlam = synthetic_lambda_batch(
                q_prep, lap, taus, pad_items=pad_tall,
                precision=QUERY_PREP_PRECISION)
            a = jnp.asarray(alpha, dtype=dt)
            det = None
            if knl == "binned":
                from ..ops.pallas_bintopk import binned_lambda_topk
                ls, li, fl, det_l = binned_lambda_topk(
                    q, qlam, x, xlam, a, k=k_local,
                    interpret=jax.default_backend() != "tpu",
                    prepared=prepped,
                    n_items=shard_n if prepped else 0, return_det=True)
                ls = ls.astype(dt)
                fl = jax.lax.pmax(fl, ITEMS_AXIS)
                # per-shard det planes gathered along the column axis:
                # column s*bins + b is shard s's local bin b — the
                # strided repair decodes it back (bin_repair, shard_n>0)
                det = jax.lax.all_gather(det_l, ITEMS_AXIS, axis=1,
                                         tiled=True)
            elif knl == "merge":
                from ..ops.pallas_topk import fused_lambda_topk
                ls, li = fused_lambda_topk(
                    q, qlam, x, xlam, a, k=k_local,
                    interpret=jax.default_backend() != "tpu")
                ls = ls.astype(dt)
                fl = jnp.zeros((q.shape[0],), dtype=jnp.int32)
            else:
                # shifted-plane local sort, restored after (see the
                # 1-D merge's note on cross-shard restored ranking)
                from ..ops.search import _shifted_lambda_plane
                shifted, c1 = _shifted_lambda_plane(q, qlam, x, xlam, a)
                ls, li = jax.lax.top_k(shifted, k_local)
                ls = ls + c1
                fl = jnp.zeros((q.shape[0],), dtype=jnp.int32)
            shard_id = jax.lax.axis_index(ITEMS_AXIS)
            gidx = li + shard_id * shard_n
            all_scores = jax.lax.all_gather(ls, ITEMS_AXIS,
                                            axis=1, tiled=True)
            all_idx = jax.lax.all_gather(gidx, ITEMS_AXIS,
                                         axis=1, tiled=True)
            top_scores, pos = jax.lax.top_k(all_scores, k_eff)
            top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
            # single-chip session step contract: (scores, ids+flags,
            # qlam[, det]) — det rides along for the strided repair
            ids_fl = jnp.concatenate([top_idx, fl[:, None]], axis=1)
            if det is not None:
                return top_scores, ids_fl, qlam, det
            return top_scores, ids_fl, qlam

        n_out = 4 if knl == "binned" else 3
        fn = shard_map(_shard_fn, mesh=mesh,
                       in_specs=(P(), P(ITEMS_AXIS, None), P(ITEMS_AXIS),
                                 P(), P()),
                       out_specs=tuple([P()] * n_out), check_vma=False)
        jitted = jax.jit(fn)
        if mp:
            # the stream driver hands a process-local committed query
            # array; re-place it as a global replicated operand (every
            # process streams identical batches — the one-driver-per-
            # host contract)
            rep = replicated_sharding(mesh)
            self._step = lambda q: jitted(
                put_global(np.asarray(q), rep), step_items, step_xlam,
                laplacian, proj)
        else:
            self._step = lambda q: jitted(q, step_items, step_xlam,
                                          laplacian, proj)

        def repair(q_block, qlam_np, rows, scores=None, ids=None,
                   det_rows=None):
            # Multi-chip deep-collision repair.  With the gathered det
            # plane the strided repair rescores only the fired
            # (shard, bin) slices + the current merged top-k against
            # the sharded raw corpus (XLA gathers the few candidate
            # rows across the mesh); rows whose fired count overflows —
            # and legacy callers — re-run the exact per-shard merge
            # pass (padded to a fixed 128 so one compiled repair
            # program serves any flagged count).
            def full_exact(rel_rows):
                rr = rows[rel_rows]
                m = len(rr)
                pad = (-m) % 128
                qs = np.pad(np.asarray(q_block)[rr].astype(np.float64),
                            ((0, pad), (0, 0)), constant_values=1.0)
                qls = np.pad(np.asarray(qlam_np)[rr], (0, pad))
                knl_exact = "merge" if jax.default_backend() == "tpu" \
                    else "xla"
                rs, ri = distributed_lambda_aware_topk(
                    jnp.asarray(qs, dtype=dt), jnp.asarray(qls, dtype=dt),
                    items, item_lambdas, alpha, k_eff, mesh,
                    kernel=knl_exact)
                return np.asarray(rs)[:m], np.asarray(ri)[:m]

            if det_rows is None or mp:
                # multi-process: the strided-repair chunk programs have
                # no replicated-output contract yet, so flagged rows
                # take the exact distributed pass (replicated outputs,
                # still exact — just a full per-shard scan for the rare
                # flagged batch)
                return full_exact(np.arange(len(rows)))
            from ..ops.bin_repair import strided_lambda_repair
            return strided_lambda_repair(
                np.asarray(q_block)[rows].astype(dt), qlam_np[rows],
                det_rows, scores[rows, k_eff - 1], ids[rows],
                items, item_lambdas, float(alpha), k=k_eff, n=n,
                prepared=False, use_bf16=False, shard_n=shard_n,
                fallback=full_exact, cur_scores=scores[rows])

        self._repair = repair if knl == "binned" else None

    @classmethod
    def from_index(cls, index, mesh: Mesh, batch_size: int, k: int = 10,
                   alpha: float = 0.9,
                   depth: int = 2) -> "DistributedSearchSession":
        """Open a mesh session over a built/loaded ArrowIndex (the corpus
        and λ re-shard over the mesh; the graph and any JL projection
        replicate)."""
        aspace, gl = index.aspace, index.gl
        dt = aspace.data.dtype
        proj = None
        if aspace.projection_matrix is not None:
            proj = aspace.projection_matrix.matrix(dtype=dt)
        return cls(aspace.data, aspace.lambdas,
                   jnp.asarray(gl.matrix, dtype=dt), mesh, batch_size,
                   k=k, alpha=alpha, taumode=aspace.taumode, depth=depth,
                   projection=proj, pad_tall=aspace.pad_tall_graphs)

    def warmup(self) -> None:
        """Compile the fused multi-chip step (and the strided-repair
        chunk for flagged rows) so serving is dispatch-only."""
        from ..index import warm_step
        warm_step(self._step, self.batch_size, self._dim, self._dt,
                  repair=self._repair, k=self.k)

    def search_stream(self, batches):
        """Yield (scores, ids) per input batch with ``depth`` batches in
        flight across the mesh (shared driver: index.stream_search)."""
        from ..index import stream_search
        return stream_search(self._step, batches, self.batch_size,
                             self.depth, self._dt, dim=self._dim,
                             repair=self._repair)


class DistributedEnergySearchSession:
    """Multi-chip ENERGY serving session — the energy-index counterpart
    of DistributedSearchSession (search_energy semantics,
    energymaps.rs:368-407), sharing its design: one jitted program per
    batch fuses query-λ preparation + the z-space projection with
    per-shard scoring and the all_gather candidate merge; per-shard
    prepared z corpus (pad + norms hoisted to construction); flagged
    rows repair through the strided mesh repair (gathered det plane)
    with the exact distributed chunked pass as overflow fallback.

    The z-plane is computed PER SHARD at construction (one shard_map:
    z = x_proj Sᵀ on each shard's rows against the replicated signals)
    — at the 100M×768 target the (N, G) z corpus never exists on one
    device or host.
    """

    def __init__(self, items, item_lambdas, laplacian, mesh: Mesh,
                 batch_size: int, k: int = 10, w_lambda: float = 1.0,
                 w_dirichlet: float = 0.5, taumode: TauMode = None,
                 depth: int = 2, projection=None, signals=None,
                 pad_tall: bool = False, kernel: str = None,
                 prepare_corpus: bool = True):
        from ..energymaps import (ENERGY_CHUNK, _energy_score_topk_chunked,
                                  _use_binned_energy)
        self.batch_size = int(batch_size)
        self.depth = max(1, int(depth))
        self.mesh = mesh
        n = items.shape[0]
        n_dev = mesh.devices.size
        assert n % n_dev == 0, (
            f"N={n} must be padded to a multiple of the mesh size {n_dev}")
        k_eff = min(int(k), n)
        self.k = k_eff
        shard_n = n // n_dev
        k_local = min(k_eff, shard_n)
        taumode = taumode if taumode is not None else TauMode.median()
        dt = items.dtype
        self._dt = dt
        self._dim = items.shape[1]
        mp = is_multiprocess()
        self._mp = mp

        items = ensure_global(items, items_sharding(mesh))
        item_lambdas = ensure_global(item_lambdas,
                                     items_sharding(mesh, ndim=1))
        laplacian = put_global(np.asarray(laplacian, dtype=np.dtype(dt)),
                               replicated_sharding(mesh))
        has_proj = projection is not None
        proj = put_global(
            np.asarray(projection, dtype=np.dtype(dt)) if has_proj
            else np.zeros((1, 1), dtype=np.dtype(dt)),
            replicated_sharding(mesh))
        has_signals = (signals is not None
                       and np.shape(signals)[0] > 0)
        sig = put_global(
            np.asarray(signals, dtype=np.dtype(dt)) if has_signals
            else np.zeros((1, 1), dtype=np.dtype(dt)),
            replicated_sharding(mesh))
        if (not has_proj and not pad_tall
                and laplacian.shape[0] != items.shape[1]):
            raise ValueError(
                f"graph has {laplacian.shape[0]} nodes but items have "
                f"{items.shape[1]} coordinates — a dims-reduced index "
                f"needs projection=..., a tall energy graph needs "
                f"pad_tall=True")

        # z-plane per shard: z = (x @ proj?) @ signalsᵀ (identity maps
        # when absent) — mirrors energymaps._energy_z_items shard-wise
        def _z_shard(x, pr, sg):
            xp = x if not has_proj else jnp.dot(
                x, pr, preferred_element_type=dt)
            return jnp.dot(xp, sg.T, preferred_element_type=dt) \
                if has_signals else xp

        z_items = jax.jit(shard_map(
            _z_shard, mesh=mesh,
            in_specs=(P(ITEMS_AXIS, None), P(), P()),
            out_specs=P(ITEMS_AXIS, None), check_vma=False))(
                items, proj, sig)
        g = z_items.shape[1]
        self._g = g

        knl = kernel or ("binned" if _use_binned_energy(
            shard_n, k_local, g) else "chunked")
        from ..config import bucket_rows
        chunk = min(ENERGY_CHUNK, max(bucket_rows(shard_n), 8))

        # per-shard prepared z corpus (pad + ||z||² hoist); the raw
        # sharded z stays for the repair path
        prepped = knl == "binned" and prepare_corpus
        step_z, step_lam, step_zn = z_items, item_lambdas, None
        if prepped:
            from ..ops.pallas_bintopk import binned_energy_layout
            n_pad_l = binned_energy_layout(self.batch_size, shard_n, g,
                                           k_local)[4]
            pad_l = n_pad_l - shard_n
            prep = shard_map(
                lambda z, zl: (
                    jnp.pad(z.astype(jnp.float32), ((0, pad_l), (0, 0))),
                    jnp.pad(zl.astype(jnp.float32), (0, pad_l)),
                    jnp.pad(jnp.sum(z.astype(jnp.float32) ** 2, axis=1),
                            (0, pad_l))),
                mesh=mesh,
                in_specs=(P(ITEMS_AXIS, None), P(ITEMS_AXIS)),
                out_specs=(P(ITEMS_AXIS, None), P(ITEMS_AXIS),
                           P(ITEMS_AXIS)),
                check_vma=False)
            step_z, step_lam, step_zn = jax.jit(prep)(z_items,
                                                      item_lambdas)
        else:
            # placeholder operand only: the non-prepared binned kernel
            # computes norms internally and the chunked scorer never
            # reads them — a device-built sharded zeros avoids a full
            # corpus pass and a dead (N,) array held for the session
            step_zn = jax.jit(
                lambda: jnp.zeros((z_items.shape[0],), dtype=jnp.float32),
                out_shardings=NamedSharding(mesh, P(ITEMS_AXIS)))()

        def _shard_fn(q, z, zlam, zn, lap, pr, sg):
            q_prep = q if not has_proj else jnp.dot(
                q, pr, preferred_element_type=dt)
            taus = select_tau_batch(q_prep, taumode)
            qlam = synthetic_lambda_batch(
                q_prep, lap, taus, pad_items=pad_tall,
                precision=QUERY_PREP_PRECISION)
            z_q = jnp.dot(q_prep, sg.T, preferred_element_type=dt) \
                if has_signals else q_prep
            wl = jnp.asarray(w_lambda, dtype=dt)
            wd = jnp.asarray(w_dirichlet, dtype=dt)
            det = None
            if knl == "binned":
                from ..ops.pallas_bintopk import binned_energy_topk
                ls, li, fl, det_l = binned_energy_topk(
                    z_q, qlam, z, zlam, wl, wd, k=k_local,
                    interpret=jax.default_backend() != "tpu",
                    prepared=prepped,
                    n_items=shard_n if prepped else 0,
                    z_norms=zn if prepped else None, return_det=True)
                ls = ls.astype(dt)
                fl = jax.lax.pmax(fl, ITEMS_AXIS)
                det = jax.lax.all_gather(det_l, ITEMS_AXIS, axis=1,
                                         tiled=True)
            else:
                ls, li = _energy_score_topk_chunked(
                    z_q, qlam, z, zlam, wl, wd, k=k_local, chunk=chunk)
                ls = ls.astype(dt)
                fl = jnp.zeros((q.shape[0],), dtype=jnp.int32)
            shard_id = jax.lax.axis_index(ITEMS_AXIS)
            gidx = li + shard_id * shard_n
            all_scores = jax.lax.all_gather(ls, ITEMS_AXIS, axis=1,
                                            tiled=True)
            all_idx = jax.lax.all_gather(gidx, ITEMS_AXIS, axis=1,
                                         tiled=True)
            top_scores, pos = jax.lax.top_k(all_scores, k_eff)
            top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
            ids_fl = jnp.concatenate([top_idx, fl[:, None]], axis=1)
            if det is not None:
                return top_scores, ids_fl, qlam, det
            return top_scores, ids_fl, qlam

        n_out = 4 if knl == "binned" else 3
        fn = shard_map(_shard_fn, mesh=mesh,
                       in_specs=(P(), P(ITEMS_AXIS, None), P(ITEMS_AXIS),
                                 P(ITEMS_AXIS), P(), P(), P()),
                       out_specs=tuple([P()] * n_out), check_vma=False)
        jitted = jax.jit(fn)
        if mp:
            rep = replicated_sharding(mesh)
            self._step = lambda q: jitted(
                put_global(np.asarray(q), rep), step_z, step_lam,
                step_zn, laplacian, proj, sig)
        else:
            self._step = lambda q: jitted(q, step_z, step_lam, step_zn,
                                          laplacian, proj, sig)

        # exact distributed chunked pass (repair fallback): per-shard
        # streaming scorer + the same all_gather merge, replicated out
        def _exact_shard(zq, ql, z, zlam):
            ls, li = _energy_score_topk_chunked(
                zq, ql, z, zlam, jnp.asarray(w_lambda, dtype=dt),
                jnp.asarray(w_dirichlet, dtype=dt), k=k_local,
                chunk=chunk)
            shard_id = jax.lax.axis_index(ITEMS_AXIS)
            gidx = li + shard_id * shard_n
            s_all = jax.lax.all_gather(ls.astype(dt), ITEMS_AXIS, axis=1,
                                       tiled=True)
            i_all = jax.lax.all_gather(gidx, ITEMS_AXIS, axis=1,
                                       tiled=True)
            ts, pos = jax.lax.top_k(s_all, k_eff)
            return ts, jnp.take_along_axis(i_all, pos, axis=1)

        exact_fn = jax.jit(shard_map(
            _exact_shard, mesh=mesh,
            in_specs=(P(), P(), P(ITEMS_AXIS, None), P(ITEMS_AXIS)),
            out_specs=(P(), P()), check_vma=False))

        def repair(q_block, qlam_np, rows, scores=None, ids=None,
                   det_rows=None):
            from ..ops.bin_repair import padded_take
            take = padded_take(rows)
            q = put_global(np.asarray(q_block[take], dtype=np.dtype(dt)),
                           replicated_sharding(mesh)) if mp \
                else jnp.asarray(q_block[take], dtype=dt)
            q_prep = q if not has_proj else jnp.dot(
                q, proj, preferred_element_type=dt)
            z_pad = jnp.dot(q_prep, sig.T, preferred_element_type=dt) \
                if has_signals else q_prep
            z = np.asarray(z_pad)[:len(rows)]

            def full_exact(rel_rows):
                m = len(rel_rows)
                pad = (-m) % 128
                zs = np.pad(z[rel_rows], ((0, pad), (0, 0)))
                qls = np.pad(np.asarray(qlam_np)[rows[rel_rows]],
                             (0, pad))
                rep_sh = replicated_sharding(mesh)
                rs, ri = exact_fn(
                    put_global(zs.astype(np.dtype(dt)), rep_sh),
                    put_global(qls.astype(np.dtype(dt)), rep_sh),
                    z_items, item_lambdas)
                return np.asarray(rs)[:m], np.asarray(ri)[:m]

            if det_rows is None or mp:
                # multi-process: no replicated-output contract on the
                # strided chunk programs (see DistributedSearchSession)
                return full_exact(np.arange(len(rows)))
            from ..ops.bin_repair import strided_energy_repair
            return strided_energy_repair(
                np.asarray(z), qlam_np[rows], det_rows,
                scores[rows, k_eff - 1], ids[rows],
                z_items, item_lambdas, None,
                float(w_lambda), float(w_dirichlet), k=k_eff, n=n,
                prepared=False, shard_n=shard_n, fallback=full_exact,
                cur_scores=scores[rows])

        self._repair = repair if knl == "binned" else None

    @classmethod
    def from_index(cls, index, mesh: Mesh, batch_size: int, k: int = 10,
                   w_lambda: float = 1.0, w_dirichlet: float = 0.5,
                   depth: int = 2, **kw) -> "DistributedEnergySearchSession":
        """Open a mesh energy session over a built energy ArrowIndex
        (the corpus and λ re-shard; graph/signals/projection
        replicate)."""
        aspace, gl = index.aspace, index.gl
        dt = aspace.data.dtype
        proj = None
        if aspace.projection_matrix is not None:
            proj = aspace.projection_matrix.matrix(dtype=dt)
        items_proj = aspace.projected_items()
        use_signals = (aspace.signals is not None
                       and np.shape(aspace.signals)[0] > 0
                       and np.shape(aspace.signals)[1]
                       == items_proj.shape[1])
        signals = np.asarray(aspace.signals) if use_signals else None
        # the session shards RAW items and projects PER SHARD inside the
        # z-plane program (queries project inside the step, exactly like
        # prepare_query_items_batch + search_energy_batch do on one chip
        # — energymaps.py:511-536)
        return cls(aspace.data, aspace.lambdas,
                   jnp.asarray(gl.matrix, dtype=dt), mesh, batch_size,
                   k=k, w_lambda=w_lambda, w_dirichlet=w_dirichlet,
                   taumode=aspace.taumode, depth=depth, projection=proj,
                   signals=signals, pad_tall=aspace.pad_tall_graphs, **kw)

    def warmup(self) -> None:
        """Compile the fused multi-chip energy step (and the repair
        programs) so serving is dispatch-only."""
        from ..index import warm_step
        warm_step(self._step, self.batch_size, self._dim, self._dt,
                  repair=self._repair, k=self.k)

    def search_stream(self, batches):
        """Yield (scores, ids) per input batch with ``depth`` batches in
        flight across the mesh (shared driver: index.stream_search)."""
        from ..index import stream_search
        return stream_search(self._step, batches, self.batch_size,
                             self.depth, self._dt, dim=self._dim,
                             repair=self._repair)


def distributed_index_step(
    items: jax.Array,       # (N, F) sharded
    centroids: jax.Array,   # (X, F) replicated (from host clustering)
    queries: jax.Array,     # (B, F) replicated
    taumode: TauMode,
    graph_params,
    k: int,
    mesh: Mesh,
):
    """One full device-side index+query step over the mesh — the
    "training step" analogue used by the multi-chip dry run:

    1. build the F′×F′ λτ-graph from the (replicated) centroids;
    2. compute λτ for every (sharded) item;
    3. prepare query λ and run the distributed top-k.
    """
    from ..laplacian import build_laplacian_matrix

    gl = build_laplacian_matrix(centroids.T, graph_params,
                                n_items=items.shape[0])
    lap = put_global(np.asarray(gl.matrix), replicated_sharding(mesh))

    lambdas = sharded_compute_taumode_lambdas(items, lap, taumode, mesh)

    q_taus = select_tau_batch(queries, taumode)
    q_lambdas = synthetic_lambda_batch(queries, lap, q_taus,
                                       precision=QUERY_PREP_PRECISION)

    scores, idx = distributed_lambda_aware_topk(
        queries, q_lambdas, items, lambdas,
        jnp.asarray(0.9, dtype=items.dtype), k, mesh)
    return lambdas, scores, idx
