"""ctypes binding for the C++ incremental-clustering kernel.

Mirrors clustering.rs:547-910 exactly (create/assign/soft-outlier/drop with
running-mean updates).  Sampling decisions stay in Python (they carry
stateful RNG + counters); the C++ side consumes a precomputed keep-decision
per row for the Simple sampler, and falls back to Python when the sampler
is density-adaptive (its rate depends on evolving cluster state).
"""

from __future__ import annotations

import ctypes
import os


import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "libarrowspace_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.incremental_clustering.restype = ctypes.c_longlong
        lib.incremental_clustering.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # rows (n*f)
            ctypes.c_longlong,                # n
            ctypes.c_longlong,                # f
            ctypes.c_longlong,                # max_clusters
            ctypes.c_double,                  # radius
            ctypes.POINTER(ctypes.c_uint8),   # keep mask (n) or NULL
            ctypes.POINTER(ctypes.c_double),  # out centroids (max*f)
            ctypes.POINTER(ctypes.c_longlong),  # out counts (max)
            ctypes.POINTER(ctypes.c_longlong),  # out assignments (n), -1=None
        ]
        if hasattr(lib, "incremental_clustering_density"):
            lib.incremental_clustering_density.restype = ctypes.c_longlong
            lib.incremental_clustering_density.argtypes = [
                ctypes.POINTER(ctypes.c_double),   # rows
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_double,                   # radius
                ctypes.POINTER(ctypes.c_double),   # uniforms (n)
                ctypes.c_double,                   # base_rate
                ctypes.POINTER(ctypes.c_double),   # out centroids
                ctypes.POINTER(ctypes.c_longlong),  # out counts
                ctypes.POINTER(ctypes.c_longlong),  # out assignments
                ctypes.POINTER(ctypes.c_longlong),  # out kept
            ]
        if hasattr(lib, "incremental_clustering_certified_block"):
            fn = lib.incremental_clustering_certified_block
            fn.restype = ctypes.c_longlong
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double),   # rows_block
                ctypes.c_longlong, ctypes.c_longlong,  # bn, f
                ctypes.POINTER(ctypes.c_double),   # s2_safe (bn)
                ctypes.POINTER(ctypes.c_longlong),  # bidx (bn)
                ctypes.c_longlong,                 # n_snap
                ctypes.c_longlong, ctypes.c_double,  # max_clusters, radius
                ctypes.POINTER(ctypes.c_uint8),    # keep mask or NULL
                ctypes.POINTER(ctypes.c_double),   # uniforms or NULL
                ctypes.c_double,                   # base_rate
                ctypes.POINTER(ctypes.c_double),   # centroids
                ctypes.POINTER(ctypes.c_longlong),  # counts
                ctypes.POINTER(ctypes.c_longlong),  # assign_block
                ctypes.POINTER(ctypes.c_double),   # m_scratch
                ctypes.POINTER(ctypes.c_longlong),  # inout n_c
                ctypes.POINTER(ctypes.c_longlong),  # out kept
                ctypes.POINTER(ctypes.c_longlong),  # out fallbacks
            ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


# Above this many rows the seeded scan runs the certified-snapshot
# blocked variant: snapshot distances via multi-core BLAS GEMM, one
# exact corrective distance per row in C++ (bit-identical results; see
# incremental_clustering_certified_block in clustering.cpp).
CERTIFIED_MIN_ROWS = 32768
_CERT_BLOCK = 8192


def _certified_scan(lib, x, nfeatures, max_clusters, radius,
                    keep_mask, uniforms, base_rate):
    """Blocked certified-snapshot driver.  Returns (n_c, cent, counts,
    assign, kept, fallbacks)."""
    n = x.shape[0]
    cent = np.zeros((max_clusters, nfeatures), dtype=np.float64)
    counts = np.zeros(max_clusters, dtype=np.int64)
    assign = np.full(n, -1, dtype=np.int64)
    assign_block = np.empty(_CERT_BLOCK, dtype=np.int64)
    m_scratch = np.empty(max_clusters, dtype=np.float64)
    n_c = ctypes.c_longlong(0)
    fallbacks = ctypes.c_longlong(0)
    kept_total = 0
    dptr = ctypes.POINTER(ctypes.c_double)
    lptr = ctypes.POINTER(ctypes.c_longlong)
    null_u8 = ctypes.POINTER(ctypes.c_uint8)()
    null_f64 = dptr()

    pos = 0
    while pos < n:
        end = min(pos + _CERT_BLOCK, n)
        bn = end - pos
        if keep_mask is not None:
            # dropped rows never touch state: compact the block to kept
            # rows so the BLAS pass doesn't score them (the one-shot
            # scan elides their distance scans the same way)
            kept_idx = np.nonzero(keep_mask[pos:end])[0]
            if kept_idx.size == 0:
                pos = end
                continue
            block = np.ascontiguousarray(x[pos:end][kept_idx])
            bn = int(kept_idx.size)
        else:
            kept_idx = None
            block = np.ascontiguousarray(x[pos:end])
        n_snap = n_c.value
        if n_snap > 0:
            # The snapshot pass only GUIDES the C++ scan (candidate +
            # certificate margin); every accepted distance is recomputed
            # in exact f64, so this GEMM can run in f32 at ~2x the BLAS
            # rate — its rounding is absorbed into the safety epsilon
            # below (wider margin => at worst a few more exact-scan
            # fallbacks, never a different result).
            block32 = block.astype(np.float32)
            snap32 = cent[:n_snap].astype(np.float32)
            rowsq = np.einsum("ij,ij->i", block32, block32)
            centsq = np.einsum("ij,ij->i", snap32, snap32)
            d2 = rowsq[:, None] - 2.0 * block32 @ snap32.T + centsq[None, :]
            np.maximum(d2, 0.0, out=d2)
            bidx = np.ascontiguousarray(np.argmin(d2, axis=1),
                                        dtype=np.int64)
            if n_snap >= 2:
                s2sq = np.partition(d2, 1, axis=1)[:, 1].astype(np.float64)
            else:
                s2sq = np.full(bn, np.inf)
            # f32 summation error bound for the expanded form:
            # |err| <~ f * 2^-24 * (||r||^2 + ||c||^2); 1e-4 scale is
            # orders above that and still far below useful margins
            eps = 1e-4 * (rowsq.astype(np.float64)
                          + float(centsq.max()) + 1.0)
            s2_safe = np.ascontiguousarray(
                np.sqrt(np.maximum(s2sq - eps, 0.0)))
        else:
            bidx = np.zeros(bn, dtype=np.int64)
            s2_safe = np.zeros(bn, dtype=np.float64)
        m_scratch[:] = 0.0
        kept = ctypes.c_longlong(0)
        consumed = lib.incremental_clustering_certified_block(
            block.ctypes.data_as(dptr), bn, nfeatures,
            s2_safe.ctypes.data_as(dptr), bidx.ctypes.data_as(lptr),
            n_snap, max_clusters, radius,
            null_u8,  # mask rows are compacted away above
            np.ascontiguousarray(uniforms[pos:end]).ctypes.data_as(dptr)
            if uniforms is not None else null_f64,
            base_rate,
            cent.ctypes.data_as(dptr), counts.ctypes.data_as(lptr),
            assign_block.ctypes.data_as(lptr),
            m_scratch.ctypes.data_as(dptr),
            ctypes.byref(n_c), ctypes.byref(kept), ctypes.byref(fallbacks))
        consumed = int(consumed)
        assert consumed > 0
        kept_total += int(kept.value)
        if kept_idx is None:
            assign[pos:pos + consumed] = assign_block[:consumed]
            pos += consumed
        else:
            assign[pos + kept_idx[:consumed]] = assign_block[:consumed]
            # dropped rows between consumed kept rows are no-ops; resume
            # at the first unconsumed KEPT row
            pos = end if consumed == bn else pos + int(kept_idx[consumed])
    return (n_c.value, cent, counts, assign, kept_total,
            int(fallbacks.value))


def native_incremental_clustering(builder, rows, nfeatures, max_clusters,
                                  radius, sampler):
    """Returns (centroids, assignments, sizes) or None to fall back."""
    lib = _load()
    if lib is None:
        return None

    x = np.ascontiguousarray(np.asarray(rows, dtype=np.float64))
    n = x.shape[0]

    sampling_enabled = builder.sampling is not None
    out_cent = np.zeros((max_clusters, nfeatures), dtype=np.float64)
    out_counts = np.zeros(max_clusters, dtype=np.int64)
    out_assign = np.full(n, -1, dtype=np.int64)

    use_certified = (n >= CERTIFIED_MIN_ROWS
                     and hasattr(lib, "incremental_clustering_certified_block"))
    if use_certified:
        if sampling_enabled and builder.sampling.kind == "density_adaptive":
            uniforms = np.ascontiguousarray(sampler._rng.random(n))
            n_c, out_cent, out_counts, out_assign, kept, _fb = \
                _certified_scan(lib, x, nfeatures, max_clusters, radius,
                                None, uniforms, sampler.base_rate)
            sampler.sampled_count += kept
            sampler.discarded_count += n - kept
            sampler.current_idx += n
        else:
            keep = None
            if sampling_enabled:
                keep = np.ascontiguousarray(
                    (sampler._rng.random(n)
                     < sampler.keep_rate).astype(np.uint8))
                sampler.sampled_count += int(keep.sum())
                sampler.discarded_count += int(n - keep.sum())
            n_c, out_cent, out_counts, out_assign, _kept, _fb = \
                _certified_scan(lib, x, nfeatures, max_clusters, radius,
                                keep, None, 0.0)
        if n_c <= 0:
            sampler_desc = str(builder.sampling) if builder.sampling \
                else "None"
            raise RuntimeError(
                f"No clusters created from data, sampling: {sampler_desc}")
        from ..config import is_test_mode
        if sampling_enabled:
            sampled, _ = sampler.get_stats()
            ratio = sampled / n if n else 0.0
            if not is_test_mode():
                assert 0.325 < ratio < 0.89, (
                    f"sampling_rate not in the interval 0.325..0.875 "
                    f"but {ratio}")
        from ..clustering import Assignments
        return (out_cent[:n_c].copy(), Assignments(out_assign),
                out_counts[:n_c].tolist())

    if sampling_enabled and builder.sampling.kind == "density_adaptive":
        # rate depends on the evolving cluster state: uniforms are drawn
        # here (one per row, row order — same consumption as the Python
        # path) and the rate formula is evaluated in the C++ loop
        if not hasattr(lib, "incremental_clustering_density"):
            return None
        uniforms = np.ascontiguousarray(sampler._rng.random(n))
        kept = ctypes.c_longlong(0)
        n_c = lib.incremental_clustering_density(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, nfeatures, max_clusters, radius,
            uniforms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            sampler.base_rate,
            out_cent.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            out_assign.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            ctypes.byref(kept),
        )
        sampler.sampled_count += int(kept.value)
        sampler.discarded_count += int(n - kept.value)
        sampler.current_idx += n
    else:
        if sampling_enabled:
            keep = np.empty(n, dtype=np.uint8)
            rate = sampler.keep_rate
            draws = sampler._rng.random(n)
            keep[:] = draws < rate
            sampler.sampled_count += int(keep.sum())
            sampler.discarded_count += int(n - keep.sum())
            keep_ptr = keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        else:
            keep_ptr = ctypes.POINTER(ctypes.c_uint8)()

        n_c = lib.incremental_clustering(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, nfeatures, max_clusters, radius,
            keep_ptr,
            out_cent.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            out_assign.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        )
    if n_c <= 0:
        sampler_desc = str(builder.sampling) if builder.sampling else "None"
        raise RuntimeError(
            f"No clusters created from data, sampling: {sampler_desc}")

    from ..config import is_test_mode
    if sampling_enabled:
        sampled, _ = sampler.get_stats()
        ratio = sampled / n if n else 0.0
        if not is_test_mode():
            assert 0.325 < ratio < 0.89, (
                f"sampling_rate not in the interval 0.325..0.875 but {ratio}")

    from ..clustering import Assignments
    return (out_cent[:n_c].copy(), Assignments(out_assign),
            out_counts[:n_c].tolist())
