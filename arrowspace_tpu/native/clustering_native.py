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
from typing import List, Optional

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
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


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
