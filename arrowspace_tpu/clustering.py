"""Incremental clustering with optimal-K heuristics.

Port of the reference's clustering module (reference: clustering.rs:30-928).

Host/device split (deliberate): optimal-K runs on ≤1000 sampled rows and the
incremental pass is order-dependent when seeded, so both stay host-side in
vectorised NumPy (with an optional C++ native fast path, see native/).  The
downstream Laplacian + λτ stages consume the resulting X×F centroid matrix
on device.

Key semantics preserved:
- fixed default seed 128 (clustering.rs:30);
- Two-NN intrinsic-dimension estimate on a ≤500 sample (clustering.rs:101-164);
- k bounds: k_min = max(ceil(sqrt(N/10)), 2),
  k_max = min(F, N/10, 5·ID, sqrt(N)) then max(k_min+1) and min(N/2)
  (clustering.rs:75-98);
- Calinski–Harabasz sweep with penalty 0.8·k·ln N, 3 seeded trials per k,
  coarse step then fine-tune, ties prefer larger k (clustering.rs:167-310);
- radius = 1.5 × p90 of within-cluster d², with inter-centroid fallback
  (clustering.rs:384-492);
- incremental pass: new centroid iff d² > radius·0.5 and under cap; running
  mean assignment iff d² <= radius; soft-outlier at relaxed radius ×1.5 after
  saturation; drop otherwise (clustering.rs:547-910);
- runtime assert: sampling ratio in (0.325, 0.89) outside test mode
  (clustering.rs:896-900).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .config import is_test_mode
from .utils.log import get_logger

logger = get_logger("arrowspace.clustering")

CLUSTERING_SEED = 128  # clustering.rs:30

__all__ = [
    "CLUSTERING_SEED", "compute_optimal_k", "estimate_intrinsic_dimension",
    "calinski_harabasz_score", "compute_threshold_from_pilot", "kmeans_lloyd",
    "euclidean_dist", "run_incremental_clustering_with_sampling",
    "nearest_centroid",
]


def euclidean_dist(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(np.sum((a - b) ** 2)))


def nearest_centroid(row, centroids) -> Tuple[int, float]:
    """Linear-scan nearest centroid: (index, squared distance)
    (clustering.rs:913-928)."""
    c = np.asarray(centroids, dtype=np.float64)
    d2 = np.sum((c - np.asarray(row, dtype=np.float64)[None, :]) ** 2, axis=1)
    idx = int(np.argmin(d2))
    return idx, float(d2[idx])


# ---------------------------------------------------------------------------
# K-means (pilot clustering for the heuristics)
# ---------------------------------------------------------------------------

def kmeans_lloyd(rows, k: int, max_iter: int, seed: int) -> np.ndarray:
    """Seeded Lloyd's k-means returning 0-indexed assignments
    (reference: clustering.rs:505-531, via smartcore KMeans).

    Init picks k distinct rows uniformly at random (seeded); empty clusters
    keep their previous centroid.  Semantic parity with the reference's
    seeded smartcore run (bit-parity is not possible across RNGs).
    """
    x = np.asarray(rows, dtype=np.float64)
    if x.size == 0:
        return np.zeros((0,), dtype=np.int64)
    n = x.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(np.uint64(seed))
    init_idx = rng.choice(n, size=k, replace=False)
    centroids = x[init_idx].copy()

    assignments = np.zeros(n, dtype=np.int64)
    for _ in range(max_iter):
        # squared distances (n, k)
        d2 = (np.sum(x * x, axis=1)[:, None]
              - 2.0 * x @ centroids.T
              + np.sum(centroids * centroids, axis=1)[None, :])
        new_assignments = np.argmin(d2, axis=1)
        if np.array_equal(new_assignments, assignments) and _ > 0:
            break
        assignments = new_assignments
        for c in range(k):
            mask = assignments == c
            if mask.any():
                centroids[c] = x[mask].mean(axis=0)
    return assignments


def calinski_harabasz_score(rows, assignments, k: int) -> float:
    """CH index (reference: clustering.rs:313-381)."""
    x = np.asarray(rows, dtype=np.float64)
    a = np.asarray(assignments)
    n = x.shape[0]
    if k <= 1 or k >= n:
        return 0.0
    global_centroid = x.mean(axis=0)

    bgss = 0.0
    wgss = 0.0
    for c in range(k):
        mask = a == c
        cnt = int(mask.sum())
        if cnt == 0:
            continue
        centroid = x[mask].mean(axis=0)
        bgss += cnt * float(np.sum((centroid - global_centroid) ** 2))
        wgss += float(np.sum((x[mask] - centroid) ** 2))
    if wgss < 1e-10:
        return 0.0
    return (bgss / (k - 1)) / (wgss / (n - k))


def estimate_intrinsic_dimension(rows, n: int, f: int, base_seed: int) -> int:
    """Two-NN ratio estimator (reference: clustering.rs:101-164)."""
    if n < 10:
        return min(f, 2)
    x = np.asarray(rows, dtype=np.float64)
    sample_size = min(n, 500)
    rng = np.random.default_rng(np.uint64((base_seed + 1) % 2 ** 64))
    indices = rng.permutation(n)[:sample_size]

    sq = np.sum(x * x, axis=1)
    ratios = []
    # blocked: one (chunk, N) distance tile per matmul instead of a matvec
    # per sample row — O(sample·N·F) stays, constants drop ~20x
    chunk = 64
    for s0 in range(0, len(indices), chunk):
        sel = indices[s0:s0 + chunk]
        d2 = sq[sel][:, None] - 2.0 * (x[sel] @ x.T) + sq[None, :]
        d2[np.arange(len(sel)), sel] = np.inf
        d2 = np.maximum(d2, 0.0)
        part = np.partition(d2, 1, axis=1)[:, :2]
        two = np.sqrt(np.sort(part, axis=1))
        ok = two[:, 0] > 1e-12
        ratios.extend((two[ok, 1] / two[ok, 0]).tolist())
    if not ratios:
        return min(f, 3)
    mean_ratio = float(np.mean(ratios))
    ident = 1.0 / math.log(mean_ratio) if mean_ratio > 1.001 else float(f)
    id_clamped = int(np.clip(round(ident), 1, f))
    logger.debug("Two-NN mean ratio: %.4f, estimated ID: %d",
                 mean_ratio, id_clamped)
    return id_clamped


def _step1_bounds(rows, n: int, f: int, base_seed: int):
    """(k_min, k_max, id) (reference: clustering.rs:75-98)."""
    id_est = estimate_intrinsic_dimension(rows, n, f, base_seed)
    k_min = max(math.ceil(math.sqrt(n / 10.0)), 2)
    k_max_candidates = [f, n // 10, 5 * id_est, int(n ** 0.5)]
    k_max = max(min(k_max_candidates), k_min + 1)
    k_max = min(k_max, n // 2)
    return k_min, k_max, id_est


def _best_ch_for_k(rows, k: int, base_seed: int, mult: int) -> float:
    best = 0.0
    for trial in range(3):
        trial_seed = (base_seed + k * mult + trial) % 2 ** 64
        assignments = kmeans_lloyd(rows, k, 20, trial_seed)
        best = max(best, calinski_harabasz_score(rows, assignments, k))
    return best


def _step2_calinski_harabasz(rows, k_min: int, k_max: int,
                             base_seed: int) -> int:
    """CH sweep with penalty and fine-tune (reference: clustering.rs:167-310)."""
    n = len(rows)
    if n < 10:
        return k_min
    k_range = k_max - k_min
    k_step = 1 if k_range <= 5 else (2 if k_range <= 15 else 3)
    k_candidates = list(range(k_min, k_max + 1, k_step))
    penalty = 0.8

    def penalized(k, mult):
        score = _best_ch_for_k(rows, k, base_seed, mult)
        return score - penalty * k * math.log(n)

    k_scores = [(k, penalized(k, 1000)) for k in k_candidates
                if 2 <= k < n]
    if not k_scores:
        return k_min
    # max by score; ties prefer larger k (clustering.rs:229-241)
    best_k, best_score = max(k_scores, key=lambda t: (t[1], t[0]))

    if k_step > 1:
        fine_range = [best_k - (k_step - 1), best_k - 1, best_k,
                      min(best_k + 1, k_max), min(best_k + k_step - 1, k_max)]
        fine_range = sorted({k for k in fine_range
                             if k_min <= k <= k_max and k < n
                             and k not in k_candidates})
        fine_scores = [(k, penalized(k, 10000)) for k in fine_range]
        if fine_scores:
            fine_k, fine_score = max(fine_scores, key=lambda t: (t[1], t[0]))
            if fine_score > best_score:
                best_k, best_score = fine_k, fine_score

    logger.debug("Best K=%d with penalized score=%.4f", best_k, best_score)
    return best_k if best_k < k_max else k_max


def compute_threshold_from_pilot(rows, k: int, base_seed: int) -> float:
    """radius = 1.5·p90(within-cluster d²), with inter-centroid fallback
    (reference: clustering.rs:384-492)."""
    x = np.asarray(rows, dtype=np.float64)
    assignments = kmeans_lloyd(rows, k, 20, (base_seed + 100000) % 2 ** 64)

    centroids = np.zeros((k, x.shape[1]))
    counts = np.zeros(k, dtype=np.int64)
    for c in range(k):
        mask = assignments == c
        counts[c] = mask.sum()
        if counts[c] > 0:
            centroids[c] = x[mask].mean(axis=0)

    valid = assignments < k
    dists = np.sum((x[valid] - centroids[assignments[valid]]) ** 2, axis=1)
    if dists.size == 0:
        logger.warning("No distances computed; using default radius 1.0")
        return 1.0

    dists_sorted = np.sort(dists)
    p90_idx = min(int(math.ceil(dists_sorted.size * 0.9)),
                  dists_sorted.size - 1)
    percentile_90 = float(dists_sorted[p90_idx])

    inter = []
    for i in range(k):
        for j in range(i + 1, k):
            if counts[i] > 0 and counts[j] > 0:
                inter.append(float(np.sum((centroids[i] - centroids[j]) ** 2)))
    min_inter = min(inter) if inter else float("inf")

    ratio = percentile_90 / min_inter \
        if (math.isfinite(min_inter) and min_inter > 0.0) else 1.0

    if percentile_90 < 1e-8 or ratio < 0.01:
        if inter:
            return max(min_inter * 0.15, 1e-6)
        return 1e-6
    return max(percentile_90 * 1.5, 1e-6)


def compute_optimal_k(rows, n: int, f: int,
                      seed_override: Optional[int] = None
                      ) -> Tuple[int, float, int]:
    """(K, radius, intrinsic_dim) (reference: clustering.rs:36-72)."""
    logger.info("Computing optimal K for clustering: N=%d, F=%d", n, f)
    base_seed = seed_override if seed_override is not None else CLUSTERING_SEED

    k_min, k_max, id_est = _step1_bounds(rows, n, f, base_seed)

    sample_size = min(n, 1000)
    if n > sample_size:
        rng = np.random.default_rng(np.uint64(base_seed))
        idxs = rng.permutation(n)[:sample_size]
        sampled = [rows[i] for i in idxs]
    else:
        sampled = list(rows)

    k_optimal = _step2_calinski_harabasz(sampled, k_min, k_max, base_seed)
    radius = compute_threshold_from_pilot(sampled, k_optimal, base_seed)
    return k_optimal, radius, id_est


# ---------------------------------------------------------------------------
# Incremental clustering
# ---------------------------------------------------------------------------

def run_incremental_clustering_with_sampling(
    builder,
    rows,
    nfeatures: int,
    max_clusters: int,
    radius: float,
    sampler,
) -> Tuple[np.ndarray, List[Optional[int]], List[int]]:
    """One-pass incremental clustering (reference: clustering.rs:547-910).

    Sequential scan preserving the reference's deterministic-mode contract
    (clustering.rs:842-846): in sequential execution the snapshot IS the
    current state, so snapshot-based decisions and under-lock updates
    coincide.  The unseeded rayon mode of the reference is a nondeterministic
    relaxation of this order; we keep the ordered scan for both (the native
    C++ path accelerates it).

    Returns (centroids X×F, assignments with None for dropped rows, sizes).
    """
    try:
        from .native import native_incremental_clustering
    except Exception:  # pragma: no cover
        native_incremental_clustering = None
    if native_incremental_clustering is not None:
        out = native_incremental_clustering(
            builder, rows, nfeatures, max_clusters, radius, sampler)
        if out is not None:
            return out
    return _incremental_clustering_numpy(
        builder, rows, nfeatures, max_clusters, radius, sampler)


def _incremental_clustering_numpy(builder, rows, nfeatures, max_clusters,
                                  radius, sampler):
    x = np.asarray(rows, dtype=np.float64)
    nrows = x.shape[0]
    logger.info("Starting incremental clustering with inline sampling "
                "(max_clusters=%d, radius=%.4f)", max_clusters, radius)

    sampling_enabled = builder.sampling is not None

    # Pre-allocated centroid buffer; `n_c` live centroids.
    cent = np.zeros((max_clusters, nfeatures), dtype=np.float64)
    counts = np.zeros(max_clusters, dtype=np.int64)
    n_c = 0
    assignments: List[Optional[int]] = [None] * nrows
    relax_factor = 1.5

    for row_idx in range(nrows):
        row = x[row_idx]

        # PHASE 1: snapshot distance (sequential => snapshot == current)
        if n_c == 0:
            best_idx, best_d2 = 0, float("inf")
        else:
            d2 = np.sum((cent[:n_c] - row[None, :]) ** 2, axis=1)
            best_idx = int(np.argmin(d2))
            best_d2 = float(d2[best_idx])

        if sampling_enabled:
            if not sampler.should_keep(row, best_d2, n_c, max_clusters):
                continue

        # First centroid special case
        if n_c == 0:
            cent[0] = row
            counts[0] = 1
            assignments[row_idx] = 0
            n_c = 1
            continue

        # PHASE 3: decision on snapshot distance
        if n_c < max_clusters and best_d2 > radius * 0.5:
            cent[n_c] = row
            counts[n_c] = 1
            assignments[row_idx] = n_c
            n_c += 1
        elif best_d2 <= radius:
            # running-mean assignment (recomputed against current state)
            d2 = np.sum((cent[:n_c] - row[None, :]) ** 2, axis=1)
            bi = int(np.argmin(d2))
            k_new = counts[bi] + 1
            cent[bi] += (row - cent[bi]) / k_new
            counts[bi] = k_new
            assignments[row_idx] = bi
        else:
            # soft-outlier policy after saturation (clustering.rs:760-814)
            d2 = np.sum((cent[:n_c] - row[None, :]) ** 2, axis=1)
            bi = int(np.argmin(d2))
            cur_d2 = float(d2[bi])
            if cur_d2 <= radius * relax_factor:
                counts[bi] += 1  # centroid not moved (eta = 0)
                assignments[row_idx] = bi
            # else: drop

    if n_c == 0:
        sampler_desc = str(builder.sampling) if builder.sampling else "None"
        raise RuntimeError(
            f"No clusters created from data, sampling: {sampler_desc}")

    if sampling_enabled:
        sampled, discarded = sampler.get_stats()
        sampling_ratio = sampled / nrows if nrows else 0.0
        logger.debug("Inline sampling complete: %d kept (%.2f%%), %d discarded",
                     sampled, sampling_ratio * 100.0, discarded)
        if not is_test_mode():
            assert 0.325 < sampling_ratio < 0.89, (
                f"sampling_rate not in the interval 0.325..0.875 "
                f"but {sampling_ratio}")

    return cent[:n_c].copy(), assignments, counts[:n_c].tolist()
