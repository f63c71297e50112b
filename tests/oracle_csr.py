"""Literal-structure CSR two-pass synthetic-λ oracle.

A THIRD independent implementation of the λτ formula, ported
pass-for-pass from the reference's sparse algorithm
(/root/reference/src/taumode.rs:552-660): explicit CSR row loops, the
same two-pass split (fused E-numerator + edge-energy first pass, then
the dispersion-share pass gated on a positive edge-energy sum), the
same guards (denominator > 1e-12 else E_raw := 0, w := max(-L_ij, 0),
i != j only, G clamped to [0, 1]) and the same final blend
λ = τ·E/(E+τ) + (1-τ)·G.

It shares no structure with either production path — the batched
matmul chain (taumode.synthetic_lambda_batch, method="matmul") or the
per-item vmap (method="direct") — so three-way agreement at 1e-12 is
strong evidence all three implement the same mathematics (the closest
cross-implementation check available without a cargo toolchain; see
PARITY.md).
"""

from __future__ import annotations

import numpy as np


def dense_to_csr(lap):
    """CSR triplets (indptr, indices, data) of a dense Laplacian's
    nonzero pattern — plain numpy, no scipy, so the oracle's input
    construction is itself independent of the library code."""
    lap = np.asarray(lap, dtype=np.float64)
    n = lap.shape[0]
    indptr = np.zeros(n + 1, dtype=np.int64)
    indices = []
    data = []
    for i in range(n):
        nz = np.nonzero(lap[i])[0]
        indptr[i + 1] = indptr[i] + nz.size
        indices.extend(nz.tolist())
        data.extend(lap[i, nz].tolist())
    return indptr, np.asarray(indices, dtype=np.int64), \
        np.asarray(data, dtype=np.float64)


def synthetic_lambda_csr_oracle(item_vector, indptr, indices, data,
                                tau: float) -> float:
    """Reference: compute_synthetic_lambda_csr (taumode.rs:552-660)."""
    x = np.asarray(item_vector, dtype=np.float64)
    n = indptr.shape[0] - 1

    # pass 1 (fused): Rayleigh numerator + total edge energy
    numerator = 0.0
    edge_energy_sum = 0.0
    for i in range(n):
        xi = x[i]
        for p in range(indptr[i], indptr[i + 1]):
            j = indices[p]
            lij = data[p]
            numerator += xi * lij * x[j]
            if i != j:
                w = max(-lij, 0.0)
                if w > 0.0:
                    d = xi - x[j]
                    edge_energy_sum += w * d * d

    # the reference sums the FULL item vector, not just the first n
    # coordinates (taumode.rs:597: par_iter over item_vector) — the
    # partial-coordinate quirk the numerator/denominator asymmetry
    # preserves
    denominator = float(np.sum(x * x))
    e_raw = numerator / denominator if denominator > 1e-12 else 0.0

    # pass 2: dispersion shares, only when there is edge energy
    if edge_energy_sum > 0.0:
        g_sq_sum = 0.0
        for i in range(n):
            xi = x[i]
            for p in range(indptr[i], indptr[i + 1]):
                j = indices[p]
                lij = data[p]
                if i != j:
                    w = max(-lij, 0.0)
                    if w > 0.0:
                        d = xi - x[j]
                        contrib = w * d * d
                        share = contrib / edge_energy_sum
                        g_sq_sum += share * share
    else:
        g_sq_sum = 0.0

    g_raw = min(max(g_sq_sum, 0.0), 1.0)
    e_bounded = e_raw / (e_raw + tau)
    return tau * e_bounded + (1.0 - tau) * g_raw
