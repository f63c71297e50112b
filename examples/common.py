"""Shared example utilities (analogue of examples/common/lib.rs).

The reference's examples load a 3000-row dataset blob that is missing from
the snapshot (.MISSING_LARGE_BLOBS); `load_vectors_3000` regenerates an
equivalent synthetic dataset.
"""

from __future__ import annotations

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def protein_like_block():
    from data import protein_like_block as _p
    return _p()


def load_vectors_3000():
    from data import vectors_data_3000
    data = vectors_data_3000()
    ids = [f"P{i:04d}" for i in range(len(data))]
    return ids, data


def cosine_sim(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(a @ b / (na * nb))


def quality_metrics(gl, lambdas) -> dict:
    """Example-side quality metrics (examples/common/lib.rs:190-430):
    connectivity ratio, λ-distribution quality, edge efficiency."""
    import numpy as np
    lam = np.asarray(lambdas)
    m = np.asarray(gl.matrix)
    n = m.shape[0]
    offdiag = m - np.diag(np.diag(m))
    n_edges = int((offdiag != 0).sum()) // 2
    connectivity = (np.abs(offdiag).sum(axis=1) > 0).mean()
    lam_spread = float(lam.std() / (abs(lam.mean()) + 1e-12))
    return {
        "n_nodes": n,
        "n_edges": n_edges,
        "connectivity_ratio": float(connectivity),
        "lambda_mean": float(lam.mean()),
        "lambda_std": float(lam.std()),
        "lambda_spread": lam_spread,
    }
