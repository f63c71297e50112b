"""Synthetic dataset generators mirroring the reference fixtures
(reference: src/tests/test_data.rs:6256-6368) plus a regenerated stand-in
for the missing 3000-row example blob
(examples/common/datasets/vectors_data_3000.txt, listed in
/root/reference/.MISSING_LARGE_BLOBS)."""

from __future__ import annotations

import numpy as np


def make_moons_hd(n: int, noise: float, hd_noise: float, dims: int,
                  seed: int) -> np.ndarray:
    """Two interleaving half-moons lifted to `dims` dimensions."""
    rng = np.random.default_rng(seed)
    n1 = n // 2
    n2 = n - n1
    t1 = rng.uniform(0.0, np.pi, n1)
    t2 = rng.uniform(0.0, np.pi, n2)
    xy1 = np.stack([np.cos(t1), np.sin(t1)], axis=1)
    xy2 = np.stack([1.0 - np.cos(t2), 0.5 - np.sin(t2)], axis=1)
    xy = np.concatenate([xy1, xy2], axis=0)
    xy += rng.normal(0.0, noise, xy.shape)
    out = np.zeros((n, dims))
    out[:, :2] = xy
    if dims > 2:
        out[:, 2:] = rng.normal(0.0, hd_noise, (n, dims - 2))
    return out


def make_gaussian_blob(n: int, dims: int = 8, spread: float = 0.5,
                       seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    center = rng.uniform(-1.0, 1.0, dims)
    return center[None, :] + rng.normal(0.0, spread, (n, dims))


def make_gaussian_hd(n: int, spread: float = 0.6, dims: int = 96,
                     n_blobs: int = 3, seed: int = 7) -> np.ndarray:
    """Several high-dimensional Gaussian blobs (matches the shape of the
    reference's make_gaussian_hd usage in test_querying_proj.rs)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2.0, 2.0, (n_blobs, dims))
    rows = []
    for i in range(n):
        c = centers[i % n_blobs]
        rows.append(c + rng.normal(0.0, spread, dims))
    return np.asarray(rows)


def protein_like_block() -> np.ndarray:
    """The 64x24 protein-like block embedded in example 01
    (examples/01_compare_cosine.rs:10-75): regenerated numerically with the
    same smooth index-correlated structure (values are a deterministic
    function of row/col, not a copy)."""
    n, f = 64, 24
    out = np.zeros((n, f))
    rng = np.random.default_rng(1234)
    base = rng.uniform(0.2, 0.8, f)
    for i in range(n):
        drift = (0.01 * (i % 16) + 0.0031 * (i // 16)) \
            * np.where(np.arange(f) % 2 == 0, 1.0, -1.0)
        wave = 0.1 * np.sin(2 * np.pi * (np.arange(f) / f + i / n))
        out[i] = np.clip(base + drift + wave, 0.0, 1.0)
    return out


def vectors_data_3000(n: int = 3000, dims: int = 24,
                      seed: int = 2024) -> np.ndarray:
    """Synthetic stand-in for the missing vectors_data_3000.txt blob:
    3000 clustered 24-d vectors in [0, 1] with heterogeneous cluster
    smoothness (so λτ has signal)."""
    rng = np.random.default_rng(seed)
    n_clusters = 12
    centers = rng.uniform(0.2, 0.8, (n_clusters, dims))
    spreads = rng.uniform(0.02, 0.15, n_clusters)
    labels = rng.integers(0, n_clusters, n)
    data = centers[labels] + rng.normal(0.0, 1.0, (n, dims)) \
        * spreads[labels][:, None]
    return np.clip(data, 0.0, 1.0)
