"""Row-wise bitonic sort (experiment, currently NOT the default).

XLA's generic variadic sort is the single most expensive op in the λτ
pipeline on TPU (τ-median over a 1M×128 corpus: ~47 ms device time, 10×
the cost of the λ matmuls).  This bitonic network over the static feature
axis was built as a replacement, but measured 3.4× SLOWER on v5e
(168 ms vs 50 ms wall at 1M×128): each of the 28 stages' lane permutes
lowers to a full-array gather, i.e. ~28 HBM round trips.  Kept for
reference and for a future Pallas in-register variant (pltpu.roll keeps
the exchange on-chip); taumode uses jnp.sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bitonic_sort_rows"]


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


@jax.jit
def bitonic_sort_rows(x: jax.Array) -> jax.Array:
    """Sort each row of (N, F) ascending.  Non-finite values are mapped to
    +inf first (they sort last), matching how select_tau_batch prepares
    its input.  Returns shape (N, F)."""
    n, f = x.shape
    f2 = _next_pow2(f)
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    if f2 != f:
        x = jnp.pad(x, ((0, 0), (0, f2 - f)), constant_values=np.inf)

    col = np.arange(f2)
    k = 2
    while k <= f2:
        j = k // 2
        while j >= 1:
            partner = col ^ j
            # static permutation gather along the lane axis
            px = x[:, partner]
            ascending = (col & k) == 0
            is_lower = col < partner
            take_min = np.where(ascending, is_lower, ~is_lower)
            mask = jnp.asarray(take_min)[None, :]
            x = jnp.where(mask, jnp.minimum(x, px), jnp.maximum(x, px))
            j //= 2
        k *= 2
    return x[:, :f]
