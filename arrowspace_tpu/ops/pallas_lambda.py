"""Pallas TPU kernel: fused synthetic-λτ batch.

The XLA formulation of the λτ batch (taumode.synthetic_lambda_batch) is a
chain of six (N×n)·(n×n) matmuls; each one re-reads the item matrix from
HBM.  At production scale (N in the millions) the batch is HBM-bound, so
this kernel tiles the items axis and computes ALL terms — Rayleigh
numerator/denominator, edge-energy S, dispersion quartic G — in one pass:
each item tile is read exactly once, and the small graph operands
(L, W, W², degree vectors) stay resident in VMEM.

Measured on v5e at 1M×128/n=128 the op is MXU-bound (196k flop/item vs
512 B/item), so XLA's fused chain already hits the same throughput; this
kernel matches it (rel err ~4e-7) and becomes the bandwidth-saving path
when n ≪ F (graph terms touch only x[:, :n] but XLA still streams the
full rows per matmul).

Numerical contract is identical to taumode.synthetic_lambda_batch
(reference: taumode.rs:552-660), including the partial-coordinate quirk
(graph terms over x[:n], denominator over the full vector).  τ selection
(median et al.) needs a sort and therefore stays outside (Mosaic has no
sort primitive).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DENOM_EPS

__all__ = ["fused_lambda_batch"]


def _kernel(x_ref, lap_ref, w_ref, w2_ref, dr_ref, dc_ref, d2r_ref,
            d2c_ref, tau_ref, out_ref, *, n: int):
    x = x_ref[:]                      # (T, F) full item tile
    xn = x[:, :n]                     # graph coordinates
    dt = jnp.float32

    lap = lap_ref[:]
    w = w_ref[:]
    w2 = w2_ref[:]

    def rs(a, b):                     # rowsum(a * b)
        return jnp.sum(a * b, axis=1)

    def mm(a, m):                     # (T, n) @ (n, n)ᵀ on the MXU
        return jax.lax.dot_general(
            a, m, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dt)

    # Rayleigh numerator over full L (diag included), denominator over the
    # FULL item vector (taumode.rs:565-596)
    numerator = rs(mm(xn, lap), xn)
    denom = jnp.sum(x * x, axis=1)
    e_raw = jnp.where(denom > DENOM_EPS,
                      numerator / jnp.maximum(denom, DENOM_EPS), 0.0)

    x2 = xn * xn
    x3 = x2 * xn
    x4 = x2 * x2

    # S = x²·d_r + x²·d_c - 2 xᵀWx
    s = (jnp.sum(x2 * dr_ref[:].reshape(1, -1), axis=1)
         + jnp.sum(x2 * dc_ref[:].reshape(1, -1), axis=1)
         - 2.0 * rs(mm(xn, w), xn))

    # G numerator = Σ W²_ij (x_i - x_j)⁴ via moment expansion
    t_a = (jnp.sum(x4 * d2r_ref[:].reshape(1, -1), axis=1)
           + jnp.sum(x4 * d2c_ref[:].reshape(1, -1), axis=1))
    xw2 = mm(x2, w2)
    t_b = 6.0 * rs(xw2, x2)
    t_c = -4.0 * rs(mm(x3, w2), xn)
    t_d = -4.0 * rs(mm(xn, w2), x3)
    g_num = t_a + t_b + t_c + t_d

    g = jnp.where(s > 0.0, g_num / jnp.maximum(s * s, DENOM_EPS), 0.0)
    g = jnp.clip(g, 0.0, 1.0)

    tau = tau_ref[:]
    e_bounded = e_raw / (e_raw + tau)
    out_ref[:] = tau * e_bounded + (1.0 - tau) * g


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_lambda_batch(
    items: jax.Array,      # (N, F)
    laplacian: jax.Array,  # (n, n), n <= F
    taus: jax.Array,       # (N,)
    *,
    tile: int = 0,         # 0 = auto from the VMEM budget
    interpret: bool = False,
) -> jax.Array:
    n_items, f = items.shape
    n = laplacian.shape[0]
    if n > f:
        raise ValueError(
            f"graph has {n} nodes but items have only {f} coordinates")
    dt = jnp.float32

    if tile <= 0:
        # Dominant VMEM per item row: the x tile (F) plus the four power
        # planes and five matmul outputs (all n wide), double-buffered.
        # This Mosaic build crashes on tiles < 1024, so if the budget
        # demands a smaller tile (wide graphs), use the XLA chain instead —
        # at large n the op is MXU-bound anyway, so nothing is lost.
        per_row = (2 * f + 9 * n) * 4
        tile = (6 * 1024 * 1024 // per_row) // 1024 * 1024
        if tile < 1024:
            from ..taumode import synthetic_lambda_batch
            return synthetic_lambda_batch(items, laplacian, taus)
        tile = min(tile, 2048)

    lap = laplacian.astype(dt)
    eye = jnp.eye(n, dtype=dt)
    w = jnp.maximum(-lap, 0.0) * (1.0 - eye)
    w2 = w * w
    d_r = jnp.sum(w, axis=1)
    d_c = jnp.sum(w, axis=0)
    d2_r = jnp.sum(w2, axis=1)
    d2_c = jnp.sum(w2, axis=0)

    x = items.astype(dt)
    taus = taus.astype(dt)
    # coarse row bucket first: one compiled program per bucket, not per N
    from ..config import bucket_rows
    n_bucket = max(bucket_rows(n_items), tile)
    n_pad = ((n_bucket + tile - 1) // tile) * tile
    if n_pad != n_items:
        x = jnp.pad(x, ((0, n_pad - n_items), (0, 0)))
        # τ is floored > 0, pad with 1 to keep the kernel division benign
        taus = jnp.pad(taus, (0, n_pad - n_items), constant_values=1.0)
    n_tiles = n_pad // tile

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # items tile
            pl.BlockSpec((n, n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),   # L (resident)
            pl.BlockSpec((n, n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),   # W
            pl.BlockSpec((n, n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),   # W²
            pl.BlockSpec((n,), lambda t: (0,),
                         memory_space=pltpu.VMEM),   # d_r
            pl.BlockSpec((n,), lambda t: (0,),
                         memory_space=pltpu.VMEM),   # d_c
            pl.BlockSpec((n,), lambda t: (0,),
                         memory_space=pltpu.VMEM),   # d2_r
            pl.BlockSpec((n,), lambda t: (0,),
                         memory_space=pltpu.VMEM),   # d2_c
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),   # taus tile
        ],
        out_specs=pl.BlockSpec((tile,), lambda t: (t,),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, n=n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad,), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n * n * 6,
            bytes_accessed=n_pad * f * 4 + 3 * n * n * 4 + n_pad * 8,
            transcendentals=0,
        ),
    )(x, lap, w, w2, d_r, d_c, d2_r, d2_c, taus)
    return out[:n_items]
