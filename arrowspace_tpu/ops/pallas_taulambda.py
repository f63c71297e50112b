"""Pallas TPU kernel: fully-fused λτ index scoring (τ + λ in one pass).

The λτ pipeline is two device passes — τ selection (VPU-bound bitonic
sort, ops/pallas_tau.py) then the λ matmul chain (MXU-bound,
ops/pallas_lambda.py) — each reading the item matrix from HBM.  This
kernel fuses them: one item tile is loaded once, the in-register bitonic
produces τ, and the same resident tile feeds the Rayleigh/dispersion
matmuls while the graph operands stay in VMEM.  Mosaic can overlap the
VPU sort with the MXU matmuls inside the step, so the fused cost
approaches max(τ, λ) instead of τ + λ + an extra HBM read.

Numerics are identical to select_tau_batch + synthetic_lambda_batch
(oracle-tested); applies to f32 on TPU with graphs that fit the VMEM
budget — otherwise the caller composes the two-pass path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DENOM_EPS, TAU_FLOOR
from .pallas_tau import _tau_rows

__all__ = ["fused_taulambda_batch", "fused_taulambda_fits"]


def _kernel(x_ref, lap_ref, w_ref, w2_ref, dr_ref, dc_ref, d2r_ref,
            d2c_ref, out_ref, *, n: int, f: int, f2: int, kind: str,
            pct: float, fixed: float, layout: str = "sublane"):
    x = x_ref[:]                      # (T, F) — the ONLY HBM read of items
    dt = jnp.float32

    if kind == "fixed":
        t = fixed if np.isfinite(fixed) and fixed > 0.0 else TAU_FLOOR
        tau = jnp.full((x.shape[0],), t, dtype=dt)
    else:
        tau = _tau_rows(x, f, f2, kind, pct, layout=layout)

    xn = x[:, :n]

    def rs(a, b):
        return jnp.sum(a * b, axis=1)

    def mm(a, m):
        return jax.lax.dot_general(
            a, m, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dt)

    numerator = rs(mm(xn, lap_ref[:]), xn)
    denom = jnp.sum(x * x, axis=1)
    e_raw = jnp.where(denom > DENOM_EPS,
                      numerator / jnp.maximum(denom, DENOM_EPS), 0.0)

    x2 = xn * xn
    x3 = x2 * xn
    x4 = x2 * x2
    w = w_ref[:]
    w2 = w2_ref[:]
    s = (jnp.sum(x2 * dr_ref[:].reshape(1, -1), axis=1)
         + jnp.sum(x2 * dc_ref[:].reshape(1, -1), axis=1)
         - 2.0 * rs(mm(xn, w), xn))
    t_a = (jnp.sum(x4 * d2r_ref[:].reshape(1, -1), axis=1)
           + jnp.sum(x4 * d2c_ref[:].reshape(1, -1), axis=1))
    t_b = 6.0 * rs(mm(x2, w2), x2)
    t_c = -4.0 * rs(mm(x3, w2), xn)
    t_d = -4.0 * rs(mm(xn, w2), x3)
    g_num = t_a + t_b + t_c + t_d

    g = jnp.where(s > 0.0, g_num / jnp.maximum(s * s, DENOM_EPS), 0.0)
    g = jnp.clip(g, 0.0, 1.0)
    e_bounded = e_raw / (e_raw + tau)
    out_ref[:] = tau * e_bounded + (1.0 - tau) * g


def fused_taulambda_fits(n_items: int, f: int, n: int,
                         tile: int = 1024) -> bool:
    """VMEM feasibility: item tile + sort buffer + power planes + matmul
    outputs, double-buffered, within ~6 MB (and Mosaic's >=1024 tile)."""
    f2 = 1 << (f - 1).bit_length()
    per_row = (2 * f + f2 + 9 * n) * 4
    return per_row * tile <= 10 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("kind", "pct", "fixed", "tile",
                                    "interpret", "layout"))
def fused_taulambda_batch(
    items: jax.Array,      # (N, F)
    laplacian: jax.Array,  # (n, n), n <= F
    *,
    kind: str = "median",  # "median" | "percentile" | "mean" | "fixed"
    pct: float = 0.5,
    fixed: float = 0.0,
    tile: int = 1024,
    interpret: bool = False,
    layout: str = "auto",    # τ selection layout (pallas_tau._tau_rows)
) -> jax.Array:
    if layout == "auto":
        # bisection select; MXU counting is neutral here (the λ matmul
        # chain keeps the MXU busy — benchmarks/tau_mm_ab measured
        # 15.44 vs 15.58 ms at 1Mx128, within noise)
        layout = "bisect"
    n_items, f = items.shape
    n = laplacian.shape[0]
    if n > f:
        raise ValueError(
            f"graph has {n} nodes but items have only {f} coordinates")
    f2 = 1 << (f - 1).bit_length()
    dt = jnp.float32

    lap = laplacian.astype(dt)
    eye = jnp.eye(n, dtype=dt)
    w = jnp.maximum(-lap, 0.0) * (1.0 - eye)
    w2 = w * w
    d_r = jnp.sum(w, axis=1)
    d_c = jnp.sum(w, axis=0)
    d2_r = jnp.sum(w2, axis=1)
    d2_c = jnp.sum(w2, axis=0)

    x = items.astype(dt)
    # Coarse row bucket (config.bucket_rows), then the tile multiple: all
    # corpus sizes in a bucket share one compiled Mosaic program.
    from ..config import bucket_rows
    n_bucket = max(bucket_rows(n_items), tile)
    n_pad = ((n_bucket + tile - 1) // tile) * tile
    if n_pad != n_items:
        x = jnp.pad(x, ((0, n_pad - n_items), (0, 0)), constant_values=1.0)

    grid_spec = pl.GridSpec(
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda t: (t,),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, f=f, f2=f2, kind=kind, pct=pct,
                          fixed=fixed, layout=layout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad,), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n * n * 6,
            bytes_accessed=n_pad * f * 4 + 3 * n * n * 4 + n_pad * 4,
            transcendentals=0,
        ),
    )(x, lap, w, w2, d_r, d_c, d2_r, d2_c)
    return out[:n_items]
