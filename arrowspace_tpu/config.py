"""Global configuration for arrowspace-tpu.

The reference implementation (arrowspace-rs) computes everything in f64 on
CPU.  On TPU the MXU wants f32/bf16; we therefore make the working dtype
configurable:

- when JAX x64 is enabled (CPU oracle / parity tests) the default dtype is
  float64, matching the reference bit-for-bit semantics;
- on TPU the default is float32 with f32 accumulation
  (``preferred_element_type``), which meets the 1e-5 relative-error budget
  of BASELINE.json for unit-scale embedding data.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Floor applied to every selected tau (reference: taumode.rs:84).
TAU_FLOOR = 1e-10

# Guard for near-zero Rayleigh denominators (reference: taumode.rs:597).
DENOM_EPS = 1e-12


def default_dtype():
    """Working dtype: float64 under x64 (parity/oracle), else float32."""
    env = os.environ.get("ARROWSPACE_DTYPE")
    if env:
        return jnp.dtype(env)
    if jax.config.jax_enable_x64:
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)


def bucket_rows(n: int, floor: int = 1024) -> int:
    """Round a row count up to a coarse bucket so Mosaic kernels compile
    once per bucket instead of once per corpus size.

    A fresh Pallas/Mosaic compile costs minutes through the remote-compile
    tunnel (measured 289s at a novel 77k x 128 shape) while the persistent
    JAX cache makes repeat shapes fast — so the padded-row waste (<= 25%
    of a millisecond-scale op above the knee, <= 2x below it) buys
    order-of-magnitude better cold-build latency across corpus sizes.

    Schedule: identity up to `floor`; next power of two up to 262144;
    above that, multiples of an eighth of the next power of two — since
    n > p2/2, the padding is at most (p2/8)/(p2/2) = 25%, with
    logarithmically many buckets per octave.
    """
    if n <= floor:
        return n
    p2 = 1 << (n - 1).bit_length()
    if p2 <= 262144:
        return p2
    q = p2 // 8
    return ((n + q - 1) // q) * q


def is_test_mode() -> bool:
    """Mirrors the reference's #[cfg(test)] gates (e.g. the sampling-ratio
    runtime assert in clustering.rs:896-900 is disabled in test builds)."""
    return os.environ.get("ARROWSPACE_TEST_MODE", "0") not in ("0", "", "false")
