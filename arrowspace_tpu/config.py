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

# ---------------------------------------------------------------------------
# Adaptive engine-selection thresholds (the TPU-era analogue of the
# reference's sequential/parallel switch, taumode.rs:219,240-246: pick the
# engine by workload size).  One accelerator dispatch through the dev
# tunnel costs ~25 ms — roughly a million times the compute of a tiny
# scan — so sub-threshold work routes to the host CPU backend.
# ---------------------------------------------------------------------------

# Query scans (batch x items x features elementwise-ops) below this run on
# the host (core.search_lambda_aware_batch).
SMALL_SCAN_ELEMS = 1 << 24

# lambda-tau batches whose items x graph-nnz work is below this run on the
# host (taumode._small_workload_cpu).
SMALL_LAMBDA_WORK = 1 << 24

# tau selection switches from the XLA row-sort to the Pallas in-register
# bitonic at this many matrix elements (taumode.select_tau_batch).
PALLAS_TAU_MIN_ELEMS = 1 << 22

# Corpora whose item matrix exceeds this many bytes compute λτ in fixed
# row windows over the resident array: the single-shot paths otherwise
# materialise a second bucket-padded copy next to the corpus (measured
# 17 GB at 10M x 128 against 15.75 GB of v5e HBM).
TAUMODE_WINDOW_BYTES = 2 << 30


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


def setup_cache(path: str = "/tmp/arrowspace_jax_cache") -> None:
    """Enable the persistent XLA compilation cache with thresholds tuned
    for this framework's cold-start profile.

    JAX's defaults skip persisting any program that compiled in under one
    second — but through the axon remote-compile tunnel even trivial
    programs cost a few hundred ms each, and a fresh process re-pays all
    of them (~5-8 s across a full build).  Persisting everything makes a
    cold process's build converge to the steady-state time after one
    warm-up anywhere on the machine.  Call this once at startup (bench.py,
    precompile, and the serving examples do).
    """
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # The cache key hashes the serialized module AFTER strip-debuginfo,
    # but a Pallas custom_call's Mosaic payload is an opaque string whose
    # embedded locations survive the strip.  With full tracebacks in
    # locations (the default), the payload bakes in up to 10 CALLER
    # frames, so the same kernel called from bench.py vs builder.py vs an
    # AOT precompile gets a different key and recompiles (~6 s each
    # through the remote-compile tunnel).  Keep only the innermost frame
    # (the kernel source itself), which is call-site invariant.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    try:
        # the cache singleton latches its directory on first use; reset so
        # a setup_cache() after earlier compiles still takes effect
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:  # pragma: no cover — private API moved
        pass


def is_test_mode() -> bool:
    """Mirrors the reference's #[cfg(test)] gates (e.g. the sampling-ratio
    runtime assert in clustering.rs:896-900 is disabled in test builds)."""
    return os.environ.get("ARROWSPACE_TEST_MODE", "0") not in ("0", "", "false")
