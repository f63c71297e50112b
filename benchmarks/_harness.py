"""Shared amortised device-timing harness for the benchmark scripts.

ONE canonical copy of the timing-validity-critical function: the
consume-one revision of this loop let XLA dead-code-eliminate the
unconsumed query-block pallas_calls at B > block and silently inflated
every B=2048 number ~2.4x (benchmarks/dce_audit.py).  The contract:

- `make_body(q_perturbed, *big)` must return a scalar that folds one
  element from EVERY output row into the carry (e.g.
  `jnp.sum(out[0][:, :1]) * 1e-20`) so no sub-call is dead;
- big arrays come through `big` (jit ARGUMENTS — a closure capture
  embeds them as HLO constants and blows the remote-compile 413 limit);
- the per-iteration perturbation defeats CSE.

bench.py carries its own identical inline copy (the driver artifact is
kept self-contained); keep the two in sync.
"""

from __future__ import annotations

import logging
import time

import numpy as np

# benchmark scripts want the library's INFO-level phase timings
# (e.g. build_cells' lloyd/upload/metadata split) in their nohup logs
logging.basicConfig(level=logging.INFO)


def amortised(make_body, q, big, repeats=8, outer=5):
    """Median per-iteration device time of `make_body(q', *big)` over
    `repeats` lax.scan iterations x `outer` dispatches (the tunnel RTT
    amortises to ~RTT/repeats)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def looped(qq, *bb):
        def body(carry, i):
            return carry + make_body(qq + i.astype(qq.dtype) * 1e-7,
                                     *bb), ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(repeats))
        return c

    np.asarray(looped(q, *big))          # warm/compile
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(looped(q, *big))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / repeats
