"""Probe the amortised-harness floor (r5c).

pruned_floor_decomp measured the pruned kernel's bounds+select stage at
~2.9 ms — implausible for a (16, 4860) dot + top_k (20 MFLOP).  Either
lax.top_k/sort is that slow at this shape, or the amortised lax.scan
harness carries a per-iteration floor that every sub-3ms program in the
repo's tables inherits (the B=256 stream's "grid-overhead-bound
3.7 ms" included).  Time, in the SAME harness:

  T0  trivial elementwise on q            (16, 128)
  T1  trivial + big cells operands passed but unused
  T2  bounds dot only (no top_k)
  T3  bounds + top_k(m+1)
  T4  T0 at repeats=64 (a fixed per-DISPATCH cost would shrink 8x;
      a per-ITERATION cost stays)

Usage: nohup python benchmarks/amortised_floor_probe.py > /tmp/afp.log 2>&1 &
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from arrowspace_tpu.config import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from arrowspace_tpu.pruned import build_cells_device
from bench import amortised_device_time


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    N, F, CENTERS, CAP = 1_000_000, 128, 1024, 256
    rng = np.random.default_rng(0)
    cents = jnp.asarray(
        rng.uniform(0.2, 0.8, (CENTERS, F)).astype(np.float32))

    @jax.jit
    def gen(key):
        ka, kb = jax.random.split(key)
        a = jax.random.randint(ka, (N,), 0, CENTERS)
        r = cents[a] + 0.03 * jax.random.normal(kb, (N, F))
        nn = jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True))
        return r / jnp.where(nn > 0, nn, 1.0)

    rows = gen(jax.random.PRNGKey(7))
    lam = jax.random.uniform(jax.random.PRNGKey(9), (N,),
                             dtype=jnp.float32)
    np.asarray(rows[:1, :1])
    cells = build_cells_device(rows, lam, cap=CAP, seed=1, iters=6,
                               n_clusters=2 * CENTERS,
                               assume_normalised=True)
    np.asarray(cells.lam_hi[:1])
    del rows
    big = (cells.x, cells.lam, cells.ids, cells.cent, cells.radius,
           cells.cosr, cells.sinr, cells.lam_lo, cells.lam_hi)
    q16 = jnp.asarray(rng.normal(size=(16, F)).astype(np.float32))
    log(f"setup done ({cells.n_units} units)")

    def t0(q):
        return (q * 2.0 + 1.0,)

    def t1(q, *bb):
        return (q * 2.0 + 1.0,)

    def t2(q, *bb):
        cent = bb[3]
        return (jnp.dot(q, cent.T,
                        preferred_element_type=q.dtype),)

    def t3(q, *bb):
        cent = bb[3]
        c = jnp.dot(q, cent.T, preferred_element_type=q.dtype)
        s, i = jax.lax.top_k(c, 9)
        return (s,)

    r = amortised_device_time(jax, jnp, t0, q16, (), repeats=8)
    log(f"T0 trivial, no big args:        {r*1e3:7.3f} ms")
    r = amortised_device_time(jax, jnp, t1, q16, big, repeats=8)
    log(f"T1 trivial, big args unused:    {r*1e3:7.3f} ms")
    r = amortised_device_time(jax, jnp, t2, q16, big, repeats=8)
    log(f"T2 bounds dot only:             {r*1e3:7.3f} ms")
    r = amortised_device_time(jax, jnp, t3, q16, big, repeats=8)
    log(f"T3 bounds dot + top_k:          {r*1e3:7.3f} ms")
    r = amortised_device_time(jax, jnp, t0, q16, (), repeats=64)
    log(f"T4 trivial at repeats=64:       {r*1e3:7.3f} ms/iter")
    r = amortised_device_time(jax, jnp, t3, q16, big, repeats=64)
    log(f"T5 bounds+top_k at repeats=64:  {r*1e3:7.3f} ms/iter")
    log("PROBE-DONE")


if __name__ == "__main__":
    main()
