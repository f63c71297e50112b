"""Pruned-vs-stream crossover (r5): at 1M x 128 the exact streaming
kernel (~3.7 ms B=256, and B<=16 pads to the same 256-block) beats both
pruned paths — the stream is too close to roofline for "fewer pairs" to
pay at that size.  The screen's work is ~N-independent (bounds matmul
over U cells + a fixed-size gather), so there is a corpus size where it
wins.  This measures both sides at 1M and 4M on identical cluster
geometry, sweeps m_cells for the B=16 path (the r4 default of 64 cells
gathers 262k rows — the gather, not the matmul, is the cost), and
validates the one-hot-matmul Lloyd rewrite's build time (segment_sum
form measured ~17 min at 1M; scatter serializes on TPU).

Usage: nohup python benchmarks/pruned_crossover.py > /tmp/pruned_x.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from arrowspace_tpu.config import setup_cache
setup_cache()

import jax
import jax.numpy as jnp

from _harness import amortised

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def run_scale(n, f=128, centers=1024, hot=16, k=10, alpha=0.9,
              iters=8):
    from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                                   prepare_binned_corpus)
    from arrowspace_tpu.pruned import (build_cells, pruned_topk,
                                       pruned_topk_union)

    rng = np.random.default_rng(7)
    cents = rng.uniform(0.2, 0.8, (centers, f)).astype(np.float32)
    assign = rng.integers(0, centers, n)
    rows = (cents[assign]
            + rng.normal(0, 0.03, (n, f)).astype(np.float32))
    lam = rng.uniform(0, 1, n).astype(np.float32)
    t0 = time.time()
    cells = build_cells(rows, lam, cap=256, seed=1, iters=iters)
    log(f"[{n//1000}k] cells: {cells.cent.shape[0]} units in "
        f"{time.time()-t0:.1f}s (one-hot-matmul lloyd)")
    c = cells

    hot_ids = np.nonzero(np.isin(assign, np.arange(hot)))[0]
    qi = rng.choice(hot_ids, 256, replace=False)
    q256 = jnp.asarray(rows[qi] * 1.002)
    ql256 = jnp.asarray(lam[qi])
    q16, ql16 = q256[:16], ql256[:16]
    big = (c.x, c.lam, c.ids, c.cent, c.radius, c.cosr, c.sinr,
           c.lam_lo, c.lam_hi)

    # B=16 m_cells sweep — the gather is the cost (m·cap·16 rows)
    for mc in (8, 16, 32, 64):
        def body(q, *bb, mc=mc):
            s, i, fl = pruned_topk(q, ql16, *bb, alpha, k=k,
                                   m_cells=mc, cap=256, margin=1e-3)
            return (jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
                    + jnp.sum(fl)) * 1e-20
        per = amortised(body, q16, big) * 1e3
        fl = pruned_topk(q16, ql16, *big, alpha, k=k, m_cells=mc,
                         cap=256, margin=1e-3)[2]
        log(f"[{n//1000}k] B=16  pruned m{mc:2d}: {per:6.2f} ms  "
            f"flags {int(np.asarray(fl).sum())}/16")

    for mv, sc in ((8, 96), (8, 128)):
        def ubody(q, *bb, mv=mv, sc=sc):
            s, i, fl = pruned_topk_union(q, ql256, *bb, alpha, k=k,
                                         m_vote=mv, s_cells=sc,
                                         cap=256, margin=1e-3)
            return (jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
                    + jnp.sum(fl)) * 1e-20
        per = amortised(ubody, q256, big) * 1e3
        fl = pruned_topk_union(q256, ql256, *big, alpha, k=k,
                               m_vote=mv, s_cells=sc, cap=256,
                               margin=1e-3)[2]
        log(f"[{n//1000}k] B=256 union m{mv} S{sc:3d}: {per:6.2f} ms  "
            f"flags {int(np.asarray(fl).sum())}/256")

    # stream baselines on the same corpus (B=256 block serves both)
    del big, c
    rows_j = jnp.asarray(rows)
    xb, lb = prepare_binned_corpus(rows_j, jnp.asarray(lam), bsz=256,
                                   k=k)

    def s256(q, xx, ll):
        s, i, fl = binned_lambda_topk(q, ql256, xx, ll, alpha,
                                           k=k, prepared=True, n_items=n)
        return (jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
                + jnp.sum(fl)) * 1e-20

    def s16(q, xx, ll):
        s, i, fl = binned_lambda_topk(q, ql16, xx, ll, alpha,
                                           k=k, prepared=True, n_items=n)
        return (jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
                + jnp.sum(fl)) * 1e-20

    per = amortised(s256, q256, (xb, lb)) * 1e3
    log(f"[{n//1000}k] B=256 stream      : {per:6.2f} ms")
    per = amortised(s16, q16, (xb, lb)) * 1e3
    log(f"[{n//1000}k] B=16  stream      : {per:6.2f} ms (pads to the "
        f"256 block)")


def main():
    log(f"device: {jax.devices()[0]}")
    run_scale(1_000_000)
    run_scale(4_000_000)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
