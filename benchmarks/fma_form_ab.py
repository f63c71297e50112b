"""On-chip A/B for the r4 fma score form + small-batch tile-4096 layout
(VERDICT-r3 item 2).

The binned kernel's per-pair VPU fold was ~6 score ops (sub, abs, min,
1-, mul, fma) + 5 combine ops; the fma form folds alpha into the
prepared query (the matmul emits alpha*cos) and works on scores shifted
by -c1, cutting the score ops to 4 (sub, abs, min, fma).  Separately,
B<=256 batches now ride tile 4096 (half the grid steps — the B=256 wall
was step overhead, not arithmetic).

Committed r3 baselines (honest DCE-immune, 1M x 128): f32 B=2048
10.68 ms, bf16 9.99 ms, B=256 f32 4.0-5.4 ms amortised device.

Measures (same harness): B=2048 f32 + bf16, B=256 f32 + bf16, flag
counts, and an exactness spot-check (binned+repair vs XLA oracle).
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
from arrowspace_tpu.ops.bin_repair import strided_lambda_repair
from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                               binned_layout,
                                               prepare_binned_corpus)
from arrowspace_tpu.ops.search import batched_lambda_aware_topk


def main(n=1_000_000, f=128, k=10):
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(n, f)).astype(np.float32)
    xlam = rng.uniform(0, 1, n).astype(np.float32)
    xd, xld = jnp.asarray(x), jnp.asarray(xlam)
    np.asarray(xd[:1, :1])
    log("corpus uploaded")
    alpha = 0.9

    for bsz in (2048, 256):
        qh = rng.normal(size=(bsz, f)).astype(np.float32)
        qlh = rng.uniform(0, 1, bsz).astype(np.float32)
        qd, qld = jnp.asarray(qh), jnp.asarray(qlh)
        for use_bf16 in (False, True):
            lay = binned_layout(bsz, n, f, k, use_bf16)
            xprep, lamprep = prepare_binned_corpus(
                xd, xld, bsz=bsz, k=k, use_bf16=use_bf16)
            s, i, fl = binned_lambda_topk(
                qd, qld, xprep, lamprep, alpha, k=k, prepared=True,
                n_items=n, use_bf16=use_bf16)
            nfl = int(np.asarray(fl).sum())
            ms = amortised(
                lambda q, xp, lp: (
                    jnp.sum(binned_lambda_topk(
                        q, qld, xp, lp, alpha, k=k, prepared=True,
                        n_items=n, use_bf16=use_bf16)[0][:, :1]) * 1e-20),
                qd, (xprep, lamprep)) * 1e3
            log(f"B={bsz:4d} {'bf16' if use_bf16 else 'f32 '} "
                f"layout(b,t,r,pre,npad)={lay}: {ms:6.2f} ms/batch "
                f"({bsz/ms:.1f}k QPS), flags {nfl}/{bsz}")

    # exactness spot check at B=256 f32 incl. repair
    bsz = 256
    qh = rng.normal(size=(bsz, f)).astype(np.float32)
    qlh = rng.uniform(0, 1, bsz).astype(np.float32)
    qd, qld = jnp.asarray(qh), jnp.asarray(qlh)
    xprep, lamprep = prepare_binned_corpus(xd, xld, bsz=bsz, k=k)
    s, i, fl, det = binned_lambda_topk(qd, qld, xprep, lamprep, alpha,
                                       k=k, prepared=True, n_items=n,
                                       return_det=True)
    s_h, i_h, fl_h = jax.device_get((s, i, fl))
    rows = np.nonzero(fl_h)[0]
    if len(rows):
        det_rows = np.asarray(det[rows])
        kth = s_h[rows, k - 1]
        fs, fi = strided_lambda_repair(
            qh[rows], qlh[rows], det_rows, kth, i_h[rows], xprep,
            lamprep, alpha, k=k, n=n, prepared=True, use_bf16=False,
            fallback=lambda rel: (np.zeros((len(rel), k), np.float32),
                                  np.zeros((len(rel), k), np.int32)))
        s_h[rows], i_h[rows] = fs, fi
    os_, oi = batched_lambda_aware_topk(qd, qld, xd, xld,
                                        jnp.float32(alpha), k=k)
    os_h, oi_h = jax.device_get((os_, oi))
    log(f"exactness B=256 f32: id match {(i_h == oi_h).mean():.6f}, "
        f"max |score delta| {np.abs(s_h - os_h).max():.2e}, "
        f"flags {len(rows)}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
