"""Real-Mosaic smoke + honest timing for the (48, 128] serving band.

VERDICT-r3 item 4: before r4 the k > 48 session fell off the binned
kernel onto the per-slot-unrolled merge kernel (honest B=2048 wall
~70.7 ms vs the k=32 binned kernel's ~10 ms).  r4 extends the binned
kernel to k <= 128 via depth 4 at bins 512 (ops/pallas_bintopk.py::
binned_topk_depth_for).  This script, on the real chip:

  1. compiles + runs the depth-4 kernel at 1M x 128 for k in
     {64, 100, 128} (novel Mosaic programs — expect minutes each on
     first run; persistent cache makes repeats fast),
  2. checks exactness: binned + strided repair == XLA matmul+top_k
     oracle on a 256-query batch,
  3. measures the honest (DCE-immune consume-all) amortised B=2048
     kernel time next to the production k=32 number, plus the flag
     count per 2048 batch.

Done-gate from VERDICT: k=64 and k=100 honest B=2048 <= 2x the k=32
number.
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


def main(n=1_000_000, f=128, bsz=2048):
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
    qh = rng.normal(size=(bsz, f)).astype(np.float32)
    qlh = rng.uniform(0, 1, bsz).astype(np.float32)
    qd, qld = jnp.asarray(qh), jnp.asarray(qlh)
    alpha = 0.9
    results = {}

    for k in (32, 64, 100, 128):
        blk, tile, r, pre, n_pad = binned_layout(bsz, n, f, k)
        log(f"k={k}: layout block={blk} tile={tile} r={r} pre={pre} "
            f"bins={tile//r} n_pad={n_pad} — compiling...")
        xprep, lamprep = prepare_binned_corpus(xd, xld, bsz=bsz, k=k)
        c0 = time.time()
        s, i, fl, det = binned_lambda_topk(
            qd, qld, xprep, lamprep, alpha, k=k, prepared=True,
            n_items=n, return_det=True)
        s_h, i_h, fl_h = jax.device_get((s, i, fl))
        log(f"k={k}: first dispatch (incl. compile) {time.time()-c0:.1f}s"
            f", flags {int(fl_h.sum())}/{bsz}")

        # Exactness on the first 256 queries: binned + strided repair
        # must equal the XLA oracle.
        b0 = 256
        rows = np.nonzero(fl_h[:b0])[0]
        rs = s_h[:b0].copy()
        ri = i_h[:b0].copy()
        if len(rows):
            det_rows = np.asarray(det[rows])
            kth = s_h[rows, k - 1]
            fs, fi = strided_lambda_repair(
                qh[rows], qlh[rows], det_rows, kth, i_h[rows],
                xprep, lamprep, alpha, k=k, n=n, prepared=True,
                use_bf16=False,
                fallback=lambda rel: (np.zeros((len(rel), k), np.float32),
                                      np.zeros((len(rel), k), np.int32)))
            rs[rows], ri[rows] = fs, fi
        os_, oi = batched_lambda_aware_topk(
            qd[:b0], qld[:b0], xd, xld, jnp.float32(alpha), k=k)
        os_h, oi_h = jax.device_get((os_, oi))
        id_match = float((ri == oi_h).mean())
        sc_close = float(np.abs(rs - os_h).max())
        log(f"k={k}: exactness vs oracle — id match {id_match:.6f}, "
            f"max |score delta| {sc_close:.2e}")

        ms = amortised(
            lambda q, xp, lp: (
                jnp.sum(binned_lambda_topk(
                    q, qld, xp, lp, alpha, k=k, prepared=True,
                    n_items=n)[0][:, :1]) * 1e-20),
            qd, (xprep, lamprep)) * 1e3
        results[k] = (ms, int(fl_h.sum()), id_match)
        log(f"k={k}: honest amortised kernel {ms:6.2f} ms / {bsz} "
            f"({bsz/ms*1e3/1e3:.1f}k QPS device)")

    base = results[32][0]
    for k in (64, 100, 128):
        ms = results[k][0]
        verdict = "PASS" if ms <= 2 * base else "FAIL"
        log(f"GATE k={k}: {ms:.2f} ms vs 2x k=32 ({2*base:.2f}) — "
            f"{verdict}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
