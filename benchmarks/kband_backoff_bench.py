"""k>16 pool-backoff A/B now that the strided repair is cheap.

_bins_target backs the pool off to 256/512 bins past k=16/32 because a
flag used to cost a ~4.4 ms full-merge pass.  With the strided repair a
flag costs ~1 ms of device work (plus fetch-thread RTTs on the tunnel),
so the narrow-pool config (bins 128 = the k<=12 production layout) may
win device-side at wide k despite its higher flag rate.  Measures, at
1M x 128 B=2048 f32, for k in {20, 32}:

  A (production auto): bins = _bins_target(k) (256 at these k)
  B (narrow pool):     bins 128 (block 1024, tile 2048, r16)

amortised kernel ms (DCE-immune consume-all), flag count per 2048, and
the strided-repair wall for exactly that flag set through the prepared
session operands.
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
                                               prepare_binned_corpus)


def main(n=1_000_000, f=128, bsz=2048):
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(n, f)).astype(np.float32)
    xlam = rng.uniform(0, 1, n).astype(np.float32)
    xd = jnp.asarray(x)
    xld = jnp.asarray(xlam)
    np.asarray(xd[:1, :1])
    log("corpus uploaded")
    qh = rng.normal(size=(bsz, f)).astype(np.float32)
    qlh = rng.uniform(0, 1, bsz).astype(np.float32)
    qd, qld = jnp.asarray(qh), jnp.asarray(qlh)
    alpha = 0.9

    for k in (20, 32):
        for label, kw in (
            ("auto(backoff)", {}),
            ("bins128", dict(block_b=1024, tile=2048, lane_split=16,
                             pre_reduce=True)),
        ):
            # prepared corpus must match THIS layout's tile/n_pad —
            # the auto path uses prepare_binned_corpus; for the pinned
            # layout n_pad derives from tile 2048 (same bucket), so the
            # same prepared arrays serve both (asserted below).
            xprep, lamprep = prepare_binned_corpus(xd, xld, bsz=bsz, k=k)

            def op(q):
                return binned_lambda_topk(
                    q, qld, xprep, lamprep, alpha, k=k, prepared=True,
                    n_items=n, **kw)

            ms = amortised(
                lambda q, xp, lp: (
                    jnp.sum(binned_lambda_topk(
                        q, qld, xp, lp, alpha, k=k, prepared=True,
                        n_items=n, **kw)[0][:, :1]) * 1e-20),
                qd, (xprep, lamprep)) * 1e3

            s, i, fl, det = binned_lambda_topk(
                qd, qld, xprep, lamprep, alpha, k=k, prepared=True,
                n_items=n, return_det=True, **kw)
            s_h, i_h, fl_h = jax.device_get((s, i, fl))
            rows = np.nonzero(fl_h)[0]
            rep_ms = 0.0
            if len(rows):
                det_rows = np.asarray(det[rows])
                kth = s_h[rows, k - 1]
                # warm then time the repair for exactly this flag set
                def run():
                    return strided_lambda_repair(
                        qh[rows], qlh[rows], det_rows, kth, i_h[rows],
                        xprep, lamprep, alpha, k=k, n=n, prepared=True,
                        use_bf16=False,
                        fallback=lambda rel: (
                            np.zeros((len(rel), k), np.float32),
                            np.zeros((len(rel), k), np.int32)))
                run()
                ts = []
                for _ in range(5):
                    a = time.perf_counter()
                    run()
                    ts.append((time.perf_counter() - a) * 1e3)
                rep_ms = float(np.median(ts))
            log(f"k={k:2d} {label:14s}: kernel {ms:6.2f} ms/2048, "
                f"flags {len(rows):3d}/2048, det bins {det.shape[1]:4d}, "
                f"strided repair {rep_ms:.1f} ms wall (tunnel; device "
                f"work is ~1-2 dispatches)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
