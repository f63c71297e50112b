"""B=256 latency A/B: tile 8192 vs the auto tile-4096 layout
(VERDICT-r3 item 2's ≤3 ms target; the residue after the fma fold is
grid-step overhead — 244 steps at tile 4096).

tile 8192 / r 32 / bins 256 halves the steps to 122 and still fits
scoped VMEM at block 256 (est ~11.9 MB of 14.5: 8.4 MB double-buffered
xhat + 1.8 MB state + 1.6 MB combine planes).  Wider bins cost a
slightly deeper flush but the flag rate only drops.

Also re-measures the bf16 variant and (while the corpus is resident)
the bisect4 tau A/B is run by benchmarks/tau_bisect4_ab.py — keep the
two scripts in one chain to share the device lease.

Usage: nohup python benchmarks/lat_ab_r4.py > /tmp/lat_ab_r4.log 2>&1 &
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
from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                               binned_layout,
                                               prepare_binned_corpus)

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main(n=1_000_000, f=128, k=10, bsz=256):
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(29)
    x = rng.normal(size=(n, f)).astype(np.float32)
    xlam = rng.uniform(0, 1, n).astype(np.float32)
    xd, xld = jnp.asarray(x), jnp.asarray(xlam)
    np.asarray(xd[:1, :1])
    log("corpus uploaded")
    qh = rng.normal(size=(bsz, f)).astype(np.float32)
    qlh = rng.uniform(0, 1, bsz).astype(np.float32)
    qd, qld = jnp.asarray(qh), jnp.asarray(qlh)

    for use_bf16 in (False, True):
        xprep, lamprep = prepare_binned_corpus(xd, xld, bsz=bsz, k=k,
                                               use_bf16=use_bf16)
        configs = [("auto t4096", 0, 0, 0),
                   ("t8192 r32", 256, 32, 8192),
                   ("t8192 r16", 256, 16, 8192)]
        for label, bb, r, tile in configs:
            try:
                s, i, fl = binned_lambda_topk(
                    qd, qld, xprep, lamprep, 0.9, k=k, prepared=True,
                    n_items=n, use_bf16=use_bf16, block_b=bb,
                    lane_split=r, tile=tile,
                    pre_reduce=(None if bb == 0 else True))
                nfl = int(np.asarray(fl).sum())
                ms = amortised(
                    lambda q, xp, lp, bb=bb, r=r, tile=tile: (
                        jnp.sum(binned_lambda_topk(
                            q, qld, xp, lp, 0.9, k=k, prepared=True,
                            n_items=n, use_bf16=use_bf16, block_b=bb,
                            lane_split=r, tile=tile,
                            pre_reduce=(None if bb == 0 else True)
                        )[0][:, :1]) * 1e-20),
                    qd, (xprep, lamprep)) * 1e3
                log(f"B=256 {'bf16' if use_bf16 else 'f32 '} {label:<11}"
                    f" {ms:6.2f} ms ({bsz/ms:.1f}k QPS), flags {nfl}")
            except Exception as e:  # noqa: BLE001
                log(f"B=256 {'bf16' if use_bf16 else 'f32 '} {label:<11}"
                    f" FAILED {type(e).__name__}: {str(e)[:140]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
