"""Chip validation round B: the canonical rsqrt2 energy form + the
k-band exactness re-check against the canonical-arithmetic oracle.

 1. energy binned (rsqrt2) B=2048 timing + B=256 exactness incl.
    strided repair vs the updated chunked oracle (expect bitwise)
 2. k in {32, 64, 100, 128}: binned+repair vs batched_lambda_aware_topk
    — the 2026-08-19 07:17 kband smoke ran BEFORE the canonical fma
    oracle landed, so its id mismatches (0.9975/0.9915, deltas 5.8e-4)
    were oracle-arithmetic divergence, not kernel error; expect
    1.000000 now.

Usage: nohup python benchmarks/exactness_r4b.py > /tmp/exact_r4b.log 2>&1 &
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
from arrowspace_tpu.ops.bin_repair import strided_energy_repair
from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_topk,
                                               prepare_binned_energy_corpus)
from arrowspace_tpu.ops.search import (batched_lambda_aware_topk,
                                       pallas_binned_topk_with_repair)
from arrowspace_tpu.energymaps import _energy_score_topk_chunked

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main(n=1_000_000, f=128, g=64):
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(11)
    wl, wd = 1.0, 0.5
    wld, wdd = jnp.float32(wl), jnp.float32(wd)
    k = 10

    # ---- 1. energy rsqrt2 ----------------------------------------------
    z = rng.normal(size=(n, g)).astype(np.float32)
    zlam = rng.uniform(0, 1, n).astype(np.float32)
    zd, zld = jnp.asarray(z), jnp.asarray(zlam)
    np.asarray(zd[:1, :1])
    log("energy corpus uploaded")

    bsz = 2048
    zprep, zlamprep, znorm = prepare_binned_energy_corpus(
        zd, zld, bsz=bsz, k=k)
    qz = rng.normal(size=(bsz, g)).astype(np.float32)
    qzl = rng.uniform(0, 1, bsz).astype(np.float32)
    qzd, qzld = jnp.asarray(qz), jnp.asarray(qzl)
    ms_t = amortised(
        lambda q, zp, lp, zn: (
            jnp.sum(binned_energy_topk(
                q, qzld, zp, lp, wl, wd, k=k, prepared=True, n_items=n,
                z_norms=zn)[0][:, :1]) * 1e-20),
        qzd, (zprep, zlamprep, znorm)) * 1e3
    log(f"1a. energy rsqrt2 B=2048 f32: {ms_t:6.2f} ms/batch "
        f"({bsz/ms_t:.1f}k QPS)")

    bsz = 256
    qz = rng.normal(size=(bsz, g)).astype(np.float32)
    qzl = rng.uniform(0, 1, bsz).astype(np.float32)
    qzd, qzld = jnp.asarray(qz), jnp.asarray(qzl)
    zprep, zlamprep, znorm = prepare_binned_energy_corpus(
        zd, zld, bsz=bsz, k=k)
    s, i, fl, det = binned_energy_topk(qzd, qzld, zprep, zlamprep, wl,
                                       wd, k=k, prepared=True, n_items=n,
                                       z_norms=znorm, return_det=True)
    s_h, i_h, fl_h = jax.device_get((s, i, fl))
    s_h, i_h = s_h.copy(), i_h.copy()
    rows = np.nonzero(fl_h)[0]
    if len(rows):
        fs, fi = strided_energy_repair(
            qz[rows], qzl[rows], np.asarray(det[rows]), s_h[rows, k - 1],
            i_h[rows], zprep, zlamprep, znorm, wl, wd, k=k, n=n,
            prepared=True, fallback=None, cur_scores=s_h[rows])
        s_h[rows], i_h[rows] = fs, fi
    eo_s, eo_i = _energy_score_topk_chunked(qzd, qzld, zd, zld, wld, wdd,
                                            k=k)
    eo_sh, eo_ih = jax.device_get((eo_s, eo_i))
    log(f"1b. energy rsqrt2 binned+repair vs chunked oracle B=256: id "
        f"match {(i_h == eo_ih).mean():.6f}, max |score delta| "
        f"{np.abs(s_h - eo_sh).max():.2e}, flags {len(rows)}")
    del zd, zld, zprep, zlamprep, znorm

    # ---- 2. k-band exactness re-check ----------------------------------
    x = rng.normal(size=(n, f)).astype(np.float32)
    xlam = rng.uniform(0, 1, n).astype(np.float32)
    xd, xld = jnp.asarray(x), jnp.asarray(xlam)
    np.asarray(xd[:1, :1])
    log("lambda corpus uploaded")
    alpha = 0.9
    bsz = 2048
    qh = rng.normal(size=(bsz, f)).astype(np.float32)
    qlh = rng.uniform(0, 1, bsz).astype(np.float32)
    qd, qld = jnp.asarray(qh), jnp.asarray(qlh)
    for kk in (32, 64, 100, 128):
        s, i = pallas_binned_topk_with_repair(qd, qld, xd, xld, alpha,
                                              k=kk)
        os_, oi = batched_lambda_aware_topk(qd, qld, xd, xld,
                                            jnp.float32(alpha), k=kk)
        os_h, oi_h = jax.device_get((os_, oi))
        log(f"2. k={kk}: binned+repair vs oracle — id match "
            f"{(np.asarray(i) == oi_h).mean():.6f}, max |score delta| "
            f"{np.abs(np.asarray(s) - os_h).max():.2e}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
